"""Parquet source/sink helpers (reference operators S1-S7, SURVEY §2.1).

Thin, deliberately: ``spark.read.parquet`` already provides recursive
partition discovery, predicate pushdown and column pruning — everything the
reference's per-engine scan variants (eager, lazy, glob) hand-build.
"""

from __future__ import annotations

import warnings

from pyspark.sql import DataFrame, SparkSession


def read_parquet(
    spark: SparkSession,
    path: str,
    columns: list[str] | None = None,
    merge_schema: bool = False,
) -> DataFrame:
    """Hive-partitioned (or flat) parquet dataset scan (S1/S2/S4).

    ``columns`` narrows the projection at plan level so pruning reaches the
    scan (``ReadSchema`` in explain output). ``merge_schema`` unions the
    schemas of all footers — the schema-evolution read for datasets whose
    files were written across column additions (older files surface NULL
    for the new columns). Off by default: merging footers costs a
    metadata pass over every file, which matters at 100 TB file counts.
    """
    reader = spark.read
    if merge_schema:
        reader = reader.option("mergeSchema", "true")
    df = reader.parquet(path)
    if columns is not None:
        df = df.select(*columns)
    return df


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    compression: str | None = None,
) -> None:
    """Parquet sink with optional hive partitioning and codec (S5-S7;
    reference sinks at ``impl/pyspark-pivot.py:189``,
    ``impl/duckdb_case-when.py:122`` [zstd], generator hive write
    ``python/data_generation/__init__.py:110-115``)."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if compression:
        writer = writer.option("compression", compression)
    writer.parquet(path)


#: Formats the generic reader/writer pair supports. Parquet is the
#: performance path (columnar, pushdown, pruning); ORC matches it
#: feature-for-feature; CSV/JSON are interchange formats — schema must be
#: supplied (inference = an extra full scan) and column pruning cannot
#: skip bytes inside a row, so ingest should convert them to parquet once.
FORMATS = ("parquet", "orc", "csv", "json")


def read_table(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema=None,
    columns: list[str] | None = None,
    **options: str,
) -> DataFrame:
    """Format-generic dataset scan (S1-S4 generalized beyond parquet).

    ``schema`` is required for csv/json at scale: without it Spark runs a
    whole-dataset inference job before the real scan. CSV defaults to
    ``header=true``.
    """
    if fmt not in FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; one of {FORMATS}")
    reader = spark.read.format(fmt)
    if fmt == "csv":
        reader = reader.option("header", "true")
    if schema is not None:
        reader = reader.schema(schema)
    elif fmt == "csv":
        # whole-dataset inference scan — acceptable only as the explicit
        # schema-less fallback the docstring warns about. (JSON infers by
        # default; the 'inferSchema' option is CSV-only and was a silent
        # no-op on the JSON branch — r6 session-3 review.)
        reader = reader.option("inferSchema", "true")
    for k, v in options.items():
        reader = reader.option(k, v)
    df = reader.load(path)
    if columns is not None:
        df = df.select(*columns)
    return df


def write_table(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    compression: str | None = None,
    **options: str,
) -> None:
    """Format-generic sink (S5-S7 generalized beyond parquet)."""
    if fmt not in FORMATS:
        raise ValueError(f"unsupported format {fmt!r}; one of {FORMATS}")
    writer = df.write.mode(mode).format(fmt)
    if fmt == "csv":
        writer = writer.option("header", "true")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if compression:
        writer = writer.option("compression", compression)
    for k, v in options.items():
        writer = writer.option(k, v)
    writer.save(path)


def write_bucketed_table(
    df: DataFrame,
    name: str,
    buckets: int,
    key_cols: list[str],
    path: str,
    mode: str = "overwrite",
    sorted_by: list[str] | None = None,
) -> None:
    """Catalog-registered bucketed (and optionally sorted) parquet table.

    Two tables bucketed the same way on the join key co-locate: their join
    needs NO Exchange (and with ``sorted_by`` no Sort) — the pre-shuffled
    layout that turns a repeated 100 TB join into a scan-side merge. Local
    path + session catalog here; the same API maps to an external metastore
    on a real deployment. Verified by ``tests/test_bucketing.py``.
    """
    writer = (
        df.write.mode(mode)
        .format("parquet")
        .option("path", path)
        .bucketBy(buckets, *key_cols)
    )
    if sorted_by:
        writer = writer.sortBy(*sorted_by)
    writer.saveAsTable(name)


def write_sorted_parquet(
    df: DataFrame,
    path: str,
    sort_cols: list[str],
    mode: str = "overwrite",
    n_files: int | None = None,
    compression: str | None = None,
) -> None:
    """Range-partitioned, sorted-within-file parquet layout for min/max
    data skipping.

    ``repartitionByRange`` gives each output file a narrow, (nearly)
    disjoint slice of the sort key; ``sortWithinPartitions`` clusters rows
    so every parquet ROW GROUP's min/max statistics span a narrow range
    too. A later scan with a ``sort_col`` predicate then prunes at two
    levels — whole files and row groups — instead of reading everything
    and filtering. For a 100 TB time-series table sorted on event time,
    a one-day query touches ~1/365 of the bytes; on an unsorted layout
    every row group straddles the full time range and nothing skips.
    Verified against parquet footer statistics in ``tests/test_io.py``.
    """
    ranged = (
        df.repartitionByRange(n_files, *sort_cols)
        if n_files is not None
        else df.repartitionByRange(*sort_cols)
    )
    writer = ranged.sortWithinPartitions(*sort_cols).write.mode(mode)
    if compression:
        writer = writer.option("compression", compression)
    writer.parquet(path)


def zorder_value(
    cols: list[str],
    bounds: list[tuple[float, float]],
    bits: int = 16,
):
    """Morton (Z-curve) interleaved-bit value for N numeric columns.

    Each column is min-max quantized to ``bits`` levels against the given
    ``bounds`` (clamped outside), then the bit planes are interleaved —
    column i contributes bit b to output position ``b*N + i``. Points
    close in EVERY dimension get close z-values, so sorting by z clusters
    the file layout for predicates on ANY of the columns (single-column
    sort clusters only its leading column). Pure JVM expressions inside
    codegen — no UDF.
    """
    from pyspark.sql import functions as F

    n = len(cols)
    if n < 2:
        raise ValueError("zorder needs >= 2 columns (use a plain sort for 1)")
    if n * bits > 62:
        raise ValueError(f"{n} cols x {bits} bits exceeds a signed int64")
    parts = []
    for i, (c, (lo, hi)) in enumerate(zip(cols, bounds)):
        if not hi > lo:
            raise ValueError(f"bad bounds for {c!r}: ({lo}, {hi})")
        scaled = (F.col(c).cast("double") - F.lit(float(lo))) / F.lit(
            float(hi - lo)
        )
        clamped = F.least(F.greatest(scaled, F.lit(0.0)), F.lit(1.0))
        q = F.least(
            (clamped * F.lit(float(1 << bits))).cast("long"),
            F.lit((1 << bits) - 1),
        )
        for b in range(bits):
            parts.append(
                F.shiftleft(
                    F.shiftright(q, b).bitwiseAND(F.lit(1)), b * n + i
                )
            )
    z = parts[0]
    for p in parts[1:]:
        z = z.bitwiseOR(p)
    return z


def write_zordered_parquet(
    df: DataFrame,
    path: str,
    cols: list[str],
    mode: str = "overwrite",
    n_files: int | None = None,
    bits: int = 16,
    quantile_error: float = 0.01,
) -> None:
    """Multi-dimensional clustered parquet layout (Z-order curve).

    ``write_sorted_parquet`` makes row-group min/max stats narrow for ONE
    column; a predicate on any other column skips nothing. Z-ordering
    interleaves the bit planes of several columns so every listed column's
    min/max stays narrow per row group — the layout for tables queried
    along multiple independent axes (time AND user, brand AND size).
    Column bounds come from one ``approxQuantile`` pass (p01/p99, driver
    receives 2 numbers per column — a model literal, not a data collect);
    outliers clamp to the edge buckets, which only pads the two extreme
    cells' stats.
    """
    if "__z" in df.columns:
        # withColumn would silently overwrite (and the final drop remove)
        # the user's data — refuse loudly (r6 session-3 review)
        raise ValueError(
            "write_zordered_parquet: input already has a '__z' column — "
            "rename it before writing"
        )
    qs = df.stat.approxQuantile(cols, [quantile_error, 1 - quantile_error], 0.001)
    # constant / heavily-skewed columns collapse to lo == hi: widen so the
    # column degrades to a constant bit-plane instead of aborting the
    # write. approxQuantile returns [] (not [lo, hi]) for an all-NULL
    # column or an empty frame — same degenerate-column treatment, with
    # the column named instead of an opaque unpack error.
    bounds = []
    for c, q in zip(cols, qs):
        if len(q) == 2:
            lo, hi = q
            bounds.append((lo, hi if hi > lo else lo + 1.0))
        else:
            # surface the degradation by NAME (r6 advice: the silent
            # (0,1) substitution contradicted this comment's promise) —
            # the layout still works, minus this column's clustering
            warnings.warn(
                f"write_zordered_parquet: column '{c}' has no quantile "
                "bounds (all-NULL or empty frame) — it degrades to a "
                "constant bit-plane and contributes no clustering",
                stacklevel=2,
            )
            bounds.append((0.0, 1.0))
    z = zorder_value(cols, bounds, bits=bits)
    zdf = df.withColumn("__z", z)
    ranged = (
        zdf.repartitionByRange(n_files, "__z")
        if n_files is not None
        else zdf.repartitionByRange("__z")
    )
    ranged.sortWithinPartitions("__z").drop("__z").write.mode(mode).parquet(
        path
    )
