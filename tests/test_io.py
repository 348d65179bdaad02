"""Parquet source/sink tests (S1-S7): partitioned writes with codecs,
partition-discovery reads, partition pruning reaching the scan."""

from __future__ import annotations

import glob
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from feature_generation_benchmark_spark.sources.generator import (
    generate_transactions,
    write_dataset,
)
from feature_generation_benchmark_spark.sources.io import (
    read_parquet,
    write_parquet,
)


@pytest.fixture(scope="module")
def trx(spark):
    return generate_transactions(
        spark, customers=20, partitions=3, days_per_partition=5, seed=42
    ).cache()


def test_hive_partitioned_roundtrip(spark, trx):
    d = tempfile.mkdtemp(prefix="fgb_io_")
    try:
        write_dataset(trx, d)
        # hive layout on disk
        parts = sorted(glob.glob(f"{d}/part_col=*"))
        assert len(parts) == 3
        back = read_parquet(spark, d)
        assert back.count() == trx.count()
        assert set(back.columns) == set(trx.columns)
    finally:
        shutil.rmtree(d, ignore_errors=True)


@pytest.mark.parametrize("codec", ["snappy", "zstd"])
def test_sink_compression_codecs(spark, trx, codec):
    """S6 — codec option (reference: zstd in duckdb sinks, snappy default)."""
    d = tempfile.mkdtemp(prefix=f"fgb_codec_{codec}_")
    try:
        write_parquet(trx, d, compression=codec)
        files = glob.glob(f"{d}/*.parquet")
        assert files
        assert any(f".{codec.replace('zstd', 'zstd')}." in f for f in files)
        assert read_parquet(spark, d).count() == trx.count()
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_partition_pruning_reaches_scan(spark, trx):
    """A filter on the hive partition key must prune files, not scan all."""
    d = tempfile.mkdtemp(prefix="fgb_prune_")
    try:
        write_dataset(trx, d)
        df = read_parquet(spark, d).filter(F.col("part_col") == "partition_1")
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert df.count() == trx.filter(F.col("part_col") == "partition_1").count()
        # physical scan reports the partition filter
        explained = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        ) if hasattr(df._sc._jvm, "PythonSQLUtils") else plan
        assert "PartitionFilters" in explained or "partition_1" in explained
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_column_pruning_projection(spark, trx):
    d = tempfile.mkdtemp(prefix="fgb_cols_")
    try:
        write_parquet(trx, d)
        two = read_parquet(spark, d, columns=["customer_id", "trx_amnt"])
        explained = two._jdf.queryExecution().executedPlan().toString()
        assert "card_type" not in explained  # pruned from ReadSchema
        assert two.columns == ["customer_id", "trx_amnt"]
    finally:
        shutil.rmtree(d, ignore_errors=True)


@pytest.mark.parametrize("fmt", ["orc", "csv", "json"])
def test_format_roundtrip(spark, trx, fmt):
    """Non-parquet formats round-trip with an explicit schema (csv/json
    schema-on-read must not silently retype columns)."""
    from feature_generation_benchmark_spark.sources.io import (
        read_table,
        write_table,
    )

    src = trx.limit(500)
    d = tempfile.mkdtemp(prefix=f"fgb_io_{fmt}_")
    try:
        write_table(src, d, fmt=fmt)
        back = read_table(spark, d, fmt=fmt, schema=src.schema)
        assert back.schema == src.schema
        assert sorted(map(tuple, back.collect())) == sorted(
            map(tuple, src.collect())
        )
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_format_rejected(spark):
    from feature_generation_benchmark_spark.sources.io import read_table

    with pytest.raises(ValueError):
        read_table(spark, "/tmp/x", fmt="avro")


def test_sorted_write_produces_skippable_stats(spark, tmp_path):
    """The sorted layout's claim, checked against parquet FOOTERS: with
    range partitioning + in-file sort, each row group's [min, max] ts span
    is a narrow slice; a point/range predicate then skips most row groups.
    The unsorted layout's row groups each straddle ~the full range."""
    import glob

    import pyarrow.parquet as pq

    from feature_generation_benchmark_spark.sources.io import (
        write_parquet,
        write_sorted_parquet,
    )

    n = 200_000
    df = (
        spark.range(n)
        .select(
            (F.xxhash64("id") % n).alias("ts"),  # scrambled arrival order
            F.col("id").alias("payload"),
        )
    )
    sorted_dir = str(tmp_path / "sorted")
    plain_dir = str(tmp_path / "plain")
    write_sorted_parquet(df, sorted_dir, ["ts"], n_files=32)
    write_parquet(df.repartition(4), plain_dir)

    def spans(d):
        total = 0
        spans = []
        for f in glob.glob(f"{d}/*.parquet"):
            meta = pq.ParquetFile(f).metadata
            for rg in range(meta.num_row_groups):
                col = meta.row_group(rg).column(0)
                assert col.path_in_schema == "ts"
                lo, hi = col.statistics.min, col.statistics.max
                spans.append(hi - lo)
                total += 1
        return total, spans

    n_sorted, sorted_spans = spans(sorted_dir)
    n_plain, plain_spans = spans(plain_dir)
    full = max(max(sorted_spans), max(plain_spans))
    # unsorted row groups straddle ~everything; sorted ones are narrow
    assert min(plain_spans) > full * 0.5
    assert max(sorted_spans) < full * 0.5
    # a range predicate covering 1% of the key space overlaps only a
    # fraction of sorted row groups but every plain one
    assert sum(s < full * 0.05 for s in sorted_spans) >= n_sorted // 2


def test_json_corrupt_records_are_captured_not_dropped(spark):
    """Ingest robustness: malformed JSON lines land in the corrupt-record
    column (PERMISSIVE) instead of killing the job or silently vanishing —
    at 100 TB a raw-text drop has a few bad lines per billion and the
    pipeline must quarantine them, not crash."""
    import os

    from pyspark.sql import types as T

    from feature_generation_benchmark_spark.sources.io import read_table

    d = tempfile.mkdtemp(prefix="fgb_io_corrupt_")
    try:
        with open(os.path.join(d, "part-0.json"), "w") as f:
            f.write('{"id": 1, "v": "ok"}\n')
            f.write('{"id": 2, "v": "also ok"}\n')
            f.write('{"id": 3, "v": BROKEN\n')
        schema = T.StructType(
            [
                T.StructField("id", T.LongType()),
                T.StructField("v", T.StringType()),
                T.StructField("_corrupt_record", T.StringType()),
            ]
        )
        df = read_table(
            spark,
            d,
            fmt="json",
            schema=schema,
            mode="PERMISSIVE",
            columnNameOfCorruptRecord="_corrupt_record",
        ).cache()
        good = df.filter(F.col("_corrupt_record").isNull())
        bad = df.filter(F.col("_corrupt_record").isNotNull())
        assert good.count() == 2
        assert bad.count() == 1
        assert "BROKEN" in bad.collect()[0]["_corrupt_record"]
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_zorder_layout_skips_on_both_dimensions(spark, tmp_path):
    """Z-order claim, checked against parquet footers: with two
    independent uniform columns, a narrow predicate on EITHER column
    overlaps only a minority of row groups; a single-column sort keeps
    its secondary column's spans at ~full range (no skipping)."""
    import pyarrow.parquet as pq

    from feature_generation_benchmark_spark.sources.io import (
        write_sorted_parquet,
        write_zordered_parquet,
    )

    n = 200_000
    df = spark.range(n).select(
        (F.xxhash64("id") % n).alias("x"),
        (F.xxhash64("id", F.lit(1)) % n).alias("y"),
    )
    zdir = str(tmp_path / "zorder")
    sdir = str(tmp_path / "sorted_x")
    write_zordered_parquet(df, zdir, ["x", "y"], n_files=32)
    write_sorted_parquet(df, sdir, ["x"], n_files=32)

    def col_spans(d, col_idx, col_name):
        spans = []
        for f in glob.glob(f"{d}/*.parquet"):
            meta = pq.ParquetFile(f).metadata
            for rg in range(meta.num_row_groups):
                c = meta.row_group(rg).column(col_idx)
                assert c.path_in_schema == col_name
                spans.append(c.statistics.max - c.statistics.min)
        return spans

    full = float(2 * n)  # xxhash64 % n spans ~(-n, n)
    for idx, name in ((0, "x"), (1, "y")):
        z_spans = col_spans(zdir, idx, name)
        # most z-ordered row groups span a minority of either axis
        frac_narrow = sum(s < full * 0.5 for s in z_spans) / len(z_spans)
        assert frac_narrow > 0.8, (name, sorted(z_spans)[-5:])
    # the single-column sort clusters x but leaves y unclustered
    y_sorted_spans = col_spans(sdir, 1, "y")
    assert min(y_sorted_spans) > full * 0.45


def test_zorder_value_matches_python_model(spark):
    """zorder_value's codegen expression == an independent Python Morton
    interleave over the same quantization, checked on a value grid."""
    from feature_generation_benchmark_spark.sources.io import zorder_value

    bits = 8
    bounds = [(0.0, 256.0), (0.0, 256.0)]
    df = spark.range(0, 1000).select(
        ((F.col("id") * 7) % 256).cast("double").alias("x"),
        ((F.col("id") * 13) % 256).cast("double").alias("y"),
        F.col("id"),
    )
    got = {
        r["id"]: r["z"]
        for r in df.withColumn(
            "z", zorder_value(["x", "y"], bounds, bits=bits)
        ).collect()
    }

    def model(x, y):
        def quant(v, lo, hi):
            s = max(0.0, min(1.0, (v - lo) / (hi - lo)))
            return min(int(s * (1 << bits)), (1 << bits) - 1)

        qx, qy = quant(x, *bounds[0]), quant(y, *bounds[1])
        z = 0
        for b in range(bits):
            z |= ((qx >> b) & 1) << (2 * b)
            z |= ((qy >> b) & 1) << (2 * b + 1)
        return z

    for r in df.collect():
        assert got[r["id"]] == model(r["x"], r["y"]), r


def test_zorder_value_rejects_bad_args(spark):
    from feature_generation_benchmark_spark.sources.io import zorder_value

    with pytest.raises(ValueError):
        zorder_value(["x"], [(0.0, 1.0)])
    with pytest.raises(ValueError):
        zorder_value(["x", "y"], [(0.0, 1.0), (1.0, 1.0)])
    with pytest.raises(ValueError):
        zorder_value(["a", "b", "c", "d"], [(0.0, 1.0)] * 4, bits=16)


def test_zorder_constant_column_degrades_not_aborts(spark, tmp_path):
    """A constant (or p01==p99) column must degrade to a constant
    bit-plane; the other column still clusters."""
    import pyarrow.parquet as pq

    from feature_generation_benchmark_spark.sources.io import (
        write_zordered_parquet,
    )

    n = 50_000
    df = spark.range(n).select(
        (F.xxhash64("id") % n).alias("x"), F.lit(7.0).alias("c")
    )
    d = str(tmp_path / "zconst")
    write_zordered_parquet(df, d, ["x", "c"], n_files=8)
    spans = []
    for f in glob.glob(f"{d}/*.parquet"):
        meta = pq.ParquetFile(f).metadata
        for rg in range(meta.num_row_groups):
            col = meta.row_group(rg).column(0)
            spans.append(col.statistics.max - col.statistics.min)
    assert max(spans) < 2 * n * 0.6  # x still clusters


def test_merge_schema_reads_evolved_dataset(spark, tmp_path):
    """Schema evolution: files written before a column was added must
    surface NULL for it under merge_schema=True, and the union schema
    must include every column ever written."""
    from feature_generation_benchmark_spark.sources.io import read_parquet

    root = str(tmp_path / "evolved")
    spark.createDataFrame([(1, "a")], "k long, v string").write.parquet(
        f"{root}/part=old"
    )
    spark.createDataFrame(
        [(2, "b", 9.5)], "k long, v string, score double"
    ).write.parquet(f"{root}/part=new")

    df = read_parquet(spark, root, merge_schema=True)
    assert {f.name for f in df.schema.fields} >= {"k", "v", "score"}
    rows = {r.k: r for r in df.collect()}
    assert rows[1].score is None and rows[2].score == 9.5


def test_zorder_all_null_column_warns_by_name(spark, tmp_path):
    """An all-NULL z-order column (approxQuantile returns []) must emit
    a warning NAMING the column while the write still succeeds with the
    other column clustering (r6 advice: the old path substituted (0,1)
    silently, contradicting its own comment)."""
    import warnings as _w

    from pyspark.sql import functions as F

    from feature_generation_benchmark_spark.sources.io import (
        write_zordered_parquet,
    )

    df = spark.range(1000).select(
        F.col("id").cast("double").alias("x"),
        F.lit(None).cast("double").alias("y"),
    )
    out = str(tmp_path / "znull")
    with _w.catch_warnings(record=True) as rec:
        _w.simplefilter("always")
        write_zordered_parquet(df, out, ["x", "y"], n_files=4)
    msgs = [str(r.message) for r in rec]
    assert any("'y'" in m and "constant bit-plane" in m for m in msgs), msgs
    assert spark.read.parquet(out).count() == 1000


def test_load_table_memoizes_handle_and_sees_overwrites(spark, tmp_path):
    """r7: load_table memoizes the ANALYZED DataFrame handle per
    (session, path, mtime) — pure plan/metadata reuse, no data caching —
    and an overwritten dataset (new mtime) is re-listed, not served
    stale."""
    import time as _time

    from pyspark.sql import functions as F

    from feature_generation_benchmark_spark.sources.testdata import load_table

    d = str(tmp_path)
    spark.range(5).select(F.col("id").alias("k")).write.mode(
        "overwrite"
    ).parquet(f"{d}/tbl.parquet")
    a = load_table(spark, d, "tbl")
    assert a is load_table(spark, d, "tbl")  # same handle, no re-list
    assert a.count() == 5
    _time.sleep(0.01)  # ensure a distinct mtime_ns on coarse filesystems
    spark.range(9).select(F.col("id").alias("k")).write.mode(
        "overwrite"
    ).parquet(f"{d}/tbl.parquet")
    b = load_table(spark, d, "tbl")
    assert b is not a
    assert b.count() == 9
