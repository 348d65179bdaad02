"""Parquet source/sink helpers (reference operators S1-S7, SURVEY §2.1).

Thin, deliberately: ``spark.read.parquet`` already provides recursive
partition discovery, predicate pushdown and column pruning — everything the
reference's per-engine scan variants (eager, lazy, glob) hand-build.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_parquet(
    spark: SparkSession,
    path: str,
    columns: list[str] | None = None,
) -> DataFrame:
    """Hive-partitioned (or flat) parquet dataset scan (S1/S2/S4).

    ``columns`` narrows the projection at plan level so pruning reaches the
    scan (``ReadSchema`` in explain output).
    """
    df = spark.read.parquet(path)
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
