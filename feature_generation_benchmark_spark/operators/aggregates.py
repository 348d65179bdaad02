"""Skew-safe aggregation rewrites.

Plain ``groupBy(key).agg(sum/count/min/max)`` is already skew-tolerant in
Spark: partial aggregation collapses each map partition to one row per
key before the shuffle, so a hot key costs each mapper O(1). The aggregate
that is NOT protected is ``COUNT(DISTINCT value)``: partials cannot
collapse (every distinct value must travel), so all values of a hot key
converge on the single reducer owning that key — at 100 TB a
``distinct users per country`` query dies on the biggest country.

``skew_safe_distinct_count`` is the standard two-phase rewrite: spread
each key's VALUES across ``buckets`` sub-keys by value hash, count
distinct within each (key, bucket) — values are disjoint across buckets,
so phase 2 just SUMS the per-bucket counts. Exact, and the hot key's work
fans out over ``buckets`` reducers. (The reference has no distinct
aggregation at all — SURVEY §2.3 — this is engine extension surface, same
family as ``operators/joins.py::salted_join``.)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def skew_safe_distinct_count(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    buckets: int = 64,
    out_col: str = "n_distinct",
) -> DataFrame:
    """Exact per-key COUNT(DISTINCT ``value_col``) that survives hot keys.

    Phase 1 groups by (keys…, ``xxhash64(value) mod buckets``) so the
    shuffle key carries the value hash — a key with billions of values
    spreads over ``buckets`` reducers instead of one. Phase 2 reduces
    ``buckets`` rows per key to one. NULL values are ignored, matching
    ``COUNT(DISTINCT)`` SQL semantics.
    """
    if buckets < 1:
        raise ValueError(f"buckets must be >= 1, got {buckets}")
    keys: list[Column] = [F.col(c) for c in key_cols]
    bucket = F.pmod(F.xxhash64(F.col(value_col)), F.lit(buckets))
    partial = (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(*keys, bucket.alias("__vbucket"))
        .agg(F.count_distinct(F.col(value_col)).alias("__part"))
    )
    return (
        partial.groupBy(*[F.col(c) for c in key_cols])
        .agg(F.sum("__part").alias(out_col))
    )
