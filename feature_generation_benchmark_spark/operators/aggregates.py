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
    ``buckets`` rows per key to one. NULL values are ignored by the inner
    ``count_distinct`` (SQL semantics) but their ROWS are kept, so a key
    whose values are all NULL still appears with count 0 — exactly like
    plain ``groupBy(k).agg(count_distinct(v))``.
    """
    if buckets < 1:
        raise ValueError(f"buckets must be >= 1, got {buckets}")
    keys: list[Column] = [F.col(c) for c in key_cols]
    bucket = F.pmod(F.xxhash64(F.col(value_col)), F.lit(buckets))
    partial = (
        df.groupBy(*keys, bucket.alias("__vbucket"))
        .agg(F.count_distinct(F.col(value_col)).alias("__part"))
    )
    return (
        partial.groupBy(*[F.col(c) for c in key_cols])
        .agg(F.sum("__part").alias(out_col))
    )


def hll_partials(
    df: DataFrame,
    partial_keys: list[str],
    value_col: str,
    lg_k: int = 12,
    sketch_col: str = "hll_sketch",
) -> DataFrame:
    """Per-(partial_keys…) HyperLogLog sketch of distinct ``value_col`` —
    the DECOMPOSABLE form of approx distinct. Materialize these per day/
    partition once; any later rollup (per week, per key subset, global)
    merges sketches with :func:`hll_rollup` instead of rescanning raw
    data. This is the incremental-pipeline analog of the engine's
    day-partials feature store (``plans/incremental.py``) for distinct
    counts, where exact partials cannot decompose at all."""
    return df.groupBy(*[F.col(c) for c in partial_keys]).agg(
        F.hll_sketch_agg(F.col(value_col), F.lit(lg_k)).alias(sketch_col)
    )


def hll_rollup(
    partials: DataFrame,
    rollup_keys: list[str],
    sketch_col: str = "hll_sketch",
    out_col: str = "n_distinct_approx",
) -> DataFrame:
    """Merge sketch partials to any coarser grouping and estimate.

    Union over sketches is lossless at the sketch-accuracy level: the
    merged estimate tracks the direct raw-data sketch within the sketch's
    own error (not bit-identical — the DataSketches union gadget uses a
    wider internal register format), so day partials can serve every later
    rollup without rescanning raw data. Asserted vs the direct sketch and
    the exact count in tests/test_aggregates.py."""
    return partials.groupBy(*[F.col(c) for c in rollup_keys]).agg(
        F.hll_sketch_estimate(F.hll_union_agg(F.col(sketch_col)))
        .alias(out_col)
    )


# ---------------------------------------------------------------------------
# generic mergeable aggregate state (incremental materialized aggregates)
# ---------------------------------------------------------------------------

def agg_partials(
    df: DataFrame, keys: list[str], measures: list[str]
) -> DataFrame:
    """Decomposable aggregate state per key: (count, sum, min, max) for
    each measure. Materialize per ingest batch / day / partition; later
    batches produce their own partials and :func:`merge_agg_partials`
    folds them — the generic form of the engine's day-partials feature
    store (``plans/incremental.py``), usable for ANY grouped rollup: a
    100 TB fact table is aggregated exactly once per increment, never
    rescanned. ``avg`` is deliberately NOT part of the state (it does not
    decompose); :func:`finalize_aggs` derives it as Σsum/Σcount."""
    aggs = []
    for m in measures:
        aggs += [
            F.count(F.col(m)).alias(f"{m}__n"),
            F.sum(F.col(m)).alias(f"{m}__sum"),
            F.min(F.col(m)).alias(f"{m}__min"),
            F.max(F.col(m)).alias(f"{m}__max"),
        ]
    return df.groupBy(*[F.col(k) for k in keys]).agg(*aggs)


def merge_agg_partials(
    partials: DataFrame, keys: list[str], measures: list[str]
) -> DataFrame:
    """Fold any union of partial frames back into one state row per key
    (count/sum re-sum; min/max re-min/max). Closed under composition:
    merge(partials(A) ∪ partials(B)) == partials(A ∪ B), asserted in
    tests/test_aggregates.py."""
    aggs = []
    for m in measures:
        aggs += [
            F.sum(f"{m}__n").alias(f"{m}__n"),
            F.sum(f"{m}__sum").alias(f"{m}__sum"),
            F.min(f"{m}__min").alias(f"{m}__min"),
            F.max(f"{m}__max").alias(f"{m}__max"),
        ]
    return partials.groupBy(*[F.col(k) for k in keys]).agg(*aggs)


def finalize_aggs(
    partials: DataFrame, keys: list[str], measures: list[str]
) -> DataFrame:
    """State → user-facing count/sum/avg/min/max columns."""
    cols = [F.col(k) for k in keys]
    for m in measures:
        cols += [
            F.col(f"{m}__n").alias(f"{m}_count"),
            F.col(f"{m}__sum").alias(f"{m}_sum"),
            (F.col(f"{m}__sum") / F.col(f"{m}__n")).alias(f"{m}_avg"),
            F.col(f"{m}__min").alias(f"{m}_min"),
            F.col(f"{m}__max").alias(f"{m}_max"),
        ]
    return partials.select(*cols)
