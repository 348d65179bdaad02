"""Physical strategy A2+A3′ — disjoint-bucket partial aggregation + EXACT
cumulative roll-up.

The reference's fastest at-scale plan (455 s vs 17,653 s at 1.7B rows —
``results/results_medium.json``) buckets rows into disjoint smallest-window
buckets, aggregates once per (key, categories, bucket), then derives each
cumulative window arithmetically (``impl/pyspark-pivot.py:49-98,113-134``).
Its published form has two exactness defects (SURVEY §2.7.2-3): cumulative
avg as unweighted mean-of-bucket-means, and NULL-poisoning when a bucket is
empty. This implementation keeps the algorithmic win and fixes both:

- partial aggregates carry only the DECOMPOSABLE stats
  ``{count, sum, min, max}``; ``avg`` is derived as ``Σsum / Σcount``;
- cumulative combination ignores empty buckets (aggregating over partial
  rows, not adding NULLs).

Physical shape (two hash aggregations, input scanned ONCE):

    Parquet scan (pruned + ``time_col <= max(window)`` pushed down)
      → project: bucket := smallest enclosing window    -- P5, codegen'd
      → HashAggregate partial+final over
          (key, all category cols, bucket)              -- shuffle #1 (big)
      → HashAggregate partial+final over (key)          -- shuffle #2 (tiny)
          with per-feature conditional re-aggregation

Why this wins at 100 TB: shuffle #1 reduces each input row to at most one
partial row per (key × category-combo × bucket) — for the reference task
≤ 416 rows/key regardless of input size, so shuffle #2 moves ~3 orders of
magnitude less data than the input. The per-row work in the big pass is a
handful of comparisons, not |features| CASE WHENs — plan size no longer
multiplies the scan cost. Unlike the reference (which runs one aggregation
*per grouping scheme* and joins the halves, ``impl/pyspark-pivot.py:189``),
we aggregate over the union of all grouping columns in one pass and derive
each scheme by conditional re-aggregation — no join, no second scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from feature_generation_benchmark_spark.functions.exprs import (
    quote_ident,
    quote_str,
    smallest_window_bucket,
)
from feature_generation_benchmark_spark.spec import Agg, FeatureSpec

_BUCKET = "__bucket"
_CNT = "__cnt"  # shared matched-row count (measures are non-null, spec.py)


def _sum_col(m: str) -> str:
    return f"__sum_{m}"


def _min_col(m: str) -> str:
    return f"__min_{m}"


def _max_col(m: str) -> str:
    return f"__max_{m}"


def _rollup_expr(spec: FeatureSpec, feat) -> Column:
    """Re-aggregate partial rows into one cumulative feature cell, with
    semantics identical to the case-when strategy (count=0 / sum=0.0 /
    avg,min,max=NULL on empty). Built as a SQL string — one JVM parse per
    feature instead of ~a dozen Py4J calls (see exprs.agg_expr_sql)."""
    parts = [f"{quote_ident(_BUCKET)} <= {feat.window}"]
    parts += [
        f"{quote_ident(c)} = {quote_str(v)}"
        for c, v in zip(feat.grouping.cols, feat.combo)
    ]
    cond = " AND ".join(parts)
    cnt_sum = f"sum(CASE WHEN {cond} THEN {quote_ident(_CNT)} END)"
    if feat.agg is Agg.COUNT:
        return F.expr(
            f"CAST(coalesce({cnt_sum}, 0) AS BIGINT) "
            f"AS {quote_ident(feat.name)}"
        )
    m = feat.measure
    if feat.agg is Agg.SUM:
        expr = (
            f"coalesce(sum(CASE WHEN {cond} "
            f"THEN {quote_ident(_sum_col(m))} END), CAST(0 AS DOUBLE))"
        )
    elif feat.agg is Agg.AVG:
        # exact Σsum/Σcount (§2.7.2 fix); NULL when no bucket matches
        total = f"sum(CASE WHEN {cond} THEN {quote_ident(_sum_col(m))} END)"
        expr = f"CASE WHEN {cnt_sum} > 0 THEN {total} / {cnt_sum} END"
    elif feat.agg is Agg.MIN:
        expr = f"min(CASE WHEN {cond} THEN {quote_ident(_min_col(m))} END)"
    elif feat.agg is Agg.MAX:
        expr = f"max(CASE WHEN {cond} THEN {quote_ident(_max_col(m))} END)"
    else:  # pragma: no cover
        raise ValueError(f"unknown agg {feat.agg}")
    if spec.round_decimals is not None:
        expr = f"round({expr}, {spec.round_decimals})"
    return F.expr(f"{expr} AS {quote_ident(feat.name)}")


def compile_bucket_rollup(spec: FeatureSpec, df: DataFrame) -> DataFrame:
    """Compile ``spec`` into the bucket + exact-rollup plan.

    Multi-measure: one shared row-count plus ``{sum,min,max}`` per measure
    in the SAME partial aggregation — k measures widen the partial row by
    3k numerics but add no scan, shuffle, or extra aggregation pass."""
    category_cols = sorted({c for g in spec.groupings for c in g.cols})

    pruned = df.select(*spec.input_columns())
    in_scope = pruned.filter(F.col(spec.time_col) <= F.lit(max(spec.windows)))
    bucketed = in_scope.withColumn(
        _BUCKET, smallest_window_bucket(spec.time_col, spec.windows)
    )

    partial_aggs = [F.count(F.lit(1)).alias(_CNT)]
    for m in spec.measures:
        partial_aggs += [
            F.sum(F.col(m)).alias(_sum_col(m)),
            F.min(F.col(m)).alias(_min_col(m)),
            F.max(F.col(m)).alias(_max_col(m)),
        ]
    partial = bucketed.groupBy(*spec.keys, *category_cols, _BUCKET).agg(
        *partial_aggs
    )

    exprs = [_rollup_expr(spec, feat) for feat in spec.features()]
    return partial.groupBy(*spec.keys).agg(*exprs)
