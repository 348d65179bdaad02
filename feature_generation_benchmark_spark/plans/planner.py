"""Strategy selection — the engine's (tiny) query planner.

The reference's four physical strategies are hand-picked per script; the
benchmark numbers (BASELINE.md) show plan *shape* dominates engine speed
(39× between case-when and bucket+rollup at 1.7B rows). We encode that
knowledge as a plan-construction heuristic — idiomatic for a
DataFrame-building library; no Catalyst extension needed (SURVEY §7.4).
"""

from __future__ import annotations

from typing import Literal

from pyspark.sql import DataFrame

from feature_generation_benchmark_spark.plans.bucket_pivot import (
    MAX_CELLS,
    compile_bucket_pivot,
)
from feature_generation_benchmark_spark.plans.bucket_rollup import (
    compile_bucket_rollup,
)
from feature_generation_benchmark_spark.plans.case_when import compile_case_when
from feature_generation_benchmark_spark.plans.grouped_map import compile_grouped_map
from feature_generation_benchmark_spark.spec import FeatureSpec

Strategy = Literal[
    "auto", "case_when", "bucket_pivot", "bucket_rollup", "grouped_map"
]

#: Rough threshold: below this many feature cells the single-pass
#: conditional agg is cheaper (no second shuffle, smaller plan); above it,
#: per-row CASE WHEN evaluation cost dominates the scan and the bucketed
#: partial aggregation wins (reference medium-scale evidence, BASELINE.md).
CASE_WHEN_MAX_FEATURES = 64


def choose_strategy(spec: FeatureSpec) -> Strategy:
    # The feature count alone captures the per-row CASE WHEN cost — a
    # single-window spec with hundreds of features pays it just the same,
    # and the bucketed strategies still collapse rows to one partial per
    # (key, cats) first (a previous windows>1 precondition here forced
    # wide single-window specs into the pathological plan for no reason).
    if spec.n_features > CASE_WHEN_MAX_FEATURES:
        from feature_generation_benchmark_spark.plans.bucket_pivot import (
            n_union_cells,
        )

        # integer-cell pivot removes the per-partial-row CASE WHEN cost
        # (measured ~2x at 1.7B rows) while its pivot buffer stays small;
        # huge cell domains fall back to the conditional re-aggregation
        if n_union_cells(spec) <= MAX_CELLS:
            return "bucket_pivot"
        return "bucket_rollup"
    return "case_when"


def compile_features(
    spec: FeatureSpec, df: DataFrame, strategy: Strategy = "auto"
) -> DataFrame:
    """Compile a FeatureSpec over a long-format DataFrame into a wide
    1-row-per-key feature DataFrame, using the selected physical strategy.

    All strategies produce identical results (the cross-strategy invariant
    the reference implies but never checks — SURVEY §5); they differ only in
    physical plan shape.
    """
    if strategy == "auto":
        strategy = choose_strategy(spec)
    if strategy == "case_when":
        return compile_case_when(spec, df)
    if strategy == "bucket_pivot":
        return compile_bucket_pivot(spec, df)
    if strategy == "bucket_rollup":
        return compile_bucket_rollup(spec, df)
    if strategy == "grouped_map":
        return compile_grouped_map(spec, df)
    raise ValueError(f"unknown strategy {strategy!r}")
