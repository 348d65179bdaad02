"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship feature-generation query at sf0.001.
``queries()`` — one entry per implemented operator (SURVEY.md §2 + extensions).
``oracle_sql()`` — DuckDB ANSI-SQL twins generated from the SAME spec objects.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from feature_generation_benchmark_spark.plans import (
    compile_bucket_rollup,
    compile_case_when,
    compile_grouped_map,
)
from feature_generation_benchmark_spark.plans.oracle import oracle_sql_for_spec
from feature_generation_benchmark_spark.sources.testdata import (
    EVENT_TYPES,
    events_transactions,
    events_transactions_from_sql,
)
from feature_generation_benchmark_spark.spec import FeatureSpec, Grouping

# ---------------------------------------------------------------------------
# Flagship spec: the reference task family instantiated on the driver's
# `events` table (user_id × event_type × trailing windows × 5 aggs = 100
# features). round_decimals pins double summation order differences.
# ---------------------------------------------------------------------------

EVENTS_SPEC = FeatureSpec(
    key="user_id",
    time_col="t_minus",
    measure="value_cents",  # exact integer-valued doubles → deterministic aggs
    windows=(7, 14, 21, 30),
    groupings=(Grouping(cols=("event_type",), domains=(EVENT_TYPES,)),),
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: bucket+exact-rollup feature generation on sf0.001 events."""
    trx = events_transactions(spark, "/root/testdata/sf0.001")
    return compile_bucket_rollup(EVENTS_SPEC, trx)


def _feat_case_when(spark: SparkSession, sf_dir: str) -> DataFrame:
    return compile_case_when(EVENTS_SPEC, events_transactions(spark, sf_dir))


def _feat_bucket_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return compile_bucket_rollup(EVENTS_SPEC, events_transactions(spark, sf_dir))


def _feat_grouped_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    return compile_grouped_map(EVENTS_SPEC, events_transactions(spark, sf_dir))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "feat_case_when": _feat_case_when,
        "feat_bucket_rollup": _feat_bucket_rollup,
        "feat_grouped_map": _feat_grouped_map,
    }


def oracle_sql() -> dict[str, str]:
    feat_oracle = oracle_sql_for_spec(
        EVENTS_SPEC, events_transactions_from_sql()
    )
    return {
        "feat_case_when": feat_oracle,
        "feat_bucket_rollup": feat_oracle,
        "feat_grouped_map": feat_oracle,
    }
