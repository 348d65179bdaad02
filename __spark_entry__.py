"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship feature-generation query at sf0.001.
``queries()`` — one entry per implemented operator (SURVEY.md §2 +
extension operators), assembled from the workload registry.
``oracle_sql()`` — DuckDB ANSI-SQL twins (generated from the same spec
objects where applicable); entries without a twin get the driver's weaker
rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from feature_generation_benchmark_spark.plans import compile_features
from feature_generation_benchmark_spark.sources.testdata import events_transactions
from feature_generation_benchmark_spark.workloads import registry
from feature_generation_benchmark_spark.workloads.events_features import (
    EVENTS_SPEC,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: planner-selected feature generation on sf0.001 events
    (resolves to the integer-cell bucket-pivot plan for this spec)."""
    trx = events_transactions(
        spark, "/root/testdata/sf0.001", max_t_minus=max(EVENTS_SPEC.windows)
    )
    return compile_features(EVENTS_SPEC, trx)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: q.fn for name, q in registry().items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: q.oracle for name, q in registry().items() if q.oracle is not None
    }
