"""Workload registry — named (Spark query, SQL oracle) pairs.

Each workload module contributes :class:`QueryDef` entries; the driver
contract (``__spark_entry__.py``) is assembled from this registry so adding
an operator is one list append.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QueryDef:
    """One verifiable query: ``fn(spark, sf_dir) -> DataFrame`` plus an
    optional DuckDB oracle SQL twin (None → driver records a weaker
    rows-only check), plus a benchmark flag."""

    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    description: str = ""
    bench: bool = True


def registry() -> dict[str, QueryDef]:
    from feature_generation_benchmark_spark.workloads import (
        curation,
        dedup,
        events_features,
        graph,
        multimodal,
        relational,
        sampling,
        features_eng,
        funnel,
        linkage,
        pit,
        quality,
        similarity,
        text,
        timeseries,
        tpch_extra,
        udtf_ops,
    )

    out: dict[str, QueryDef] = {}
    for mod in (
        events_features,
        relational,
        tpch_extra,
        dedup,
        similarity,
        text,
        sampling,
        curation,
        multimodal,
        graph,
        timeseries,
        features_eng,
        udtf_ops,
        linkage,
        funnel,
        pit,
        quality,
    ):
        for q in mod.QUERIES:
            if q.name in out:
                raise ValueError(f"duplicate query name {q.name}")
            out[q.name] = q
    return out
