"""Tests for the explicit domain-discovery helper (A6 escape hatch)."""

from __future__ import annotations

import pytest

from feature_generation_benchmark_spark.plans.discovery import discover_values


def test_discovers_sorted_domains(spark):
    df = spark.createDataFrame(
        [("b", 2), ("a", 1), ("b", 1), ("a", 2), ("c", 1)],
        "cat string, num int",
    )
    g = discover_values(df, ("cat", "num"))
    assert g.cols == ("cat", "num")
    assert g.domains == (("a", "b", "c"), ("1", "2"))
    assert g.closed is True
    assert len(g.combos()) == 6


def test_overflow_raises_with_column_name(spark):
    df = spark.range(50).selectExpr("CAST(id AS STRING) AS wide", "'x' AS ok")
    with pytest.raises(ValueError, match="wide"):
        discover_values(df, ("ok", "wide"), max_values=10)


def test_all_null_column_raises(spark):
    df = spark.createDataFrame([(None,), (None,)], "c string")
    with pytest.raises(ValueError, match="all-NULL"):
        discover_values(df, ("c",))


def test_feeds_a_compilable_spec(spark):
    from feature_generation_benchmark_spark.plans.planner import (
        compile_features,
    )
    from feature_generation_benchmark_spark.spec import FeatureSpec

    df = spark.createDataFrame(
        [(1, "DC", 10.0, 3), (1, "CC", 20.0, 9), (2, "DC", 5.0, 1)],
        "customer_id long, card_type string, trx_amnt double, t_minus long",
    )
    spec = FeatureSpec(
        key="customer_id",
        time_col="t_minus",
        measure="trx_amnt",
        windows=(7,),
        groupings=(discover_values(df, ("card_type",)),),
    )
    rows = {r.customer_id: r for r in compile_features(spec, df).collect()}
    assert rows[1].DC_7d_sum == 10.0
    assert rows[1].CC_7d_count == 0
    assert rows[2].DC_7d_count == 1
