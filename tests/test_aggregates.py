"""Skew-safe two-phase COUNT(DISTINCT) — equality with the plain form."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from feature_generation_benchmark_spark.operators.aggregates import (
    skew_safe_distinct_count,
)


@pytest.fixture(scope="module")
def skewed(spark):
    # one hot key owning ~90% of rows, many distinct values; plus nulls
    df = spark.range(0, 5000).select(
        F.when(F.col("id") % 10 < 9, F.lit("hot"))
        .otherwise(F.concat(F.lit("cold"), (F.col("id") % 7).cast("string")))
        .alias("k"),
        F.when(F.col("id") % 97 == 0, F.lit(None).cast("long"))
        .otherwise(F.col("id") % 613)
        .alias("v"),
    )
    return df.cache()


def _plain(df):
    return {
        r["k"]: r["n"]
        for r in df.groupBy("k")
        .agg(F.count_distinct("v").alias("n"))
        .collect()
    }


def test_equals_plain_count_distinct(spark, skewed):
    got = {
        r["k"]: r["n_distinct"]
        for r in skew_safe_distinct_count(skewed, ["k"], "v").collect()
    }
    assert got == _plain(skewed)


def test_bucket_count_invariance(spark, skewed):
    base = _plain(skewed)
    for buckets in (1, 3, 256):
        got = {
            r["k"]: r["n_distinct"]
            for r in skew_safe_distinct_count(
                skewed, ["k"], "v", buckets=buckets
            ).collect()
        }
        assert got == base, buckets


def test_rejects_bad_buckets(spark, skewed):
    with pytest.raises(ValueError):
        skew_safe_distinct_count(skewed, ["k"], "v", buckets=0)


def test_shuffle_key_carries_value_bucket(spark, skewed):
    """The phase-1 exchange must partition on (key, value-bucket) — that
    IS the skew protection; if it ever degrades to key-only partitioning
    the rewrite silently loses its point."""
    plan = (
        skew_safe_distinct_count(skewed, ["k"], "v")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # Catalyst folds the __vbucket alias into a _groupingexpression; either
    # way an exchange must hash-partition on more than the key alone
    exchanges = [
        ln for ln in plan.splitlines() if "Exchange hashpartitioning" in ln
    ]
    assert exchanges
    assert any(
        "__vbucket" in ln or "_groupingexpression" in ln for ln in exchanges
    )


def test_hll_partials_merge_equals_direct_sketch(spark, skewed):
    """Union-of-sketches tracks sketch-of-union within sketch error (the
    union gadget's wider registers make it near- but not bit-identical),
    and both land within HLL error of the exact answer."""
    from feature_generation_benchmark_spark.operators.aggregates import (
        hll_partials,
        hll_rollup,
    )

    df = skewed.withColumn("day", (F.col("v") % 5).cast("int"))
    partials = hll_partials(df, ["k", "day"], "v")
    merged = {
        r["k"]: r["n_distinct_approx"]
        for r in hll_rollup(partials, ["k"]).collect()
    }
    direct = {
        r["k"]: r["n"]
        for r in df.groupBy("k")
        .agg(
            F.hll_sketch_estimate(
                F.hll_sketch_agg(F.col("v"), F.lit(12))
            ).alias("n")
        )
        .collect()
    }
    exact = _plain(skewed)
    for k, est in merged.items():
        assert abs(est - direct[k]) <= max(3, 0.02 * exact[k]), (k, est)
        assert abs(est - exact[k]) <= max(3, 0.05 * exact[k]), (k, est)


def test_agg_partials_compose_and_finalize(spark):
    """merge(partials(A) ∪ partials(B)) == partials(A ∪ B), and the
    finalized columns equal a direct one-shot aggregation."""
    from feature_generation_benchmark_spark.operators.aggregates import (
        agg_partials,
        finalize_aggs,
        merge_agg_partials,
    )

    df = spark.range(0, 4000).select(
        (F.col("id") % 37).alias("k"),
        # integer-valued doubles -> exact sums in any order
        F.round((F.xxhash64("id") % 1000).cast("double"), 0).alias("x"),
        F.when(F.col("id") % 11 == 0, None)
        .otherwise((F.col("id") % 97).cast("double"))
        .alias("y"),
    )
    a, b = df.filter("id % 2 = 0"), df.filter("id % 2 = 1")
    merged = merge_agg_partials(
        agg_partials(a, ["k"], ["x", "y"]).unionByName(
            agg_partials(b, ["k"], ["x", "y"])
        ),
        ["k"],
        ["x", "y"],
    )
    whole = agg_partials(df, ["k"], ["x", "y"])
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, whole.collect())
    )

    fin = {r["k"]: r for r in finalize_aggs(merged, ["k"], ["x", "y"]).collect()}
    direct = {
        r["k"]: r
        for r in df.groupBy("k")
        .agg(
            F.count("x").alias("x_count"),
            F.sum("x").alias("x_sum"),
            F.min("x").alias("x_min"),
            F.max("x").alias("x_max"),
            F.count("y").alias("y_count"),
            F.sum("y").alias("y_sum"),
        )
        .collect()
    }
    for k, r in fin.items():
        d = direct[k]
        assert (r["x_count"], r["x_sum"], r["x_min"], r["x_max"]) == (
            d["x_count"], d["x_sum"], d["x_min"], d["x_max"],
        )
        # null-skipping count semantics survive the partials
        assert (r["y_count"], r["y_sum"]) == (d["y_count"], d["y_sum"])
        assert r["x_avg"] == d["x_sum"] / d["x_count"]


def test_all_null_group_appears_with_zero(spark):
    """A key whose values are all NULL must surface with count 0 —
    exactly like plain groupBy + count_distinct (and the SQL oracle)."""
    df = spark.createDataFrame(
        [("a", 1), ("a", 2), ("allnull", None), ("allnull", None)],
        "k string, v long",
    )
    got = {
        r["k"]: r["n_distinct"]
        for r in skew_safe_distinct_count(df, ["k"], "v").collect()
    }
    assert got == {"a": 2, "allnull": 0}
