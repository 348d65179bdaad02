"""Approximate aggregates: accuracy asserted against the exact answers
within the sketches' published error bounds (the check an oracle hash
cannot express — sketch internals are engine-specific)."""

from __future__ import annotations

from pyspark.sql import functions as F

from feature_generation_benchmark_spark.workloads.relational import (
    approx_users_per_type,
)

SF = "/root/testdata/sf0.01"


def test_hll_within_rsd(spark):
    approx = {
        r["event_type"]: r["n_users_approx"]
        for r in approx_users_per_type(spark, SF).collect()
    }
    ev = spark.read.parquet(f"{SF}/events.parquet")
    exact = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert approx.keys() == exact.keys()
    for k, n in exact.items():
        # rsd=0.02 → 5σ bound with slack for small-cardinality bias
        assert abs(approx[k] - n) <= max(3, 0.1 * n), (k, approx[k], n)


def test_quantile_sketch_brackets_exact(spark):
    rows = {
        r["event_type"]: r for r in approx_users_per_type(spark, SF).collect()
    }
    ev = spark.read.parquet(f"{SF}/events.parquet").select(
        "event_type", F.round(F.col("value") * 100, 0).alias("cents")
    )
    for etype, r in rows.items():
        vals = sorted(
            x["cents"] for x in ev.filter(F.col("event_type") == etype).collect()
        )
        lo, hi = vals[int(0.45 * len(vals))], vals[int(0.55 * len(vals))]
        assert lo <= r["p50_value_cents"] <= hi, (etype, r["p50_value_cents"])
        assert r["p50_value_cents"] <= r["p99_value_cents"] <= vals[-1]
