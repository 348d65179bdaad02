"""Bucketed co-located join: same bucketing on both sides ⇒ the join plan
contains NO shuffle — the layout-level optimization that amortizes one
write-time shuffle across every future join at scale."""

from __future__ import annotations

from pyspark.sql import functions as F

from feature_generation_benchmark_spark.sources.io import write_bucketed_table


def test_bucketed_join_is_exchange_free(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("bucketed")
    a = spark.range(0, 5000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("va")
    )
    b = spark.range(0, 5000).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("vb")
    )
    for name, df in (("bt_a", a), ("bt_b", b)):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        write_bucketed_table(
            df, name, buckets=8, key_cols=["k"], path=str(base / name),
            sorted_by=["k"],
        )

    # disable broadcast so the comparison is shuffle-vs-bucketing, not
    # shuffle-vs-broadcast (a small side would otherwise broadcast)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("bt_a").join(spark.table("bt_b"), "k")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert joined.count() == 5000

        # sanity: the same join on plain parquet DOES shuffle
        pa_, pb_ = str(base / "pa"), str(base / "pb")
        a.write.parquet(pa_)
        b.write.parquet(pb_)
        plain = spark.read.parquet(pa_).join(spark.read.parquet(pb_), "k")
        plain_plan = plain._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" in plain_plan
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
        )
