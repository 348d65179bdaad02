"""Point-in-time feature backfill — per-label trailing-window features.

THE feature-store training op: every supervised label (here: each
``purchase`` event) gets features computed from the user's history
STRICTLY BEFORE its own timestamp — per-row as-of semantics, not a global
cutoff (that is ``features_asof``'s serving path). Getting this join
right is what prevents training-serving skew / label leakage.

Plan shape: labels and events equi-join on user_id (ONE keyed shuffle
pair), with the window predicate as a join-time filter; features are
conditional aggregations per (user, label) — decomposable, map-side
combining. At 100 TB the join is user-hash-partitioned and the history
side can additionally be pre-bounded by the max window via partition
pruning (``events_transactions(max_t_minus=...)`` precedent).

Determinism: exact integer µs timestamps and cents; strict ``<`` bound
means a label's own event never leaks into its features.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from feature_generation_benchmark_spark.sources.testdata import load_table
from feature_generation_benchmark_spark.workloads import QueryDef

_WINDOWS_US = {"7d": 7 * 86_400 * 10**6, "30d": 30 * 86_400 * 10**6}


def point_in_time_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "event_type",
        F.expr("ts div 1000").alias("ts_us"),
        F.round(F.col("value") * F.lit(100), 0).cast("long").alias("cents"),
    )
    labels = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("label_id"),
        F.col("ts_us").alias("label_ts_us"),
    )
    hist = ev.select("user_id", "ts_us", "event_type", "cents")
    joined = labels.join(hist, "user_id").filter(
        (F.col("ts_us") < F.col("label_ts_us"))
        & (
            F.col("ts_us")
            >= F.col("label_ts_us") - F.lit(_WINDOWS_US["30d"])
        )
    )
    in7 = F.col("ts_us") >= F.col("label_ts_us") - F.lit(_WINDOWS_US["7d"])
    aggs = []
    for win, cond in (("7d", in7), ("30d", F.lit(True))):
        aggs += [
            F.count(F.when(cond, 1)).alias(f"n_events_{win}"),
            F.sum(F.when(cond, F.col("cents"))).alias(f"sum_cents_{win}"),
            F.count(
                F.when(cond & (F.col("event_type") == "error"), 1)
            ).alias(f"n_errors_{win}"),
        ]
    feats = joined.groupBy("user_id", "label_id", "label_ts_us").agg(*aggs)
    # labels with NO prior history inside the window must still appear
    # (all-zero features) — the left join back is the leakage-proof
    # equivalent of the reference task's "every key appears" contract
    return labels.join(
        feats, ["user_id", "label_id", "label_ts_us"], "left"
    ).select(
        "user_id",
        "label_id",
        "label_ts_us",
        *[
            F.coalesce(F.col(c), F.lit(0)).alias(c)
            for c in (
                "n_events_7d",
                "sum_cents_7d",
                "n_errors_7d",
                "n_events_30d",
                "sum_cents_30d",
                "n_errors_30d",
            )
        ],
    )


_PIT_ORACLE = f"""
WITH ev AS (
  SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us,
         CAST(round(value*100) AS BIGINT) AS cents
  FROM events
), labels AS (
  SELECT user_id, event_id AS label_id, ts_us AS label_ts_us
  FROM ev WHERE event_type = 'purchase'
), joined AS (
  SELECT l.user_id, l.label_id, l.label_ts_us, e.ts_us, e.event_type,
         e.cents
  FROM labels l JOIN ev e USING (user_id)
  WHERE e.ts_us < l.label_ts_us
    AND e.ts_us >= l.label_ts_us - {_WINDOWS_US["30d"]}
), feats AS (
  SELECT user_id, label_id, label_ts_us,
    CAST(count(*) FILTER (ts_us >= label_ts_us - {_WINDOWS_US["7d"]})
         AS BIGINT) AS n_events_7d,
    CAST(coalesce(sum(cents) FILTER (
         ts_us >= label_ts_us - {_WINDOWS_US["7d"]}), 0)
         AS BIGINT) AS sum_cents_7d,
    CAST(count(*) FILTER (event_type = 'error'
         AND ts_us >= label_ts_us - {_WINDOWS_US["7d"]})
         AS BIGINT) AS n_errors_7d,
    CAST(count(*) AS BIGINT) AS n_events_30d,
    CAST(sum(cents) AS BIGINT) AS sum_cents_30d,
    CAST(count(*) FILTER (event_type = 'error') AS BIGINT) AS n_errors_30d
  FROM joined GROUP BY user_id, label_id, label_ts_us
)
SELECT l.user_id, l.label_id, l.label_ts_us,
  coalesce(f.n_events_7d, 0) AS n_events_7d,
  coalesce(f.sum_cents_7d, 0) AS sum_cents_7d,
  coalesce(f.n_errors_7d, 0) AS n_errors_7d,
  coalesce(f.n_events_30d, 0) AS n_events_30d,
  coalesce(f.sum_cents_30d, 0) AS sum_cents_30d,
  coalesce(f.n_errors_30d, 0) AS n_errors_30d
FROM labels l
LEFT JOIN feats f USING (user_id, label_id, label_ts_us)
"""


QUERIES = [
    QueryDef(
        "point_in_time_features",
        point_in_time_features,
        _PIT_ORACLE,
        "per-label as-of trailing features (training-serving skew guard)",
    ),
]
