"""Point-in-time feature backfill — per-label trailing-window features.

THE feature-store training op: every supervised label (here: each
``purchase`` event) gets features computed from the user's history
STRICTLY BEFORE its own timestamp — per-row as-of semantics, not a global
cutoff (that is ``features_asof``'s serving path). Getting this join
right is what prevents training-serving skew / label leakage.

Plan shape (round-3 rewrite): NO label×history join at all. Labels are
unioned with the event stream (label rows carry zeroed measures) and the
trailing features are sliding RANGE frames over ONE user-keyed window —
``rangeBetween(-W, -1)`` on exact µs timestamps, evaluated incrementally
by Spark's sliding-frame machinery (add/remove rows as the frame slides,
O(events) per user after the sort). The earlier equi-join formulation
multiplied each label by its 30-day history, which is quadratic per hot
user (a user with H events and P labels materialized P×H join rows);
the window formulation is a single hash-partition shuffle on user_id and
linear per user, so a hot key costs sort + one pass, never a blowup.
Both 7d and 30d frames share one Window operator (same partitioning and
ordering → one shuffle, one sort, two frames).

Determinism: exact integer µs timestamps and cents; the frame upper
bound ``-1`` on integer µs is exactly the strict ``<`` bound, so a
label's own event never leaks into its features; range frames are
defined by VALUE, so ordering ties cannot change the result.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from feature_generation_benchmark_spark.sources.testdata import load_table
from feature_generation_benchmark_spark.workloads import QueryDef

_WINDOWS_US = {"7d": 7 * 86_400 * 10**6, "30d": 30 * 86_400 * 10**6}


def point_in_time_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "event_type",
        F.expr("ts div 1000").alias("ts_us"),
        F.round(F.col("value") * F.lit(100), 0).cast("long").alias("cents"),
    )
    # Event rows contribute their measures; label rows (one per purchase
    # event, which ALSO stays in the stream as a measure-bearing event
    # row) contribute zero so they never count toward another label's
    # trailing features. NULL-user events contribute NOTHING (the window
    # partitioner would otherwise pool all NULL keys into one pseudo-user
    # and leak features across anonymous sessions; the join-based oracle
    # drops NULL keys, so NULL-user labels keep their all-zero rows).
    measures = ev.filter(F.col("user_id").isNotNull()).select(
        "user_id",
        F.lit(None).cast(ev.schema["event_id"].dataType).alias("label_id"),
        "ts_us",
        F.lit(1).alias("is_event"),
        "cents",
        (F.col("event_type") == "error").cast("int").alias("is_error"),
    )
    labels = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("label_id"),
        "ts_us",
        F.lit(0).alias("is_event"),
        F.lit(0).cast("long").alias("cents"),
        F.lit(0).alias("is_error"),
    )
    u = measures.unionByName(labels)
    cols = []
    for win in ("7d", "30d"):
        # frame [ts - W, ts - 1]: inclusive lower bound == `>=`, the -1
        # upper bound on integer µs == strict `<` (no self-leakage)
        w = (
            Window.partitionBy("user_id")
            .orderBy("ts_us")
            .rangeBetween(-_WINDOWS_US[win], -1)
        )
        cols += [
            F.coalesce(F.sum("is_event").over(w), F.lit(0)).cast(
                "long"
            ).alias(f"n_events_{win}"),
            F.coalesce(F.sum("cents").over(w), F.lit(0)).alias(
                f"sum_cents_{win}"
            ),
            F.coalesce(F.sum("is_error").over(w), F.lit(0)).cast(
                "long"
            ).alias(f"n_errors_{win}"),
        ]
    out = u.select(
        "user_id", "label_id", F.col("ts_us").alias("label_ts_us"), *cols
    )
    order = [
        "n_events_7d",
        "sum_cents_7d",
        "n_errors_7d",
        "n_events_30d",
        "sum_cents_30d",
        "n_errors_30d",
    ]
    return out.filter(F.col("label_id").isNotNull()).select(
        "user_id", "label_id", "label_ts_us", *order
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
