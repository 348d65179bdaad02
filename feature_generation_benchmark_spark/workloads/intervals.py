"""Interval-overlap analytics WITHOUT a range join — the sweep-line
pattern.

"How many intervals are open on each day" is usually written as a range
join (calendar × intervals on ``day BETWEEN open AND close``) — O(N × D)
rows moved and a non-equi join Spark can only execute as a broadcast
nested loop. The sweep-line decomposition turns it into two linear passes:
every interval emits a +1 at its open day and a −1 after its close day,
the deltas aggregate per (key, day) — ONE equi-shuffle with map-side
combine — and a cumulative window sum over the (bounded, calendar-sized)
delta table reconstructs the concurrency curve. At 100 TB the only
full-data exchanges are the per-order close-date aggregation and the
delta aggregation, both keyed and combining; the window runs over at most
``|keys| × |days|`` rows — a constant-bounded frame regardless of corpus
size.

The reference has no interval surface at all (its time model is integer
``t_minus`` day buckets); this is extension surface in the spirit of the
hypertable operators in ``workloads/timeseries.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from feature_generation_benchmark_spark.sources.testdata import load_table
from feature_generation_benchmark_spark.workloads import QueryDef

#: Integer epoch-day origin shared with the oracle (dates are exchanged as
#: exact integers — the repo-wide dtype-parity convention).
_EPOCH = "1970-01-01"


def open_orders_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concurrently-open orders per (priority, day) by sweep line.

    An order is "open" from ``o_orderdate`` through the latest
    ``l_shipdate`` of its lineitems (inclusive). Output: one row per
    (o_orderpriority, day) holding an interval endpoint, with the net
    change and the running number of open orders — ``net_change`` can be
    0 on a day where one order's open coincides with another's close+1,
    so this is an endpoint list, not a strict change-point list.

    Plan shape: per-order close date (orderkey-keyed agg) → inner join
    back to orders (orderkey-keyed, co-partitioned) → ±1 delta union
    (shuffle-free projections) → (priority, day) agg → cumulative sum on
    a Window partitioned by priority over the bounded delta table."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderpriority",
        F.col("o_orderdate").cast("date").alias("open_d"),
    )
    close = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.max(F.col("l_shipdate").cast("date")).alias("close_d"))
    )
    iv = orders.join(
        close, orders["o_orderkey"] == close["l_orderkey"]
    ).select("o_orderpriority", "open_d", "close_d")
    epoch = F.lit(_EPOCH).cast("date")
    # both endpoints in ONE pass: the former opens/closes UNION
    # referenced the iv subtree twice, so the lineitem close-date agg
    # and the orderkey join executed twice per run (Catalyst does not
    # CSE across union legs) — exploding each interval row into its
    # (+1 at open, -1 at close+1) endpoint structs emits the identical
    # delta rows from a single join (r7, guide §2.4)
    deltas = (
        iv.select(
            "o_orderpriority",
            F.explode(
                F.array(
                    F.struct(
                        F.datediff("open_d", epoch).alias("day"),
                        F.lit(1).alias("delta"),
                    ),
                    F.struct(
                        (F.datediff("close_d", epoch) + F.lit(1)).alias(
                            "day"
                        ),
                        F.lit(-1).alias("delta"),
                    ),
                )
            ).alias("e"),
        )
        .select("o_orderpriority", "e.day", "e.delta")
        .groupBy("o_orderpriority", "day")
        .agg(F.sum("delta").cast("long").alias("net_change"))
    )
    w = (
        Window.partitionBy("o_orderpriority")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return deltas.select(
        "o_orderpriority",
        F.col("day").cast("long").alias("day"),
        "net_change",
        F.sum("net_change").over(w).cast("long").alias("open_orders"),
    )


_OPEN_ORDERS_ORACLE = f"""
WITH close AS (
  SELECT l_orderkey, max(CAST(l_shipdate AS DATE)) AS close_d
  FROM lineitem GROUP BY l_orderkey
),
iv AS (
  SELECT o_orderpriority, CAST(o_orderdate AS DATE) AS open_d, close_d
  FROM orders JOIN close ON o_orderkey = l_orderkey
),
deltas AS (
  SELECT o_orderpriority, open_d - DATE '{_EPOCH}' AS day, 1 AS delta
  FROM iv
  UNION ALL
  SELECT o_orderpriority, close_d - DATE '{_EPOCH}' + 1, -1 FROM iv
),
g AS (
  SELECT o_orderpriority, CAST(day AS BIGINT) AS day,
         CAST(sum(delta) AS BIGINT) AS net_change
  FROM deltas GROUP BY o_orderpriority, day
)
SELECT o_orderpriority, day, net_change,
  CAST(sum(net_change) OVER (
    PARTITION BY o_orderpriority ORDER BY day
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
    AS open_orders
FROM g
"""

QUERIES = [
    QueryDef(
        "open_orders_daily",
        open_orders_daily,
        _OPEN_ORDERS_ORACLE,
        "interval concurrency by sweep line (range-join-free open-order "
        "counts per priority/day)",
    ),
]


def scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-2 dimension build from a change-event stream: per user,
    compress consecutive repeats of the tracked attribute (event_type)
    into versions with validity intervals [start, next_start), then roll
    up per-user version statistics.

    The classic warehouse op the reference's static dimension model never
    needs but every event-sourced pipeline does. Plan: ONE user-keyed
    exchange; the version-start detection (lag over (ts, event_id)) and
    the interval close (lead over version starts) are two window passes
    sharing the same hash partitioning — Spark plans a single Exchange
    with two sorts — and the final rollup is user-keyed too, so it
    reuses the partitioning. Determinism: ordering ties broken by
    event_id; all arithmetic in integer epoch-µs; the open (last)
    version has no end and is excluded from duration stats (counts
    pinned to 0, repo dtype convention — NULL longs would float-ify the
    pandas compare).

    Output: (user_id, n_versions, n_closed, total_closed_dur_us,
    max_closed_dur_us).
    """
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "event_type",
        F.expr("ts div 1000").alias("ts_us"),
    )
    w_ev = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    marked = ev.withColumn("prev_type", F.lag("event_type").over(w_ev))
    starts = marked.filter(
        F.col("prev_type").isNull()
        | (F.col("prev_type") != F.col("event_type"))
    ).select("user_id", "event_id", F.col("ts_us").alias("start_us"))
    w_ver = Window.partitionBy("user_id").orderBy("start_us", "event_id")
    versions = starts.withColumn("end_us", F.lead("start_us").over(w_ver))
    dur = F.col("end_us") - F.col("start_us")
    return versions.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_versions"),
        F.count("end_us").cast("long").alias("n_closed"),
        F.coalesce(F.sum(dur), F.lit(0)).cast("long").alias(
            "total_closed_dur_us"
        ),
        F.coalesce(F.max(dur), F.lit(0)).cast("long").alias(
            "max_closed_dur_us"
        ),
    )


_SCD2_ORACLE = """
WITH e AS (
  SELECT user_id, event_id, epoch_us(ts) AS ts_us, event_type FROM events
),
marked AS (
  SELECT *, lag(event_type) OVER (
    PARTITION BY user_id ORDER BY ts_us, event_id) AS prev_type
  FROM e
),
starts AS (
  SELECT user_id, event_id, ts_us AS start_us FROM marked
  WHERE prev_type IS NULL OR prev_type <> event_type
),
v AS (
  SELECT user_id, start_us, lead(start_us) OVER (
    PARTITION BY user_id ORDER BY start_us, event_id) AS end_us
  FROM starts
)
SELECT user_id,
  CAST(count(*) AS BIGINT) AS n_versions,
  CAST(count(end_us) AS BIGINT) AS n_closed,
  CAST(coalesce(sum(end_us - start_us), 0) AS BIGINT)
    AS total_closed_dur_us,
  CAST(coalesce(max(end_us - start_us), 0) AS BIGINT)
    AS max_closed_dur_us
FROM v GROUP BY user_id
"""

QUERIES.append(
    QueryDef(
        "scd2_intervals",
        scd2_intervals,
        _SCD2_ORACLE,
        "SCD Type-2 dimension build: change-compressed validity intervals "
        "per user from the event stream, one user-keyed exchange",
    )
)
