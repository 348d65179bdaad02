"""Relational operator coverage on the TPC-H-ish driver tables.

Each query exercises one operator family from the inventory (SURVEY §2 +
engine extensions): filtered grouped aggregation, multi-way broadcast
joins, known-values pivot, OVER-clause windows, rollup, distinct
aggregation, semi/anti joins, set ops, as-of join, sessionization. Every
query has a DuckDB oracle twin.

Numeric discipline: monetary doubles are exactly 2-decimal in the testdata,
so all money flows through **integer-valued doubles** (cents, or
cents×pct units ``_e4``/``_e6``) — sums are then order-independent and
bit-equal across engines. Event timestamps flow as int64 MICROseconds (``ts div 1000`` on the raw
nanos) — µs is the finest granularity DuckDB's TIMESTAMP agrees on exactly —
so time arithmetic is exact integer math.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from feature_generation_benchmark_spark.operators.joins import (
    anti_join,
    asof_join,
    interval_join,
)
from feature_generation_benchmark_spark.operators.sessionization import (
    session_stats,
)
from feature_generation_benchmark_spark.sources.testdata import (
    NS_PER_DAY as _NS_PER_DAY_HLL,
    load_table,
)
from feature_generation_benchmark_spark.workloads import QueryDef

MKT_SEGMENTS = ("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY")

def _ts_ntz(date_str: str) -> Column:
    """Naive (no-zone) timestamp literal — lineitem/orders timestamps read
    as TIMESTAMP_NTZ (ms-precision parquet), matching DuckDB's naive
    TIMESTAMP; comparisons on the raw column push down to the scan."""
    return F.lit(date_str).cast("timestamp_ntz")


def _cents(col: str) -> Column:
    return F.round(F.col(col) * F.lit(100), 0)


#: Same operation as _cents (×100, round) — alias, not a copy, so the
#: scaling rule has one definition (r6 session-3 review).
_pct = _cents


# --------------------------------------------------------------------------
# q1 — pricing summary: filtered grouped aggregation (TPC-H Q1 shape)
# --------------------------------------------------------------------------

def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 with EXACT integer accumulation: the per-row terms are
    cast to long/decimal BEFORE the sums, so every sum is exact and
    order-free at ANY scale, then deterministically cast to double on
    output (identical IEEE round-to-nearest on both engines). The
    previous double-sum form was exact only while group sums stayed
    under 2^53 — sum_charge_e6 (~3.75e10/row) crosses that around sf0.5
    and the hash gate would start failing nondeterministically (r6
    session-3 review). charge accumulates in decimal(38,0): its sum
    passes int64 around sf30."""
    li = load_table(spark, sf_dir, "lineitem")
    d = li.filter(F.col("l_shipdate") < _ts_ntz("1998-09-03")).select(
        "l_returnflag",
        "l_linestatus",
        F.col("l_quantity").cast("long").alias("qty"),
        _cents("l_extendedprice").cast("long").alias("price_cents"),
        _pct("l_discount").cast("long").alias("disc_pct"),
        _pct("l_tax").cast("long").alias("tax_pct"),
    )
    charge = (
        F.col("price_cents")
        * (F.lit(100) - F.col("disc_pct"))
        * (F.lit(100) + F.col("tax_pct"))
    ).cast("decimal(20,0)")
    n = F.count(F.lit(1))
    return d.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum("qty").cast("double").alias("sum_qty"),
        F.sum("price_cents").cast("double").alias("sum_base_price_cents"),
        F.sum(F.col("price_cents") * (F.lit(100) - F.col("disc_pct")))
        .cast("double")
        .alias("sum_disc_price_e4"),
        F.sum(charge).cast("double").alias("sum_charge_e6"),
        (F.sum("qty").cast("double") / n).alias("avg_qty"),
        (F.sum("price_cents").cast("double") / n).alias("avg_price_cents"),
        (F.sum("disc_pct").cast("double") / n).alias("avg_disc_pct"),
        n.cast("long").alias("count_order"),
    )


_Q1_ORACLE = """
WITH d AS (
  SELECT l_returnflag, l_linestatus,
         CAST(l_quantity AS BIGINT) AS qty,
         CAST(round(l_extendedprice*100) AS BIGINT) AS price_cents,
         CAST(round(l_discount*100) AS BIGINT) AS disc_pct,
         CAST(round(l_tax*100) AS BIGINT) AS tax_pct
  FROM lineitem
  WHERE l_shipdate < TIMESTAMP '1998-09-03'
)
SELECT l_returnflag, l_linestatus,
  CAST(sum(qty) AS DOUBLE) AS sum_qty,
  CAST(sum(price_cents) AS DOUBLE) AS sum_base_price_cents,
  CAST(sum(price_cents*(100-disc_pct)) AS DOUBLE) AS sum_disc_price_e4,
  CAST(sum(CAST(price_cents AS HUGEINT)*(100-disc_pct)*(100+tax_pct))
       AS DOUBLE) AS sum_charge_e6,
  CAST(sum(qty) AS DOUBLE) / count(*) AS avg_qty,
  CAST(sum(price_cents) AS DOUBLE) / count(*) AS avg_price_cents,
  CAST(sum(disc_pct) AS DOUBLE) / count(*) AS avg_disc_pct,
  CAST(count(*) AS BIGINT) AS count_order
FROM d GROUP BY l_returnflag, l_linestatus
"""


# --------------------------------------------------------------------------
# q3 — top unshipped orders: 3-way join + agg + deterministic top-k
# --------------------------------------------------------------------------

def q3_top_unshipped(spark: SparkSession, sf_dir: str) -> DataFrame:
    cutoff = _ts_ntz("1998-01-01")
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < cutoff
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > cutoff
    )
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .select(
            "l_orderkey",
            (_cents("l_extendedprice") * (F.lit(100) - _pct("l_discount"))).alias(
                "rev_e4"
            ),
        )
    )
    rev = joined.groupBy("l_orderkey").agg(F.sum("rev_e4").alias("revenue_e4"))
    return rev.orderBy(F.col("revenue_e4").desc(), F.col("l_orderkey")).limit(10)


_Q3_ORACLE = """
SELECT l_orderkey, sum(round(l_extendedprice*100)*(100-round(l_discount*100)))
       AS revenue_e4
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-01-01'
  AND l_shipdate  > TIMESTAMP '1998-01-01'
GROUP BY l_orderkey
ORDER BY revenue_e4 DESC, l_orderkey
LIMIT 10
"""


# --------------------------------------------------------------------------
# q5 — revenue by customer region: 5-table join chain, dims broadcast
# --------------------------------------------------------------------------

def q5_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    )
    return joined.groupBy("r_name").agg(
        F.sum(
            _cents("l_extendedprice") * (F.lit(100) - _pct("l_discount"))
        ).alias("revenue_e4"),
        F.count(F.lit(1)).alias("n_lineitems"),
    )


_Q5_ORACLE = """
SELECT r_name,
  sum(round(l_extendedprice*100)*(100-round(l_discount*100))) AS revenue_e4,
  CAST(count(*) AS BIGINT) AS n_lineitems
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
"""


# --------------------------------------------------------------------------
# pivot — known-values pivot (operator A2/A7): nation × market segment
# --------------------------------------------------------------------------

def pivot_segments_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    base = cust.join(
        F.broadcast(nation), cust.c_nationkey == nation.n_nationkey
    ).select("n_name", "c_mktsegment", _cents("c_acctbal").alias("bal_cents"))
    pivoted = (
        base.groupBy("n_name")
        .pivot("c_mktsegment", list(MKT_SEGMENTS))  # explicit values: no
        # discovery scan (reference impl/duckdb_pivot-known-values.py:98-115)
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum("bal_cents").alias("bal_cents"),
        )
    )
    # canonical empty-cell semantics: count→0, sum→NULL
    return pivoted.select(
        "n_name",
        *[
            e
            for seg in MKT_SEGMENTS
            for e in (
                F.coalesce(F.col(f"{seg}_cnt"), F.lit(0))
                .cast("long")
                .alias(f"{seg}_cnt"),
                F.col(f"{seg}_bal_cents"),
            )
        ],
    )


def _pivot_oracle() -> str:
    cells = []
    for seg in MKT_SEGMENTS:
        cells.append(
            f"CAST(count(*) FILTER (WHERE c_mktsegment = '{seg}') AS BIGINT)"
            f' AS "{seg}_cnt"'
        )
        cells.append(
            f"sum(round(c_acctbal*100)) FILTER (WHERE c_mktsegment = '{seg}')"
            f' AS "{seg}_bal_cents"'
        )
    cols = ",\n  ".join(cells)
    return (
        "SELECT n_name,\n  " + cols + "\n"
        "FROM customer JOIN nation ON c_nationkey = n_nationkey\n"
        "GROUP BY n_name"
    )


# --------------------------------------------------------------------------
# window functions — top-2 orders per customer (row_number over partition)
# --------------------------------------------------------------------------

def window_top2_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", _cents("o_totalprice").alias("price_cents")
    )
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("price_cents").desc(), F.col("o_orderkey")
    )
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 2)
        .select("o_custkey", "o_orderkey", "price_cents", F.col("rn").cast("long"))
    )


_WINDOW_ORACLE = """
SELECT o_custkey, o_orderkey, price_cents, CAST(rn AS BIGINT) AS rn FROM (
  SELECT o_custkey, o_orderkey, round(o_totalprice*100) AS price_cents,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY round(o_totalprice*100) DESC, o_orderkey)
         AS rn
  FROM orders
) WHERE rn <= 2
"""


# --------------------------------------------------------------------------
# rollup — hierarchical totals (SQL ROLLUP; reference only hand-builds
# cumulative rollups — this is the general operator)
# --------------------------------------------------------------------------

def rollup_order_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    base = (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .select("n_name", "o_orderpriority", _cents("o_totalprice").alias("pc"))
    )
    return base.rollup("n_name", "o_orderpriority").agg(
        F.sum("pc").alias("total_price_cents"),
        F.count(F.lit(1)).alias("n_orders"),
    )


_ROLLUP_ORACLE = """
SELECT n_name, o_orderpriority,
       sum(round(o_totalprice*100)) AS total_price_cents,
       CAST(count(*) AS BIGINT) AS n_orders
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY ROLLUP (n_name, o_orderpriority)
"""


# --------------------------------------------------------------------------
# distinct aggregation (absent from the reference — SURVEY §2.3 "not present")
# --------------------------------------------------------------------------

def distinct_users_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users"),
        F.count(F.lit(1)).alias("n_events"),
        F.sum(_cents("value")).alias("value_cents_total"),
    )


_DISTINCT_ORACLE = """
SELECT event_type,
  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
  CAST(count(*) AS BIGINT) AS n_events,
  sum(round(value*100)) AS value_cents_total
FROM events GROUP BY event_type
"""


# --------------------------------------------------------------------------
# anti join — customers with no orders
# --------------------------------------------------------------------------

def customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").select("o_custkey")
    return anti_join(cust, orders, on=[cust.c_custkey == orders.o_custkey]).select(
        "c_custkey", "c_name", _cents("c_acctbal").alias("acctbal_cents")
    )


_ANTI_ORACLE = """
SELECT c_custkey, c_name, round(c_acctbal*100) AS acctbal_cents
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
"""


# --------------------------------------------------------------------------
# set ops — EXCEPT / INTERSECT (absent from the reference)
# --------------------------------------------------------------------------

def users_error_no_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    err = ev.filter(F.col("event_type") == "error").select("user_id")
    buy = ev.filter(F.col("event_type") == "purchase").select("user_id")
    return err.subtract(buy)  # EXCEPT (distinct) semantics


_EXCEPT_ORACLE = """
SELECT user_id FROM events WHERE event_type = 'error'
EXCEPT
SELECT user_id FROM events WHERE event_type = 'purchase'
"""


def users_error_and_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    err = ev.filter(F.col("event_type") == "error").select("user_id")
    buy = ev.filter(F.col("event_type") == "purchase").select("user_id")
    return err.intersect(buy)


_INTERSECT_ORACLE = """
SELECT user_id FROM events WHERE event_type = 'error'
INTERSECT
SELECT user_id FROM events WHERE event_type = 'purchase'
"""


# --------------------------------------------------------------------------
# sessionization — gap-based sessions over the event stream (extension op)
# --------------------------------------------------------------------------

_GAP_US = 30 * 60 * 10**6  # 30 minutes in microseconds

# NOTE: time flows in integer MICROseconds ("ts div 1000" on the raw nanos
# int64) — DuckDB stores TIMESTAMP at µs precision, so µs is the finest
# granularity both engines agree on exactly.


def sessionization_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.expr("ts div 1000").alias("ts_us"), "event_id"
    )
    return session_stats(
        ev,
        key="user_id",
        ts_col="ts_us",
        gap=_GAP_US,
        order_cols=["event_id"],
        numeric_time=True,
    )


_SESSION_ORACLE = f"""
WITH ev AS (
  SELECT user_id, event_id, epoch_us(ts) AS ts_us FROM events
),
flagged AS (
  SELECT user_id, event_id, ts_us,
    CASE WHEN lag(ts_us) OVER w IS NULL
           OR ts_us - lag(ts_us) OVER w > {_GAP_US}
         THEN 1 ELSE 0 END AS is_new
  FROM ev
  WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
),
sessioned AS (
  SELECT user_id, ts_us,
    sum(is_new) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    AS session_id
  FROM flagged
),
per_session AS (
  SELECT user_id, session_id, count(*) AS n_events,
         max(ts_us) - min(ts_us) AS duration
  FROM sessioned GROUP BY user_id, session_id
)
SELECT user_id,
  CAST(count(*) AS BIGINT) AS n_sessions,
  CAST(sum(n_events) AS BIGINT) AS total_events,
  avg(n_events) AS avg_events_per_session,
  avg(duration) AS avg_session_duration
FROM per_session GROUP BY user_id
"""


# --------------------------------------------------------------------------
# as-of join — purchase→latest-preceding-click attribution (extension op)
# --------------------------------------------------------------------------

def asof_click_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "event_type",
        _cents("value").alias("value_cents"),
        F.expr("ts div 1000").alias("ts_us"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id",
        "user_id",
        F.col("value_cents").alias("purchase_value_cents"),
        "ts_us",
    )
    # deterministic tie rule: at equal ts, keep the click with max event_id
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts_us")
        .agg(F.expr("max_by(value_cents, event_id)").alias("click_value_cents"))
        .withColumn("click_ts_us", F.col("ts_us"))
    )
    return asof_join(
        purchases,
        clicks,
        on="user_id",
        left_time="ts_us",
        right_time="ts_us",
        value_cols=["click_value_cents", "click_ts_us"],
        suffix="",
    )


_ASOF_ORACLE = """
WITH ev AS (
  SELECT event_id, user_id, event_type, round(value*100) AS value_cents,
         epoch_us(ts) AS ts_us
  FROM events
),
p AS (
  SELECT event_id, user_id, value_cents AS purchase_value_cents, ts_us
  FROM ev WHERE event_type = 'purchase'
),
c AS (
  SELECT user_id, ts_us, max_by(value_cents, event_id) AS click_value_cents
  FROM ev WHERE event_type = 'click' GROUP BY user_id, ts_us
)
SELECT p.event_id, p.user_id, p.purchase_value_cents, p.ts_us,
       l.click_value_cents, l.click_ts_us
FROM p LEFT JOIN LATERAL (
  SELECT c.click_value_cents, c.ts_us AS click_ts_us
  FROM c
  WHERE c.user_id = p.user_id AND c.ts_us <= p.ts_us
  ORDER BY c.ts_us DESC LIMIT 1
) l ON true
"""


# --------------------------------------------------------------------------
# full outer join — two aggregate halves on a shared key (reference J2,
# impl/duckdb_pivot.py:105-110: keeps entities present in only one half)
# --------------------------------------------------------------------------

def full_outer_feature_halves(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", _cents("value").alias("vc")
    )
    errors = (
        ev.filter(F.col("event_type") == "error")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_errors"),
             F.sum("vc").alias("error_cents"))
    )
    buys = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_purchases"),
             F.sum("vc").alias("purchase_cents"))
    )
    return errors.join(buys, on="user_id", how="full")


_FULL_OUTER_ORACLE = """
WITH ev AS (
  SELECT user_id, event_type, round(value*100) AS vc FROM events
),
e AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS n_errors,
         sum(vc) AS error_cents
  FROM ev WHERE event_type = 'error' GROUP BY user_id
),
p AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS n_purchases,
         sum(vc) AS purchase_cents
  FROM ev WHERE event_type = 'purchase' GROUP BY user_id
)
SELECT coalesce(e.user_id, p.user_id) AS user_id,
       e.n_errors, e.error_cents, p.n_purchases, p.purchase_cents
FROM e FULL JOIN p ON e.user_id = p.user_id
"""


# --------------------------------------------------------------------------
# q6 — selective range-predicate aggregation (TPC-H Q6 shape): the
# predicate-pushdown showcase — every filter lands in PushedFilters
# --------------------------------------------------------------------------

def q6_revenue_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    d = (
        li.filter(
            (F.col("l_shipdate") >= _ts_ntz("1997-01-01"))
            & (F.col("l_shipdate") < _ts_ntz("1998-01-01"))
            & (F.col("l_quantity") < 24)
        )
        .select(
            _cents("l_extendedprice").alias("price_cents"),
            _pct("l_discount").alias("disc_pct"),
        )
        .filter((F.col("disc_pct") >= 5) & (F.col("disc_pct") <= 7))
    )
    return d.agg(
        F.sum(F.col("price_cents") * F.col("disc_pct")).alias("revenue_e4"),
        F.count(F.lit(1)).alias("n_items"),
    )


_Q6_ORACLE = """
WITH d AS (
  SELECT round(l_extendedprice*100) AS price_cents,
         round(l_discount*100) AS disc_pct
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
    AND l_shipdate < TIMESTAMP '1998-01-01'
    AND l_quantity < 24
)
SELECT sum(price_cents*disc_pct) AS revenue_e4,
       CAST(count(*) AS BIGINT) AS n_items
FROM d WHERE disc_pct BETWEEN 5 AND 7
"""


# --------------------------------------------------------------------------
# windowed event features — the Structured Streaming layer's aggregation,
# run in BATCH mode (Spark's unified semantics) so the DuckDB oracle
# verifies the exact window/agg logic the stream executes
# --------------------------------------------------------------------------

def windowed_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from feature_generation_benchmark_spark.sources.testdata import from_nanos
    from feature_generation_benchmark_spark.streaming.features import (
        windowed_event_features,
    )

    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        _cents("value").alias("value"),
        from_nanos("ts").alias("event_ts"),
    )
    out = windowed_event_features(
        ev,
        key="user_id",
        category="event_type",
        measure="value",
        ts_col="event_ts",
        window_duration="6 hours",
    )
    return out.select(
        F.unix_micros(F.col("win.start")).alias("win_start_us"),
        "user_id",
        "event_type",
        F.col("n_events").cast("long").alias("n_events"),
        "sum_value",
        "avg_value",
        "min_value",
        "max_value",
    )


_WINDOWED_EVENTS_ORACLE = """
WITH e AS (
  SELECT (epoch_ns(ts) // 21600000000000) * 21600000000 AS win_start_us,
         user_id, event_type, round(value*100) AS value
  FROM events
)
SELECT win_start_us, user_id, event_type,
  CAST(count(*) AS BIGINT) AS n_events,
  sum(value) AS sum_value,
  avg(value) AS avg_value,
  min(value) AS min_value,
  max(value) AS max_value
FROM e GROUP BY win_start_us, user_id, event_type
"""


# --------------------------------------------------------------------------
# semi-structured extraction — JSON props column (engine completeness;
# real event pipelines carry JSON payloads)
# --------------------------------------------------------------------------

def json_props_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    # avg computed as exact-integer sum / count (one double division) so
    # the value is bit-identical regardless of aggregation order — F.avg
    # over long sums doubles incrementally and drifts vs the oracle
    return ev.select("event_type", k.alias("k")).groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("k").alias("sum_k"),
        (F.sum("k").cast("double") / F.count("k")).alias("avg_k"),
        F.min("k").alias("min_k"),
        F.max("k").alias("max_k"),
    )


_JSON_ORACLE = """
WITH e AS (
  SELECT event_type, CAST(props->>'$.k' AS BIGINT) AS k FROM events
)
SELECT event_type,
  CAST(count(*) AS BIGINT) AS n_events,
  CAST(sum(k) AS BIGINT) AS sum_k,
  CAST(sum(k) AS DOUBLE) / count(k) AS avg_k,
  min(k) AS min_k,
  max(k) AS max_k
FROM e GROUP BY event_type
"""


# --------------------------------------------------------------------------
# approximate aggregation — HyperLogLog++ distinct + quantile sketch.
# Sketch internals are engine-specific (no bit-equal DuckDB twin possible)
# → rows-only driver check; accuracy vs the exact answers is asserted in
# tests/test_approx.py within published error bounds.
# --------------------------------------------------------------------------

def approx_users_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    # count/min/max ride in the SAME single-pass aggregate as the
    # sketches: exact scaffolding the gated registry form
    # (approx_users_per_type_raw) hashes cross-engine at zero extra
    # scans — the sketch estimates themselves stay engine-specific.
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.02).alias("n_users_approx"),
        F.percentile_approx(_cents("value"), 0.5, 10000).alias(
            "p50_value_cents"
        ),
        F.percentile_approx(_cents("value"), 0.99, 10000).alias(
            "p99_value_cents"
        ),
        F.count(F.lit(1)).alias("n_rows"),
        F.min(_cents("value")).alias("min_cents"),
        F.max(_cents("value")).alias("max_cents"),
    )


def approx_users_per_type_check(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Bound-gated verification form of :func:`approx_users_per_type`
    (the r6 schema_profile_approx pattern): HLL++ and GK-quantile values
    are engine-specific, so the served entry emits the exact distinct
    count plus bound flags — 6% (3×rsd) on the distinct estimate, and
    the ε-approximate-quantile rank definition for p50/p99 (count(< est)
    /n ≤ p+ε and count(≤ est)/n ≥ p−ε; ε = 0.001 ≫ the 1e-4 rank error
    of accuracy=10000). The DuckDB oracle emits the same exact counts
    and literal TRUEs, so the hash gates the bounds cross-engine.
    Exact distinct is a separate aggregate (the schema_profile_approx
    Expand trap); rank counts join the 5-row estimate dim broadcast."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", "user_id", _cents("value").alias("cents")
    )
    # lazy localCheckpoint (the kmeans idiom): est feeds BOTH the rank
    # join and the final projection — without the cut the full-scan
    # sketch aggregate runs twice per gate run (r6 session-3 review)
    est = (
        approx_users_per_type(spark, sf_dir)
        # prune the raw-gate scaffolding (n_rows/min/max): the rank join
        # computes its own n_rows and the duplicate name would be
        # ambiguous downstream
        .select(
            "event_type", "n_users_approx",
            "p50_value_cents", "p99_value_cents",
        )
        .localCheckpoint(eager=False)
    )
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users")
    )
    ranks = (
        ev.join(F.broadcast(est), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(
                (F.col("cents") < F.col("p50_value_cents")).cast("long")
            ).alias("lt50"),
            F.sum(
                (F.col("cents") <= F.col("p50_value_cents")).cast("long")
            ).alias("le50"),
            F.sum(
                (F.col("cents") < F.col("p99_value_cents")).cast("long")
            ).alias("lt99"),
            F.sum(
                (F.col("cents") <= F.col("p99_value_cents")).cast("long")
            ).alias("le99"),
        )
    )
    eps = 0.001

    def _within(lt, le, p):
        n = F.col("n_rows").cast("double")
        return (F.col(lt) / n <= p + eps) & (F.col(le) / n >= p - eps)

    return (
        exact.join(est, "event_type")
        .join(ranks, "event_type")
        .select(
            "event_type",
            "n_users",
            (
                F.abs(F.col("n_users_approx") - F.col("n_users"))
                <= F.greatest(
                    F.lit(1), (F.lit(0.06) * F.col("n_users")).cast("long")
                )
            ).alias("users_within_6pct"),
            _within("lt50", "le50", 0.5).alias("p50_within_rank"),
            _within("lt99", "le99", 0.99).alias("p99_within_rank"),
        )
        .orderBy("event_type")
    )


_APPROX_CHECK_ORACLE = """
SELECT event_type,
  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
  TRUE AS users_within_6pct,
  TRUE AS p50_within_rank,
  TRUE AS p99_within_rank
FROM events GROUP BY event_type ORDER BY event_type
"""


def approx_users_per_type_raw_gated(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Hash-gated form of the PRODUCTION sketch plan (r6 verdict #1 —
    zero ``no_oracle`` rows in the driver artifact): the plan is the
    identical ONE-pass groupBy aggregate as
    :func:`approx_users_per_type` (sketches + count/min/max in one map-
    combined agg — nothing added but projections), but the served
    columns are the exact scaffolding (n_rows, min/max cents — DuckDB
    recomputes them) plus in-plan sanity bounds on the engine-specific
    estimates: HLL++ distinct within [1, 1.1·n_rows], both quantile
    estimates inside [min, max], and p99 ≥ p50 (one GK summary answers
    both ranks, so monotonicity is a structural invariant). The TIGHT
    6%/rank-ε bound lives in the ``approx_users_per_type`` check twin,
    whose exact side costs a second scan this production entry must not
    pay."""
    est = approx_users_per_type(spark, sf_dir)
    slack = F.greatest(
        F.lit(1), (F.lit(0.1) * F.col("n_rows")).cast("long")
    )
    return est.select(
        "event_type",
        "n_rows",
        F.col("min_cents").cast("long").alias("min_cents"),
        F.col("max_cents").cast("long").alias("max_cents"),
        (
            (F.col("n_users_approx") >= 1)
            & (F.col("n_users_approx") <= F.col("n_rows") + slack)
        ).alias("users_est_sane"),
        F.col("p50_value_cents").between(
            F.col("min_cents"), F.col("max_cents")
        ).alias("p50_in_range"),
        F.col("p99_value_cents").between(
            F.col("min_cents"), F.col("max_cents")
        ).alias("p99_in_range"),
        (F.col("p99_value_cents") >= F.col("p50_value_cents")).alias(
            "p99_ge_p50"
        ),
    ).orderBy("event_type")


_APPROX_RAW_ORACLE = """
SELECT event_type,
  CAST(count(*) AS BIGINT) AS n_rows,
  CAST(min(round(value * 100)) AS BIGINT) AS min_cents,
  CAST(max(round(value * 100)) AS BIGINT) AS max_cents,
  TRUE AS users_est_sane,
  TRUE AS p50_in_range,
  TRUE AS p99_in_range,
  TRUE AS p99_ge_p50
FROM events GROUP BY event_type ORDER BY event_type
"""


# --------------------------------------------------------------------------
# incident windows — point-in-interval join (no equi-key) via time buckets
# --------------------------------------------------------------------------

_INCIDENT_WINDOW_US = 600_000_000  # 10 minutes


def incident_window_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each ``error`` event opens a 10-minute incident window
    ``[ts, ts+10min)``; report traffic landing inside each window.

    Exercises :func:`interval_join` — the bucketed equi-join rewrite of a
    theta join the reference has no counterpart for (its join surface is
    1-row-per-key equi-joins only, SURVEY §2.4)."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "event_type",
        _cents("value").alias("value_cents"),
        F.expr("ts div 1000").alias("ts_us"),
    )
    incidents = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("incident_id"),
        F.col("ts_us").alias("w_start"),
        (F.col("ts_us") + F.lit(_INCIDENT_WINDOW_US)).alias("w_end"),
    )
    joined = interval_join(
        ev.select("event_id", "user_id", "value_cents", "ts_us"),
        incidents,
        point_time="ts_us",
        start="w_start",
        end="w_end",
        bucket_width=_INCIDENT_WINDOW_US,
    )
    return joined.groupBy("incident_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        F.sum("value_cents").alias("sum_value_cents"),
    )


_INCIDENT_ORACLE = f"""
WITH ev AS (
  SELECT event_id, user_id, event_type,
         round(value*100) AS value_cents, epoch_us(ts) AS ts_us
  FROM events
), inc AS (
  SELECT event_id AS incident_id, ts_us AS w_start,
         ts_us + {_INCIDENT_WINDOW_US} AS w_end
  FROM ev WHERE event_type = 'error'
)
SELECT i.incident_id,
  CAST(count(*) AS BIGINT) AS n_events,
  CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_users,
  sum(e.value_cents) AS sum_value_cents
FROM inc i JOIN ev e ON e.ts_us >= i.w_start AND e.ts_us < i.w_end
GROUP BY i.incident_id
"""


QUERIES = [
    QueryDef("q1_pricing_summary", q1_pricing_summary, _Q1_ORACLE,
             "filtered grouped aggregation (TPC-H Q1 shape)"),
    QueryDef("q3_top_unshipped", q3_top_unshipped, _Q3_ORACLE,
             "3-way join + agg + deterministic top-k"),
    QueryDef("q5_region_revenue", q5_region_revenue, _Q5_ORACLE,
             "5-table join chain with broadcast dims"),
    QueryDef("pivot_segments_by_nation", pivot_segments_by_nation,
             _pivot_oracle(), "known-values pivot, 2 aggs"),
    QueryDef("window_top2_orders", window_top2_orders, _WINDOW_ORACLE,
             "row_number window, per-key top-k"),
    QueryDef("rollup_order_totals", rollup_order_totals, _ROLLUP_ORACLE,
             "SQL ROLLUP hierarchical totals"),
    QueryDef("distinct_users_per_type", distinct_users_per_type,
             _DISTINCT_ORACLE, "distinct aggregation"),
    QueryDef("customers_without_orders", customers_without_orders,
             _ANTI_ORACLE, "anti join"),
    QueryDef("users_error_no_purchase", users_error_no_purchase,
             _EXCEPT_ORACLE, "EXCEPT set op"),
    QueryDef("users_error_and_purchase", users_error_and_purchase,
             _INTERSECT_ORACLE, "INTERSECT set op"),
    QueryDef("sessionization_stats", sessionization_stats, _SESSION_ORACLE,
             "gap-based sessionization via window functions"),
    QueryDef("asof_click_attribution", asof_click_attribution, _ASOF_ORACLE,
             "as-of (backward) join via union+window"),
    QueryDef("full_outer_feature_halves", full_outer_feature_halves,
             _FULL_OUTER_ORACLE, "full outer join of aggregate halves (J2)"),
    QueryDef("q6_revenue_forecast", q6_revenue_forecast, _Q6_ORACLE,
             "selective range-predicate aggregation (pushdown showcase)"),
    QueryDef("windowed_events", windowed_events, _WINDOWED_EVENTS_ORACLE,
             "tumbling event-time window aggregation (streaming twin, batch)"),
    QueryDef("approx_users_per_type", approx_users_per_type_check,
             _APPROX_CHECK_ORACLE,
             "approximate aggregates (HLL++ distinct + GK quantiles), "
             "hash-gated on exact counts + error-bound flags",
             bench=False),
    # raw production plan stays served + benched under its own name,
    # now hash-gated on its exact scaffolding + in-plan sanity bounds
    # (r7: zero no_oracle rows; the tight bound gate is the check twin)
    QueryDef("approx_users_per_type_raw", approx_users_per_type_raw_gated,
             _APPROX_RAW_ORACLE,
             "HLL++ distinct + GK quantiles per event type (production "
             "single-pass sketch plan, hash-gated on exact count/min/max "
             "+ estimate sanity bounds)"),
    QueryDef("json_props_stats", json_props_stats, _JSON_ORACLE,
             "JSON payload extraction + aggregation"),
    QueryDef("incident_window_stats", incident_window_stats, _INCIDENT_ORACLE,
             "point-in-interval join (no equi-key) via time-bucket rewrite"),
]


# --------------------------------------------------------------------------
# q4-shaped — EXISTS semi-join with a cross-table date predicate (r3)
# --------------------------------------------------------------------------

def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders from 1996 having at least one line shipped > 90 days after
    the order date, counted by priority — the TPC-H q4 shape (EXISTS
    correlated on the fact table) adapted to this schema's columns. Plans
    as a LEFT SEMI join keyed on ``o_orderkey`` with the date comparison
    as a join residual: one shuffle pair, no row multiplication, which is
    exactly what you want the EXISTS to become at 100 TB."""
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts_ntz("1996-01-01"))
        & (F.col("o_orderdate") < _ts_ntz("1997-01-01"))
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_shipdate"
    )
    late = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > orders.o_orderdate + F.expr("INTERVAL 90 DAYS")),
        "leftsemi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


_Q4_ORACLE = """
SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders
FROM orders o
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1997-01-01'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY)
GROUP BY o_orderpriority
"""


# --------------------------------------------------------------------------
# q10-shaped — returned-item revenue top-k (multi-join + deterministic sort)
# --------------------------------------------------------------------------

def q10_returned_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top 20 customers by revenue on returned lines (l_returnflag = 'R'):
    fact-fact join shuffles once on orderkey; customer and nation ride in
    as broadcasts. Ties break on c_custkey for a deterministic limit."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    )
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .select(
            "c_custkey",
            "c_name",
            "n_name",
            (_cents("l_extendedprice") * (F.lit(100) - _pct("l_discount")))
            .alias("rev_e4"),
        )
    )
    agg = joined.groupBy("c_custkey", "c_name", "n_name").agg(
        F.sum("rev_e4").alias("revenue_e4"),
        F.count(F.lit(1)).alias("n_returned_lines"),
    )
    return agg.orderBy(
        F.col("revenue_e4").desc(), F.col("c_custkey")
    ).limit(20)


_Q10_ORACLE = """
SELECT c_custkey, c_name, n_name,
  sum(round(l_extendedprice*100)*(100-round(l_discount*100))) AS revenue_e4,
  CAST(count(*) AS BIGINT) AS n_returned_lines
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue_e4 DESC, c_custkey
LIMIT 20
"""

QUERIES.append(
    QueryDef(
        "q4_order_priority",
        q4_order_priority,
        _Q4_ORACLE,
        "EXISTS semi-join with cross-table date residual (TPC-H q4 shape)",
    )
)
QUERIES.append(
    QueryDef(
        "q10_returned_revenue",
        q10_returned_revenue,
        _Q10_ORACLE,
        "returned-item revenue top-k over a 4-table join (TPC-H q10 shape)",
    )
)


# --------------------------------------------------------------------------
# window-function breadth — lag / running sum / ntile / first-last /
# RANGE-frame rolling aggregate, all in one per-event projection (r2)
# --------------------------------------------------------------------------

def window_funcs_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per purchase event: previous-event delta (lag), running cumulative
    sum (ROWS frame), within-user quartile (ntile), first/last value over
    the whole partition, and a 1-hour RANGE-frame rolling sum/count on the
    microsecond timeline.

    One shuffle on ``user_id`` serves every window — all five frames share
    the partition key, so Spark evaluates them in a single Window exchange
    + sort (the shape to preserve at 100 TB: never give each frame its own
    partitioning). Ordering is (ts_us, event_id) — unique — so lag/ntile
    are deterministic; the RANGE frame orders by ts_us alone (frames over
    physical time include tied peers identically on both engines)."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    ).select(
        "user_id",
        "event_id",
        F.expr("ts div 1000").alias("ts_us"),
        _cents("value").alias("value_cents"),
    )
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    wcum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wfull = w.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    wrange = (
        Window.partitionBy("user_id")
        .orderBy("ts_us")
        .rangeBetween(-3_600_000_000, 0)
    )
    return ev.select(
        "user_id",
        "event_id",
        "ts_us",
        "value_cents",
        (F.col("value_cents") - F.lag("value_cents", 1).over(w)).alias(
            "delta_prev_cents"
        ),
        F.sum("value_cents").over(wcum).alias("running_sum_cents"),
        F.ntile(4).over(w).alias("quartile"),
        F.first("value_cents").over(wfull).alias("first_value_cents"),
        F.last("value_cents").over(wfull).alias("last_value_cents"),
        F.sum("value_cents").over(wrange).alias("rolling_1h_sum_cents"),
        F.count(F.lit(1)).over(wrange).alias("rolling_1h_n"),
    )


_WINDOW_FUNCS_ORACLE = """
WITH e AS (
  SELECT user_id, event_id, epoch_ns(ts) // 1000 AS ts_us,
         round(value*100) AS value_cents
  FROM events WHERE event_type = 'purchase'
)
SELECT user_id, event_id, ts_us, value_cents,
  value_cents - lag(value_cents, 1) OVER w AS delta_prev_cents,
  sum(value_cents) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_sum_cents,
  CAST(ntile(4) OVER w AS INT) AS quartile,
  first_value(value_cents) OVER wf AS first_value_cents,
  last_value(value_cents) OVER wf AS last_value_cents,
  sum(value_cents) OVER wr AS rolling_1h_sum_cents,
  CAST(count(*) OVER wr AS BIGINT) AS rolling_1h_n
FROM e
WINDOW
  w AS (PARTITION BY user_id ORDER BY ts_us, event_id),
  wf AS (PARTITION BY user_id ORDER BY ts_us, event_id
         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING),
  wr AS (PARTITION BY user_id ORDER BY ts_us
         RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
"""

QUERIES.append(
    QueryDef(
        "window_funcs_events",
        window_funcs_events,
        _WINDOW_FUNCS_ORACLE,
        "lag/ntile/first-last/ROWS-cumsum/RANGE-rolling in one window pass",
    )
)


# --------------------------------------------------------------------------
# skew-safe distinct count — two-phase COUNT(DISTINCT) rewrite (r2)
# --------------------------------------------------------------------------

def skew_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``distinct_users_per_type`` computed through the two-phase
    skew-safe rewrite (``operators/aggregates.py``): event_type is a
    genuinely hot grouping key (5 values over the whole corpus), the exact
    shape where a plain COUNT(DISTINCT) funnels every user_id of a type
    into one reducer. Result is identical to the plain form — the oracle
    is the plain SQL."""
    from feature_generation_benchmark_spark.operators.aggregates import (
        skew_safe_distinct_count,
    )
    ev = load_table(spark, sf_dir, "events")
    return skew_safe_distinct_count(
        ev, ["event_type"], "user_id", buckets=64, out_col="n_users"
    )


_SKEW_DISTINCT_ORACLE = """
SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
FROM events GROUP BY event_type
"""

QUERIES.append(
    QueryDef(
        "skew_distinct_users",
        skew_distinct_users,
        _SKEW_DISTINCT_ORACLE,
        "two-phase skew-safe COUNT(DISTINCT) over a hot grouping key",
    )
)


# --------------------------------------------------------------------------
# CUBE + grouping_id — all grouping-set combinations in one pass (r2)
# --------------------------------------------------------------------------

def cube_lineitem_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity/revenue totals over EVERY subset of (returnflag,
    linestatus) — CUBE plans one scan + one Expand×4 + one shuffle instead
    of four separate aggregations, and ``grouping_id`` disambiguates real
    NULL group values from the roll-up rows (the reason checking NULL-ness
    of the key columns is never enough)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        "l_linestatus",
        F.col("l_quantity").alias("qty"),
        _cents("l_extendedprice").alias("price_cents"),
    )
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.grouping_id().cast("long").alias("gid"),
        F.sum("qty").alias("sum_qty"),
        F.sum("price_cents").alias("sum_price_cents"),
        F.count(F.lit(1)).alias("n_lines"),
    )


_CUBE_ORACLE = """
SELECT l_returnflag, l_linestatus,
  CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS BIGINT)
    AS gid,
  sum(l_quantity) AS sum_qty,
  sum(round(l_extendedprice*100)) AS sum_price_cents,
  CAST(count(*) AS BIGINT) AS n_lines
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
"""

QUERIES.append(
    QueryDef(
        "cube_lineitem_stats",
        cube_lineitem_stats,
        _CUBE_ORACLE,
        "CUBE over (returnflag, linestatus) with grouping_id",
    )
)


# --------------------------------------------------------------------------
# unpivot — wide feature row → long (metric, value) pairs (r2)
# --------------------------------------------------------------------------

def unpivot_user_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide-to-long relayout of a per-user aggregate row — the inverse of
    the engine's pivot strategies, needed whenever a wide feature-store
    table feeds a long-format consumer (metric monitoring, sparse
    training formats). ``unpivot`` is a shuffle-free row-local Expand —
    rows multiply by the metric count but never leave their partition.
    All measures are integer-valued doubles so the long `value` column is
    exact."""
    ev = load_table(spark, sf_dir, "events")
    wide = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("double").alias("n_events"),
        F.sum(_cents("value")).alias("sum_value_cents"),
        F.max(_cents("value")).alias("max_value_cents"),
    )
    return wide.unpivot(
        ids=["user_id"],
        values=["n_events", "sum_value_cents", "max_value_cents"],
        variableColumnName="metric",
        valueColumnName="value",
    )


_UNPIVOT_ORACLE = """
WITH wide AS (
  SELECT user_id,
    CAST(count(*) AS DOUBLE) AS n_events,
    sum(round(value*100)) AS sum_value_cents,
    max(round(value*100)) AS max_value_cents
  FROM events GROUP BY user_id
)
SELECT user_id, 'n_events' AS metric, n_events AS value FROM wide
UNION ALL
SELECT user_id, 'sum_value_cents', sum_value_cents FROM wide
UNION ALL
SELECT user_id, 'max_value_cents', max_value_cents FROM wide
"""

QUERIES.append(
    QueryDef(
        "unpivot_user_metrics",
        unpivot_user_metrics,
        _UNPIVOT_ORACLE,
        "wide-to-long unpivot of per-user aggregates (row-local Expand)",
    )
)


# --------------------------------------------------------------------------
# VARIANT semi-structured path (Spark 4) — parse once, extract many (r2)
# --------------------------------------------------------------------------

def json_props_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``json_props_stats`` through the Spark 4 VARIANT type:
    ``parse_json`` decodes the payload ONCE into a binary-encoded variant
    and every extraction is a cheap path lookup — the modern replacement
    for N× ``get_json_object`` string re-parses (at 100 TB, parse cost is
    the whole query). Same output and same oracle as the string-path
    twin, which is the point: engine-internal representation, identical
    semantics."""
    ev = load_table(spark, sf_dir, "events")
    v = F.parse_json(F.col("props"))
    k = F.try_variant_get(v, "$.k", "long")
    return ev.select("event_type", k.alias("k")).groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("k").alias("sum_k"),
        (F.sum("k").cast("double") / F.count("k")).alias("avg_k"),
        F.min("k").alias("min_k"),
        F.max("k").alias("max_k"),
    )


QUERIES.append(
    QueryDef(
        "json_props_variant",
        json_props_variant,
        _JSON_ORACLE,
        "VARIANT parse-once semi-structured extraction (Spark 4)",
    )
)


# --------------------------------------------------------------------------
# built-in session_window — verified against first-principles islands (r2)
# --------------------------------------------------------------------------

#: Single source for BOTH the plan's session_window duration string
#: and the oracle's gap constant (r6 session-3 review: a hard-coded
#: '30 minutes' literal next to this constant could silently desync).
_SESSION_GAP_US = _GAP_US  # one 30-min gap rule for all 3 variants
_SESSION_GAP_STR = f"{_SESSION_GAP_US // 60_000_000} minutes"


def session_window_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user gap sessions via Spark's BUILT-IN ``session_window``
    (the streaming-capable operator), verified against the
    first-principles islands formulation in the oracle — same rule:
    events belong to one session iff consecutive gaps are < 30 min.
    Complements ``sessionization_stats`` (window-function islands) and
    ``stateful_sessionizer`` (applyInPandasWithState): three independent
    implementations of one semantics."""
    ev = load_table(spark, sf_dir, "events")
    ts = F.timestamp_micros(F.expr("ts div 1000"))
    out = (
        ev.select("user_id", ts.alias("ts"), _cents("value").alias("vc"))
        .groupBy(
            F.session_window("ts", _SESSION_GAP_STR).alias("sw"), F.col("user_id")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("vc").alias("sum_value_cents"),
        )
    )
    return out.select(
        "user_id",
        F.unix_micros(F.col("sw.start")).alias("session_start_us"),
        F.col("n_events").cast("long").alias("n_events"),
        "sum_value_cents",
    )


_SESSION_WINDOW_ORACLE = f"""
WITH e AS (
  SELECT user_id, epoch_ns(ts) // 1000 AS ts_us, round(value*100) AS vc
  FROM events
), flagged AS (
  SELECT *, CASE WHEN ts_us - lag(ts_us) OVER w >= {_SESSION_GAP_US}
                 THEN 1 ELSE 0 END AS new_s
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_us)
), sess AS (
  SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts_us
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM flagged
)
SELECT user_id, min(ts_us) AS session_start_us,
  CAST(count(*) AS BIGINT) AS n_events,
  sum(vc) AS sum_value_cents
FROM sess GROUP BY user_id, sid
"""

QUERIES.append(
    QueryDef(
        "session_window_stats",
        session_window_stats,
        _SESSION_WINDOW_ORACLE,
        "built-in session_window vs first-principles islands oracle",
    )
)


def grouping_sets_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arbitrary GROUPING SETS — ``((returnflag, linestatus),
    (linestatus), ())`` — the set list neither CUBE nor ROLLUP can
    express (it skips the ``(returnflag)`` level), via Spark 4's
    ``DataFrame.groupingSets``. Completes the multi-level-agg trio with
    :func:`cube_lineitem_stats` / ``rollup_order_totals``.

    Same single-scan plan family as CUBE: one Expand×|sets| + ONE
    shuffle (the expand multiplies rows map-side and the partial
    aggregate combines before the exchange), vs |sets| separate
    aggregations each re-scanning the fact table. ``grouping_id``
    disambiguates roll-up NULLs from genuine NULL key values."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        "l_linestatus",
        F.col("l_quantity").alias("qty"),
        _cents("l_extendedprice").alias("price_cents"),
    )
    return li.groupingSets(
        [["l_returnflag", "l_linestatus"], ["l_linestatus"], []],
        "l_returnflag",
        "l_linestatus",
    ).agg(
        F.grouping_id().cast("long").alias("gid"),
        F.sum("qty").alias("sum_qty"),
        F.sum("price_cents").alias("sum_price_cents"),
        F.count(F.lit(1)).alias("n_lines"),
    )


_GROUPING_SETS_ORACLE = """
SELECT l_returnflag, l_linestatus,
  CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS BIGINT)
    AS gid,
  sum(l_quantity) AS sum_qty,
  sum(round(l_extendedprice*100)) AS sum_price_cents,
  CAST(count(*) AS BIGINT) AS n_lines
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_linestatus), ())
"""

QUERIES.append(
    QueryDef(
        "grouping_sets_lineitem",
        grouping_sets_lineitem,
        _GROUPING_SETS_ORACLE,
        "arbitrary GROUPING SETS (not cube/rollup-expressible) in one "
        "Expand + one shuffle, grouping_id-disambiguated",
    )
)




def hll_users_sketch_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Re-aggregatable distinct-count sketches — the ONLY way distinct
    users roll up at 100 TB without re-scanning raw events: per
    (event_type, day) Apache DataSketches HLL sketches
    (``hll_sketch_agg`` — the storable pre-aggregate artifact), then a
    register-wise ``hll_union_agg`` merge to the per-type estimate.
    ``approx_users_per_type`` answers one fixed question in one pass;
    this materializes the day-grain sketch table any (type, day-range)
    distinct question can then be served from at sketch-table cost.

    Deterministic (rows-only driver check — DuckDB has no DataSketches
    twin): HLL register updates are idempotent maxes, so the sketch —
    and the estimate — is independent of row order and partitioning;
    ``test_hll_rollup_matches_single_pass`` pins the two-level merge to
    the one-level sketch exactly and within 5% of the exact count."""
    ev = load_table(spark, sf_dir, "events")
    # per-day row counts and per-day estimates ride in the same two
    # aggregates — exact scaffolding + union-monotonicity reference for
    # the gated registry form (hll_users_sketch_rollup_raw), zero extra
    # passes over either level.
    day_sketches = ev.groupBy(
        "event_type",
        F.expr(f"ts div {_NS_PER_DAY_HLL}").alias("day"),
    ).agg(
        F.hll_sketch_agg("user_id").alias("sk"),
        F.count(F.lit(1)).alias("day_rows"),
    )
    return day_sketches.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.round(F.hll_sketch_estimate(F.hll_union_agg("sk")))
        .cast("long")
        .alias("est_users"),
        F.sum("day_rows").alias("n_rows"),
        F.max(
            F.round(F.hll_sketch_estimate("sk")).cast("long")
        ).alias("max_day_est"),
    )


def hll_users_sketch_rollup_check(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Bound-gated verification form of :func:`hll_users_sketch_rollup`
    (the r6 schema_profile_approx pattern): DataSketches HLL estimates
    are engine-specific, so the served entry emits the exact per-type
    distinct count alongside the rolled-up sketch estimate's 5% bound
    flag; the DuckDB oracle emits the same exact counts and literal
    TRUE. Exact side is its OWN aggregate joined back on the 5-row
    type dimension — never mixed into the sketch aggregate (the
    multi-distinct Expand trap documented on schema_profile_approx)."""
    est = hll_users_sketch_rollup(spark, sf_dir)
    ev = load_table(spark, sf_dir, "events")
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users")
    )
    return (
        est.join(F.broadcast(exact), "event_type")
        .select(
            "event_type",
            "n_days",
            "n_users",
            (
                F.abs(F.col("est_users") - F.col("n_users"))
                <= F.greatest(
                    F.lit(1), (F.lit(0.05) * F.col("n_users")).cast("long")
                )
            ).alias("est_within_5pct"),
        )
        .orderBy("event_type")
    )


_HLL_CHECK_ORACLE = f"""
SELECT event_type,
  CAST(count(DISTINCT epoch_ns(ts) // {_NS_PER_DAY_HLL}) AS BIGINT)
    AS n_days,
  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
  TRUE AS est_within_5pct
FROM events GROUP BY event_type ORDER BY event_type
"""


def hll_users_sketch_rollup_raw_gated(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Hash-gated form of the PRODUCTION two-level sketch rollup (r6
    verdict #1): the plan is the identical day-sketch → union-merge
    pipeline of :func:`hll_users_sketch_rollup` (day row counts and
    per-day estimates fold into the same two aggregates), projected to
    the exact scaffolding (n_days, n_rows — DuckDB recomputes both)
    plus two in-plan invariants on the engine-specific estimate: the
    rolled-up estimate sits in [1, 1.1·n_rows], and union monotonicity —
    HLL registers are idempotent maxes, so the merged sketch dominates
    every day sketch register-wise and its estimate cannot fall below
    0.9× the largest day estimate (0.9 absorbs sparse/dense-mode bias
    switches). The TIGHT 5%-vs-exact bound lives in the
    ``hll_users_sketch_rollup`` check twin, whose exact countDistinct
    side this production entry must not pay."""
    m = hll_users_sketch_rollup(spark, sf_dir)
    slack = F.greatest(
        F.lit(1), (F.lit(0.1) * F.col("n_rows")).cast("long")
    )
    return m.select(
        "event_type",
        "n_days",
        "n_rows",
        (
            (F.col("est_users") >= 1)
            & (F.col("est_users") <= F.col("n_rows") + slack)
        ).alias("est_in_row_bound"),
        (
            F.col("est_users")
            >= (F.lit(0.9) * F.col("max_day_est")).cast("long")
        ).alias("est_ge_max_day"),
    ).orderBy("event_type")


_HLL_RAW_ORACLE = f"""
SELECT event_type,
  CAST(count(DISTINCT epoch_ns(ts) // {_NS_PER_DAY_HLL}) AS BIGINT)
    AS n_days,
  CAST(count(*) AS BIGINT) AS n_rows,
  TRUE AS est_in_row_bound,
  TRUE AS est_ge_max_day
FROM events GROUP BY event_type ORDER BY event_type
"""


QUERIES.append(
    # raw production sketch-rollup plan stays served + benched, now
    # hash-gated on exact scaffolding + in-plan union-monotonicity
    # bounds (r7: zero no_oracle rows; 5%-vs-exact gate is the twin)
    QueryDef(
        "hll_users_sketch_rollup_raw",
        hll_users_sketch_rollup_raw_gated,
        _HLL_RAW_ORACLE,
        "day-grain HLL sketch table merged to per-type distinct "
        "estimates (production re-aggregatable pre-agg plan, hash-gated "
        "on exact n_days/n_rows + estimate sanity/monotonicity bounds)",
    )
)
QUERIES.append(
    QueryDef(
        "hll_users_sketch_rollup",
        hll_users_sketch_rollup_check,
        _HLL_CHECK_ORACLE,
        "day-grain HLL sketch table merged to per-type distinct "
        "estimates, hash-gated on the 5% bound vs the exact count "
        "(storable re-aggregatable pre-agg pattern; sketch bits unpinned)",
        bench=False,
    )
)
