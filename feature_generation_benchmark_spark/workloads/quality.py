"""Data-quality expectations workload — a deequ/dbt-test-style constraint
report computed as Spark plans, emitted as one (check, n_checked,
violations, passed) table.

A training-data pipeline gates ingest on exactly these shapes: key
uniqueness, null rates, referential integrity, domain membership, range
bounds. Each check is a count aggregate or an anti-join — integers only,
so the DuckDB oracle is value-exact.

Scale posture: the single-table checks share one scan per table (one
aggregation computes several counts); referential integrity is a
broadcast/shuffle anti-join on the key — no check is more than one
shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from feature_generation_benchmark_spark.sources.testdata import load_table
from feature_generation_benchmark_spark.workloads import QueryDef

_EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def _stack_checks(agg_df: DataFrame, checks: list[tuple[str, str]]) -> DataFrame:
    """1-row aggregate frame → one (check, n_checked, violations, passed)
    row per listed (name, violations_col) — a row-local stack(), no
    driver round-trip (the whole report stays ONE lazy plan)."""
    parts = ", ".join(f"'{name}', `{col}`" for name, col in checks)
    return agg_df.select(
        F.expr(
            f"stack({len(checks)}, {parts}) AS (check, violations)"
        ),
        F.col("n").alias("n_checked"),
    ).select(
        "check",
        "n_checked",
        F.col("violations").cast("long").alias("violations"),
        (F.col("violations") == 0).alias("passed"),
    )


def dq_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    events = load_table(spark, sf_dir, "events")

    # orders: uniqueness, positivity, null-rate — ONE aggregation pass
    o = orders.agg(
        F.count(F.lit(1)).alias("n"),
        (F.count(F.lit(1)) - F.countDistinct("o_orderkey")).alias(
            "orders_key_unique"
        ),
        F.count(F.when(F.col("o_totalprice") <= 0, 1)).alias(
            "orders_price_positive"
        ),
        F.count(F.when(F.col("o_custkey").isNull(), 1)).alias(
            "orders_custkey_not_null"
        ),
    )
    # lineitem → orders referential integrity: one left join against the
    # DISTINCT key set (a duplicated target key must not multiply fact
    # rows — n_checked is the lineitem row count by contract)
    li = (
        lineitem.select("l_orderkey")
        .join(
            orders.select("o_orderkey").distinct(),
            F.col("l_orderkey") == F.col("o_orderkey"),
            "left",
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count(F.when(F.col("o_orderkey").isNull(), 1)).alias(
                "lineitem_fk_orders"
            ),
        )
    )
    # events: domain membership + value range — ONE aggregation pass
    e = events.agg(
        F.count(F.lit(1)).alias("n"),
        F.count(F.when(~F.col("event_type").isin(*_EVENT_TYPES), 1)).alias(
            "events_type_in_domain"
        ),
        F.count(
            F.when((F.col("value") < 0) | F.col("value").isNull(), 1)
        ).alias("events_value_in_range"),
    )

    report = _stack_checks(
        o,
        [
            ("orders_key_unique", "orders_key_unique"),
            ("orders_price_positive", "orders_price_positive"),
            ("orders_custkey_not_null", "orders_custkey_not_null"),
        ],
    )
    report = report.unionByName(
        _stack_checks(li, [("lineitem_fk_orders", "lineitem_fk_orders")])
    )
    return report.unionByName(
        _stack_checks(
            e,
            [
                ("events_type_in_domain", "events_type_in_domain"),
                ("events_value_in_range", "events_value_in_range"),
            ],
        )
    )


_DQ_ORACLE = f"""
WITH o AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT) AS dup_keys,
         CAST(count(*) FILTER (o_totalprice <= 0) AS BIGINT) AS nonpos,
         CAST(count(*) FILTER (o_custkey IS NULL) AS BIGINT) AS null_cust
  FROM orders
), li AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(count(*) FILTER (o_orderkey IS NULL) AS BIGINT) AS orphans
  FROM lineitem LEFT JOIN (SELECT DISTINCT o_orderkey FROM orders) o
    ON l_orderkey = o_orderkey
), e AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(count(*) FILTER (event_type NOT IN
              ({", ".join(f"'{t}'" for t in _EVENT_TYPES)})) AS BIGINT)
           AS bad_type,
         CAST(count(*) FILTER (value < 0 OR value IS NULL) AS BIGINT)
           AS bad_value
  FROM events
)
SELECT * FROM (
  SELECT 'orders_key_unique' AS check, n AS n_checked,
         dup_keys AS violations, dup_keys = 0 AS passed FROM o
  UNION ALL
  SELECT 'orders_price_positive', n, nonpos, nonpos = 0 FROM o
  UNION ALL
  SELECT 'orders_custkey_not_null', n, null_cust, null_cust = 0 FROM o
  UNION ALL
  SELECT 'lineitem_fk_orders', n, orphans, orphans = 0 FROM li
  UNION ALL
  SELECT 'events_type_in_domain', n, bad_type, bad_type = 0 FROM e
  UNION ALL
  SELECT 'events_value_in_range', n, bad_value, bad_value = 0 FROM e
)
"""


QUERIES = [
    QueryDef(
        "dq_expectations",
        dq_expectations,
        _DQ_ORACLE,
        "deequ-style constraint report: uniqueness, nulls, FK, domain, range",
    ),
]
