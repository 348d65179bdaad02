"""Join/subquery-breadth relational queries (TPC-H shapes q7..q22).

Round-2 extension widening the engine's verified join surface beyond the
reference's 1-row-per-key equi-joins (SURVEY §2.4): nation-pair fact-fact
joins, outer-join histograms, conditional ratios, distinct-count over
joins, grouped-HAVING semi-joins, disjunctive predicate pushdown,
multi-EXISTS decorrelation, and scalar-subquery anti-joins — each against
the driver's TPC-H-ish testdata schema (adapted where this schema lacks
TPC-H columns such as partsupp / commit dates) and each with a DuckDB
oracle twin.

Same numeric discipline as ``workloads/relational.py``: money flows as
integer-valued doubles (cents / cents×pct ``_e4``), so sums are exact in
any aggregation order and ratios are single IEEE divisions of identical
integers on both engines — bit-equal without rounding hacks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from feature_generation_benchmark_spark.sources.testdata import load_table
from feature_generation_benchmark_spark.workloads import QueryDef
from feature_generation_benchmark_spark.workloads.relational import (
    _cents,
    _pct,
    _ts_ntz,
)


def _rev_e4() -> "F.Column":
    """price_cents × (100 − disc_pct) as LONG — summed exactly at any
    scale. Double sums of integer-valued doubles lose exactness past
    2^53 (~sf4 for corpus-wide revenue totals; r6 session-3 review, the
    relational.py q1 discipline); aggregated outputs cast back to double
    so result schemas are unchanged, and a long sum raises loudly on
    int64 overflow (~sf2000) instead of drifting silently."""
    return (
        _cents("l_extendedprice") * (F.lit(100) - _pct("l_discount"))
    ).cast("long")


# --------------------------------------------------------------------------
# q7-shaped — nation-pair shipping volume (fact-fact join + two dim lanes)
# --------------------------------------------------------------------------

def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue shipped between (supplier nation → customer nation) pairs
    per year, ship years 1996–1997. The only shuffle is the
    lineitem↔orders join on orderkey; supplier, customer, and both nation
    copies ride in as broadcasts, so the plan stays one-shuffle at any
    corpus size (TPC-H q7 shape; no partsupp in this schema)."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts_ntz("1996-01-01"))
        & (F.col("l_shipdate") < _ts_ntz("1998-01-01"))
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        # customer is CORPUS-dim (~150k rows × sf): no explicit broadcast
        # hint — the 100× probe OOM'd the driver on forced corpus-dim
        # broadcasts (operators/dedup.py precedent); AQE broadcasts from
        # runtime stats while it fits (r6 session-3 review)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), supp.s_nationkey == n1.s_nk)
        .join(F.broadcast(n2), cust.c_nationkey == n2.c_nk)
        .select(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("l_year"),
            _rev_e4().alias("rev_e4"),
        )
    )
    return joined.groupBy("supp_nation", "cust_nation", "l_year").agg(
        F.sum("rev_e4").cast("double").alias("revenue_e4"),
        F.count(F.lit(1)).alias("n_lines"),
    )


_Q7_ORACLE = """
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
  CAST(year(l_shipdate) AS INT) AS l_year,
  CAST(sum(CAST(round(l_extendedprice*100) AS HUGEINT) * CAST(100 - round(l_discount*100) AS HUGEINT)) AS DOUBLE)
    AS revenue_e4,
  CAST(count(*) AS BIGINT) AS n_lines
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1998-01-01'
GROUP BY supp_nation, cust_nation, l_year
"""


# --------------------------------------------------------------------------
# q9-shaped — product-line profit by supplier nation and year
# --------------------------------------------------------------------------

def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Profit (revenue − retail-cost proxy; this schema has no
    ps_supplycost) for parts named like '%red%', grouped by supplier
    nation × ship year. The part filter broadcasts and prunes the fact
    scan's join early; all dims broadcast, zero fact-fact shuffles."""
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").contains("red")
    )
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    nation = load_table(spark, sf_dir, "nation")
    profit = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .select(
            F.col("n_name").alias("nation"),
            F.year("l_shipdate").alias("l_year"),
            (
                _rev_e4()
                - F.col("l_quantity").cast("long")
                * _cents("p_retailprice").cast("long")
                * F.lit(100)
            ).alias("profit_e4"),
        )
    )
    return profit.groupBy("nation", "l_year").agg(
        F.sum("profit_e4").cast("double").alias("profit_e4"),
        F.count(F.lit(1)).alias("n_lines"),
    )


_Q9_ORACLE = """
SELECT n_name AS nation, CAST(year(l_shipdate) AS INT) AS l_year,
  CAST(sum(CAST(round(l_extendedprice*100) AS HUGEINT) * CAST(100 - round(l_discount*100) AS HUGEINT)
      - CAST(l_quantity AS HUGEINT) * CAST(round(p_retailprice*100) AS HUGEINT)
        * 100) AS DOUBLE) AS profit_e4,
  CAST(count(*) AS BIGINT) AS n_lines
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
WHERE p_name LIKE '%red%'
GROUP BY 1, 2
"""


# --------------------------------------------------------------------------
# q13-shaped — customer order-count histogram (outer join + two-level agg)
# --------------------------------------------------------------------------

def q13_order_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution of customers by how many non-'4-NOT SPECIFIED' orders
    they placed, INCLUDING zero-order customers — the left outer join is
    the point (an inner join silently drops the c_count=0 bucket). Level 1
    shuffles on custkey; level 2 is a tiny agg on the ~dozens of distinct
    counts."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "4-NOT SPECIFIED"
    ).select("o_orderkey", "o_custkey")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        # count(col) counts non-null only → 0 for order-less customers
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(
        F.count(F.lit(1)).alias("custdist")
    )


_Q13_ORACLE = """
SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
FROM (
  SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
  FROM customer
  LEFT JOIN orders ON c_custkey = o_custkey
                  AND o_orderpriority <> '4-NOT SPECIFIED'
  GROUP BY c_custkey
)
GROUP BY c_count
"""


# --------------------------------------------------------------------------
# q14-shaped — promo revenue ratio (conditional aggregation over a join)
# --------------------------------------------------------------------------

def q14_promo_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Share of September-1997 revenue from PROMO-type parts. Both sums
    are exact integers; the ratio is ONE IEEE division of identical
    operands on both engines — bit-equal with no rounding step."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts_ntz("1997-09-01"))
        & (F.col("l_shipdate") < _ts_ntz("1997-10-01"))
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    j = li.join(F.broadcast(part), li.l_partkey == part.p_partkey).select(
        (F.col("p_type") == "PROMO").alias("is_promo"),
        _rev_e4().alias("rev_e4"),
    )
    agg = j.agg(
        F.sum(F.when(F.col("is_promo"), F.col("rev_e4")).otherwise(F.lit(0)))
        .cast("double")
        .alias("promo_rev_e4"),
        F.sum("rev_e4").cast("double").alias("total_rev_e4"),
    )
    return agg.select(
        "promo_rev_e4",
        "total_rev_e4",
        (F.col("promo_rev_e4") / F.col("total_rev_e4")).alias("promo_share"),
    )


_Q14_ORACLE = """
WITH a AS (
  SELECT
    CAST(sum(CASE WHEN p_type = 'PROMO'
        THEN CAST(round(l_extendedprice*100) AS HUGEINT) * CAST(100 - round(l_discount*100) AS HUGEINT)
        ELSE 0 END) AS DOUBLE) AS promo_rev_e4,
    CAST(sum(CAST(round(l_extendedprice*100) AS HUGEINT) * CAST(100 - round(l_discount*100) AS HUGEINT)) AS DOUBLE)
      AS total_rev_e4
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE l_shipdate >= TIMESTAMP '1997-09-01'
    AND l_shipdate <  TIMESTAMP '1997-10-01'
)
SELECT promo_rev_e4, total_rev_e4,
       promo_rev_e4 / total_rev_e4 AS promo_share
FROM a
"""


# --------------------------------------------------------------------------
# q15-shaped — top-revenue supplier(s) via scalar-subquery max
# --------------------------------------------------------------------------

def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers whose 1997-H1 revenue equals the global maximum. The
    scalar subquery becomes a 1-row broadcast joined against the per-
    supplier aggregate — the decorrelation Spark should pick at any scale
    (a global window max would funnel everything into one partition)."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts_ntz("1997-01-01"))
        & (F.col("l_shipdate") < _ts_ntz("1997-07-01"))
    )
    rev = li.groupBy("l_suppkey").agg(F.sum(_rev_e4()).alias("total_rev_e4"))
    mx = rev.agg(F.max("total_rev_e4").alias("max_rev_e4"))
    supp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name"
    )
    return (
        rev.join(F.broadcast(mx), rev.total_rev_e4 == mx.max_rev_e4)
        .join(F.broadcast(supp), rev.l_suppkey == supp.s_suppkey)
        .select(
            "s_suppkey",
            "s_name",
            F.col("total_rev_e4").cast("double").alias("total_rev_e4"),
        )
    )


_Q15_ORACLE = """
WITH rev AS (
  SELECT l_suppkey,
    sum(CAST(round(l_extendedprice*100) AS HUGEINT) * CAST(100 - round(l_discount*100) AS HUGEINT))
      AS total_rev_e4
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
    AND l_shipdate <  TIMESTAMP '1997-07-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, CAST(total_rev_e4 AS DOUBLE) AS total_rev_e4
FROM rev JOIN supplier ON l_suppkey = s_suppkey
WHERE total_rev_e4 = (SELECT max(total_rev_e4) FROM rev)
"""


# --------------------------------------------------------------------------
# q16-shaped — supplier variety per part profile (distinct agg over join)
# --------------------------------------------------------------------------

def q16_supplier_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct suppliers shipping each (brand, type, size) profile,
    excluding one brand and the PROMO line (supplier↔part association via
    lineitem; this schema has no partsupp). The distinct-agg shuffles
    (brand,type,size,suppkey) once, then a cheap second-level count."""
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#13")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 3, 9, 14, 19, 23, 36, 45)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey"
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


_Q16_ORACLE = """
SELECT p_brand, p_type, p_size,
  CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#13' AND p_type <> 'PROMO'
  AND p_size IN (1, 3, 9, 14, 19, 23, 36, 45)
GROUP BY p_brand, p_type, p_size
"""


# --------------------------------------------------------------------------
# q18-shaped — large-quantity orders (grouped HAVING driving a semi-join)
# --------------------------------------------------------------------------

_Q18_QTY = 250  # ≈ p99 of per-order quantity in the testdata


def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders whose total quantity exceeds a threshold, with customer
    context. The HAVING aggregate doubles as the semi-join: aggregate
    lineitem once on orderkey, filter, then join orders + broadcast
    customer against the (small) surviving set — never materializing the
    unfiltered order×line join."""
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > _Q18_QTY)
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", _cents("o_totalprice")
        .alias("o_totalprice_cents")
    )
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name"
    )
    return (
        orders.join(big, orders.o_orderkey == big.l_orderkey)
        # customer is CORPUS-dim: no explicit broadcast hint (see q7 note)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            # timestampdiff on NTZ operands is timezone-free — identical
            # under any session timeZone (unix_micros rejects NTZ)
            F.expr(
                "timestampdiff(MICROSECOND, "
                "TIMESTAMP_NTZ '1970-01-01 00:00:00', o_orderdate)"
            ).alias("o_orderdate_us"),
            "o_totalprice_cents",
            "total_qty",
        )
    )


_Q18_ORACLE = f"""
SELECT c_custkey, c_name, o_orderkey,
  epoch_us(o_orderdate) AS o_orderdate_us,
  round(o_totalprice*100) AS o_totalprice_cents,
  total_qty
FROM (
  SELECT l_orderkey, sum(l_quantity) AS total_qty
  FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > {_Q18_QTY}
)
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
"""


# --------------------------------------------------------------------------
# q19-shaped — disjunctive predicate revenue (OR-of-ANDs pushdown)
# --------------------------------------------------------------------------

def q19_disjunct_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue under an OR of three (brand, size-range, qty-range)
    conjuncts. Catalyst extracts the common sub-predicates and pushes the
    part-side disjunction below the broadcast join, so the fact scan only
    pays the join for candidate parts."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_brand", "p_size"
    )
    j = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    cond = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 5)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#24")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return j.filter(cond).agg(
        F.sum(_rev_e4()).cast("double").alias("revenue_e4"),
        F.count(F.lit(1)).alias("n_lines"),
    )


_Q19_ORACLE = """
SELECT
  CAST(sum(CAST(round(l_extendedprice*100) AS HUGEINT) * CAST(100 - round(l_discount*100) AS HUGEINT)) AS DOUBLE)
    AS revenue_e4,
  CAST(count(*) AS BIGINT) AS n_lines
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
       AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
       AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#24' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 20 AND 30)
"""


# --------------------------------------------------------------------------
# q21-shaped — solely-blamed suppliers (multi-EXISTS decorrelated)
# --------------------------------------------------------------------------

def q21_blamed_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers who were the ONLY supplier with returned lines on
    multi-supplier orders (adapted q21: 'R' return flags stand in for the
    missing commit/receipt dates). The EXISTS ('another supplier shipped
    in o') and NOT EXISTS ('another supplier had returns in o') pair
    decorrelates into aggregation over orderkey instead of two extra
    self-joins of the fact table. Formulated as TWO stacked aggregations —
    (orderkey, suppkey) dedup first, then plain counts per orderkey —
    rather than a double COUNT(DISTINCT) in one agg: the latter plans an
    Expand that replicates every fact row per distinct clause (~1.7×
    slower measured at sf0.1, and the multiplier rides to 100 TB), while
    the stacked form collapses map-side at both levels."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_returnflag"
    )
    pairs = li.groupBy("l_orderkey", "l_suppkey").agg(
        F.max((F.col("l_returnflag") == "R").cast("int")).alias("has_r")
    )
    per_order = pairs.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_supp"),
        F.sum("has_r").alias("n_r_supp"),
        F.max(F.when(F.col("has_r") == 1, F.col("l_suppkey"))).alias(
            "r_supp"
        ),
    )
    blamed = per_order.filter(
        (F.col("n_supp") > 1) & (F.col("n_r_supp") == 1)
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name"
    )
    agg = (
        blamed.groupBy("r_supp")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .join(F.broadcast(supp), F.col("r_supp") == supp.s_suppkey)
        .select("s_suppkey", "s_name", "numwait")
    )
    return agg.orderBy(F.col("numwait").desc(), F.col("s_suppkey")).limit(20)


_Q21_ORACLE = """
WITH per_order AS (
  SELECT l_orderkey,
    count(DISTINCT l_suppkey) AS n_supp,
    count(DISTINCT CASE WHEN l_returnflag = 'R' THEN l_suppkey END)
      AS n_r_supp,
    max(CASE WHEN l_returnflag = 'R' THEN l_suppkey END) AS r_supp
  FROM lineitem GROUP BY l_orderkey
)
SELECT s_suppkey, s_name, CAST(count(*) AS BIGINT) AS numwait
FROM per_order JOIN supplier ON r_supp = s_suppkey
WHERE n_supp > 1 AND n_r_supp = 1
GROUP BY s_suppkey, s_name
ORDER BY numwait DESC, s_suppkey
LIMIT 20
"""


# --------------------------------------------------------------------------
# q22-shaped — dormant high-balance customers (scalar subquery + anti-join)
# --------------------------------------------------------------------------

def q22_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with above-average positive balance and no orders since
    2000-01-01, summarized per nation. The global average is an exact
    sum-of-cents ÷ count (bit-equal across engines and aggregation
    orders), broadcast as one row; the 'no recent orders' NOT EXISTS is a
    left-anti join on custkey."""
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", _cents("c_acctbal").alias("bal_cents")
    )
    avg_bal = cust.filter(F.col("bal_cents") > 0).agg(
        (F.sum("bal_cents") / F.count("bal_cents")).alias("avg_bal_cents")
    )
    recent = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= _ts_ntz("2000-01-01")
    ).select("o_custkey")
    rich = cust.join(
        F.broadcast(avg_bal), cust.bal_cents > F.col("avg_bal_cents")
    )
    dormant = rich.join(
        recent, rich.c_custkey == recent.o_custkey, "left_anti"
    )
    return dormant.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("numcust"),
        F.sum("bal_cents").alias("totacctbal_cents"),
    )


_Q22_ORACLE = """
WITH c AS (
  SELECT c_custkey, c_nationkey, round(c_acctbal*100) AS bal_cents
  FROM customer
), avg_bal AS (
  SELECT sum(bal_cents) / count(bal_cents) AS avg_bal_cents
  FROM c WHERE bal_cents > 0
)
SELECT c_nationkey, CAST(count(*) AS BIGINT) AS numcust,
  sum(bal_cents) AS totacctbal_cents
FROM c, avg_bal
WHERE bal_cents > avg_bal_cents
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '2000-01-01')
GROUP BY c_nationkey
"""


QUERIES = [
    QueryDef("q7_nation_volume", q7_nation_volume, _Q7_ORACLE,
             "nation-pair volume: fact-fact join + 4 broadcast dims"),
    QueryDef("q9_product_profit", q9_product_profit, _Q9_ORACLE,
             "product profit: LIKE-filtered dim prunes fact early"),
    QueryDef("q13_order_histogram", q13_order_histogram, _Q13_ORACLE,
             "outer-join order-count histogram incl. zero bucket"),
    QueryDef("q14_promo_ratio", q14_promo_ratio, _Q14_ORACLE,
             "conditional-aggregation revenue ratio, bit-exact division"),
    QueryDef("q15_top_supplier", q15_top_supplier, _Q15_ORACLE,
             "scalar-subquery max as 1-row broadcast join"),
    QueryDef("q16_supplier_variety", q16_supplier_variety, _Q16_ORACLE,
             "distinct-count over join with NOT-IN style dim filters"),
    QueryDef("q18_large_orders", q18_large_orders, _Q18_ORACLE,
             "grouped-HAVING semi-join for large-quantity orders"),
    QueryDef("q19_disjunct_revenue", q19_disjunct_revenue, _Q19_ORACLE,
             "OR-of-ANDs disjunctive predicate pushdown"),
    QueryDef("q21_blamed_suppliers", q21_blamed_suppliers, _Q21_ORACLE,
             "multi-EXISTS decorrelated to one orderkey aggregation"),
    QueryDef("q22_dormant_customers", q22_dormant_customers, _Q22_ORACLE,
             "scalar-subquery threshold + left-anti dormancy join"),
]


# --------------------------------------------------------------------------
# q2-shaped — cheapest supplier per part (argmin via min(struct))
# --------------------------------------------------------------------------

def q2_cheapest_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For each size-15 STANDARD part: the supplier offering the lowest
    observed unit price (ties → lowest suppkey). The correlated
    ``WHERE price = (SELECT min(price) …)`` decorrelates into ONE
    ``min(struct(price, supplier))`` aggregation — no join-back to a
    per-group subquery, no second pass over offers, deterministic under
    ties. Unit price is exact: cents × 1000 over integral quantities."""
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_size") == 15) & (F.col("p_type") == "STANDARD")
    ).select("p_partkey", "p_name")
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_quantity") > 0
    )
    # integer unit price: cents*1000 per unit, floor — exact on both engines
    unit_e5 = F.expr(
        "CAST(round(l_extendedprice*100) * 1000 AS BIGINT)"
        " div CAST(l_quantity AS BIGINT)"
    )
    offers = li.join(F.broadcast(part), li.l_partkey == part.p_partkey).select(
        "p_partkey", "p_name", unit_e5.alias("unit_e5"), "l_suppkey"
    )
    best = offers.groupBy("p_partkey", "p_name").agg(
        F.min(F.struct("unit_e5", "l_suppkey")).alias("b")
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", _cents("s_acctbal").alias("s_acctbal_cents")
    )
    return best.select(
        "p_partkey",
        "p_name",
        F.col("b.unit_e5").alias("min_unit_price_e5"),
        F.col("b.l_suppkey").alias("s_suppkey"),
    ).join(F.broadcast(supp), "s_suppkey").select(
        "p_partkey", "p_name", "min_unit_price_e5",
        "s_suppkey", "s_name", "s_acctbal_cents",
    )


_Q2_ORACLE = """
WITH offers AS (
  SELECT p_partkey, p_name,
         CAST(round(l_extendedprice*100) * 1000 AS BIGINT)
           // CAST(l_quantity AS BIGINT) AS unit_e5,
         l_suppkey
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_size = 15 AND p_type = 'STANDARD' AND l_quantity > 0
), best AS (
  SELECT p_partkey, p_name, unit_e5 AS min_unit_price_e5,
         l_suppkey AS s_suppkey
  FROM (SELECT *, row_number() OVER (PARTITION BY p_partkey
          ORDER BY unit_e5, l_suppkey) AS rk FROM offers)
  WHERE rk = 1
)
SELECT p_partkey, p_name, min_unit_price_e5,
       s_suppkey, s_name, round(s_acctbal*100) AS s_acctbal_cents
FROM best JOIN supplier USING (s_suppkey)
"""


# --------------------------------------------------------------------------
# q8-shaped — market share of one nation inside a region, per year
# --------------------------------------------------------------------------

def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Share of AMERICA-region customers' STANDARD-part revenue supplied
    by nation #3, per order year. Conditional-sum ratio over a 6-table
    join; both sums exact ints, the share one IEEE division."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_type") == "STANDARD"
    ).select("p_partkey")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", F.year("o_orderdate").alias("o_year")
    )
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(
        F.col("r_name") == "AMERICA"
    )
    cust_in_region = (
        cust.join(
            F.broadcast(
                nation.join(
                    F.broadcast(region),
                    nation.n_regionkey == region.r_regionkey,
                ).select("n_nationkey")
            ),
            cust.c_nationkey == F.col("n_nationkey"),
        ).select("c_custkey")
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    j = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        # customer-in-region is CORPUS-dim: no explicit broadcast hint
        # (see q7 note) — AQE decides from runtime stats
        .join(cust_in_region, orders.o_custkey == F.col("c_custkey"))
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .select(
            "o_year",
            _rev_e4().alias("rev_e4"),
            (F.col("s_nationkey") == 3).alias("is_target"),
        )
    )
    agg = j.groupBy("o_year").agg(
        F.sum(F.when(F.col("is_target"), F.col("rev_e4")).otherwise(F.lit(0)))
        .cast("double")
        .alias("target_rev_e4"),
        F.sum("rev_e4").cast("double").alias("total_rev_e4"),
    )
    return agg.select(
        "o_year",
        "target_rev_e4",
        "total_rev_e4",
        (F.col("target_rev_e4") / F.col("total_rev_e4")).alias("mkt_share"),
    )


_Q8_ORACLE = """
WITH j AS (
  SELECT CAST(year(o_orderdate) AS INT) AS o_year,
         CAST(round(l_extendedprice*100) AS HUGEINT) * CAST(100 - round(l_discount*100) AS HUGEINT) AS rev_e4,
         (s_nationkey = 3) AS is_target
  FROM lineitem
  JOIN part     ON l_partkey = p_partkey
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation   ON c_nationkey = n_nationkey
  JOIN region   ON n_regionkey = r_regionkey
  JOIN supplier ON l_suppkey = s_suppkey
  WHERE p_type = 'STANDARD' AND r_name = 'AMERICA'
)
SELECT o_year,
  CAST(sum(CASE WHEN is_target THEN rev_e4 ELSE 0 END) AS DOUBLE)
    AS target_rev_e4,
  CAST(sum(rev_e4) AS DOUBLE) AS total_rev_e4,
  CAST(sum(CASE WHEN is_target THEN rev_e4 ELSE 0 END) AS DOUBLE)
    / CAST(sum(rev_e4) AS DOUBLE)
    AS mkt_share
FROM j GROUP BY o_year
"""


# --------------------------------------------------------------------------
# q11-shaped — important inventory: group value above a global fraction
# --------------------------------------------------------------------------

def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parts whose total traded value exceeds 0.05% of ALL traded value —
    group sums compared against a scalar-subquery threshold, which plans
    as a 1-row broadcast over the (already tiny) per-part aggregate.
    Threshold arithmetic in exact ints: value×10000 > total."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", _rev_e4().alias("rev_e4")
    )
    per_part = li.groupBy("l_partkey").agg(F.sum("rev_e4").alias("value_e4"))
    total = per_part.agg(F.sum("value_e4").alias("total_e4"))
    # threshold arithmetic in decimal: value_e4 × 10000 passes int64 at
    # scale (ANSI would raise); decimal keeps the comparison exact
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(
            F.col("value_e4").cast("decimal(38,0)") * 10000
            > F.col("total_e4").cast("decimal(38,0)") * 5
        )
        .select(
            "l_partkey", F.col("value_e4").cast("double").alias("value_e4")
        )
    )


_Q11_ORACLE = """
WITH per_part AS (
  SELECT l_partkey,
    sum(CAST(round(l_extendedprice*100) AS HUGEINT) * CAST(100 - round(l_discount*100) AS HUGEINT))
      AS value_e4
  FROM lineitem GROUP BY l_partkey
)
SELECT l_partkey, CAST(value_e4 AS DOUBLE) AS value_e4
FROM per_part
WHERE value_e4 * 10000 > (SELECT sum(value_e4) * 5 FROM per_part)
"""


# --------------------------------------------------------------------------
# q17-shaped — small-quantity outliers vs per-part average (correlated avg)
# --------------------------------------------------------------------------

def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue from Brand#23 lines whose quantity is below 20% of that
    part's average quantity. The correlated ``(SELECT 0.2*avg(qty) WHERE
    same part)`` decorrelates into a per-part aggregate joined back —
    threshold kept exact by comparing ``qty × 5 × count < sum`` (pure
    integer cross-multiplication, no float avg)."""
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_brand") == "Brand#23"
    ).select("p_partkey")
    li = load_table(spark, sf_dir, "lineitem")
    brand_lines = li.join(
        F.broadcast(part), li.l_partkey == part.p_partkey
    ).select("p_partkey", "l_quantity", _cents("l_extendedprice").alias("pc"))
    per_part = brand_lines.groupBy("p_partkey").agg(
        F.sum("l_quantity").alias("sum_qty"),
        F.count(F.lit(1)).alias("n_lines"),
    )
    j = brand_lines.join(F.broadcast(per_part), "p_partkey").filter(
        F.col("l_quantity") * 5 * F.col("n_lines") < F.col("sum_qty")
    )
    return j.agg(
        F.sum("pc").alias("small_qty_revenue_cents"),
        F.count(F.lit(1)).alias("n_small_lines"),
    )


_Q17_ORACLE = """
WITH brand_lines AS (
  SELECT p_partkey, l_quantity, round(l_extendedprice*100) AS pc
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_brand = 'Brand#23'
), per_part AS (
  SELECT p_partkey, sum(l_quantity) AS sum_qty,
         CAST(count(*) AS BIGINT) AS n_lines
  FROM brand_lines GROUP BY p_partkey
)
SELECT sum(pc) AS small_qty_revenue_cents,
  CAST(count(*) AS BIGINT) AS n_small_lines
FROM brand_lines JOIN per_part USING (p_partkey)
WHERE l_quantity * 5 * n_lines < sum_qty
"""


# --------------------------------------------------------------------------
# q20-shaped — suppliers of heavily-shipped promo parts (nested semi-joins)
# --------------------------------------------------------------------------

def q20_heavy_promo_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers who shipped more than 40 units of at least one PROMO
    part in 1997 — q20's nested-IN chain (supplier IN (… part IN (…)))
    as two stacked semi-join-producing aggregates instead of correlated
    subqueries; the final supplier projection is a semi join so no row
    multiplication ever happens."""
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_type") == "PROMO"
    ).select("p_partkey")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts_ntz("1997-01-01"))
        & (F.col("l_shipdate") < _ts_ntz("1998-01-01"))
    )
    shipped = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 40)
        .select("l_suppkey")
        .distinct()
    )
    supp = load_table(spark, sf_dir, "supplier")
    return supp.join(
        shipped, supp.s_suppkey == shipped.l_suppkey, "leftsemi"
    ).select("s_suppkey", "s_name", "s_nationkey")


_Q20_ORACLE = """
SELECT s_suppkey, s_name, s_nationkey
FROM supplier
WHERE s_suppkey IN (
  SELECT l_suppkey FROM lineitem
  WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_type = 'PROMO')
    AND l_shipdate >= TIMESTAMP '1997-01-01'
    AND l_shipdate <  TIMESTAMP '1998-01-01'
  GROUP BY l_suppkey, l_partkey
  HAVING sum(l_quantity) > 40
)
"""


QUERIES += [
    QueryDef("q2_cheapest_supplier", q2_cheapest_supplier, _Q2_ORACLE,
             "argmin-per-group via min(struct) instead of correlated min"),
    QueryDef("q8_market_share", q8_market_share, _Q8_ORACLE,
             "market-share ratio over a 6-table join, bit-exact division"),
    QueryDef("q11_important_stock", q11_important_stock, _Q11_ORACLE,
             "global-fraction threshold as integer cross-multiplication"),
    QueryDef("q17_small_quantity_revenue", q17_small_quantity_revenue,
             _Q17_ORACLE,
             "correlated-avg threshold decorrelated, integer compare"),
    QueryDef("q20_heavy_promo_suppliers", q20_heavy_promo_suppliers,
             _Q20_ORACLE, "nested-IN chain as stacked semi-joins"),
]


# --------------------------------------------------------------------------
# q12-shaped — priority mix per line status (join + conditional counts)
# --------------------------------------------------------------------------

def q12_priority_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1997 shipments: per line status (standing in for the schema's
    missing l_shipmode), how many belong to critical-priority orders vs
    not — q12's join + CASE-sum shape. Completes the adapted q1–q22
    ladder: every TPC-H query shape now has an oracle-checked twin here."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts_ntz("1997-01-01"))
        & (F.col("l_shipdate") < _ts_ntz("1998-01-01"))
    ).select("l_orderkey", "l_linestatus")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH").alias("critical"),
    )
    j = li.join(orders, li.l_orderkey == orders.o_orderkey)
    return j.groupBy("l_linestatus").agg(
        F.sum(F.when(F.col("critical"), 1).otherwise(0))
        .cast("long").alias("high_line_count"),
        F.sum(F.when(F.col("critical"), 0).otherwise(1))
        .cast("long").alias("low_line_count"),
    )


_Q12_ORACLE = """
SELECT l_linestatus,
  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate <  TIMESTAMP '1998-01-01'
GROUP BY l_linestatus
"""

QUERIES.append(
    QueryDef("q12_priority_mix", q12_priority_mix, _Q12_ORACLE,
             "join + conditional counts (completes the q1-q22 ladder)"),
)


def price_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D Pareto frontier ("skyline") of orders per market segment:
    the record-setting (earliest-date, lowest-price) points — an order
    day is on the skyline iff its cheapest order undercuts every
    earlier day's minimum. Dominance analytics without the classic
    O(n²) dominance self-join.

    Plan: (segment, day)-keyed min agg (map-side combining — the only
    full-data exchange), then a segment-keyed cumulative-min window
    over the bounded (segment × day) table; the filter is row-local.
    Integer day/cents arithmetic throughout.

    Output: (segment, day, day_min_cents) — the strictly-decreasing
    minima sequence per segment.
    """
    from pyspark.sql import Window

    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", F.col("c_mktsegment").alias("segment")
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.datediff(
            F.col("o_orderdate").cast("date"),
            F.lit("1970-01-01").cast("date"),
        ).cast("long").alias("day"),
        _cents("o_totalprice").cast("long").alias("cents"),
    )
    daily = (
        orders.join(cust, orders["o_custkey"] == cust["c_custkey"])
        .groupBy("segment", "day")
        .agg(F.min("cents").alias("day_min_cents"))
    )
    w = (
        Window.partitionBy("segment")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        daily.withColumn("prior_min", F.min("day_min_cents").over(w))
        .filter(
            F.col("prior_min").isNull()
            | (F.col("day_min_cents") < F.col("prior_min"))
        )
        .select("segment", "day", "day_min_cents")
    )


_SKYLINE_ORACLE = """
WITH daily AS (
  SELECT c_mktsegment AS segment,
         CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT)
           AS day,
         CAST(min(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS day_min_cents
  FROM orders JOIN customer ON o_custkey = c_custkey
  GROUP BY 1, 2
),
m AS (
  SELECT *, min(day_min_cents) OVER (
    PARTITION BY segment ORDER BY day
    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prior_min
  FROM daily
)
SELECT segment, day, day_min_cents FROM m
WHERE prior_min IS NULL OR day_min_cents < prior_min
"""

QUERIES.append(
    QueryDef(
        "price_skyline",
        price_skyline,
        _SKYLINE_ORACLE,
        "per-segment Pareto frontier (date, price) via cumulative-min "
        "window — no dominance self-join",
    )
)


def gini_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue-concentration Gini coefficient per market segment — the
    inequality statistic as an EXACT integer decomposition: with order
    prices in cents sorted ascending and ranked 1..n per segment,
    G = 2·Σ(i·xᵢ)/(n·Σxᵢ) − (n+1)/n. The two sums are exact int64
    aggregates; G is one closed-form double expression over them
    (identical on both engines — the zipf_fit/winsorized convention).

    Rank ties are impossible (ordered by (cents, o_orderkey)); ties in
    cents get arbitrary-but-deterministic consecutive ranks, which the
    Gini sum is invariant to (equal x under consecutive i contribute the
    same Σi·x regardless of ordering among themselves).

    Magnitude bound: Σ(i·xᵢ) ≲ n²·x̄ ≈ 1.4e18 at sf1 per segment —
    inside int64 through the tested ladder; beyond that, pre-scale
    cents to dollars (the sums are what must stay exact, G is scale-
    invariant in x).

    Plan: one segment-keyed sort window for ranks over the joined
    orders (broadcast customer dim), then a 5-row rollup.
    """
    from pyspark.sql import Window

    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", F.col("c_mktsegment").alias("segment")
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        _cents("o_totalprice").cast("long").alias("cents"),
    )
    w = Window.partitionBy("segment").orderBy("cents", "o_orderkey")
    ranked = (
        # customer is CORPUS-dim: no explicit broadcast hint (see q7 note)
        orders.join(cust, orders["o_custkey"] == cust["c_custkey"])
        .select("segment", "cents", F.row_number().over(w).alias("i"))
    )
    s = ranked.groupBy("segment").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("cents").alias("s"),
        F.sum(F.col("i") * F.col("cents")).alias("t"),
    )
    return s.select(
        "segment",
        F.col("n").alias("n_orders"),
        (
            F.lit(2.0) * F.col("t") / (F.col("n") * F.col("s").cast("double"))
            - (F.col("n") + F.lit(1)).cast("double") / F.col("n")
        ).alias("gini"),
    )


_GINI_ORACLE = """
WITH ranked AS (
  SELECT c_mktsegment AS segment,
         CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
         row_number() OVER (
           PARTITION BY c_mktsegment
           ORDER BY CAST(round(o_totalprice * 100) AS BIGINT), o_orderkey
         ) AS i
  FROM orders JOIN customer ON o_custkey = c_custkey
),
s AS (
  SELECT segment, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(cents) AS BIGINT) AS s,
         CAST(sum(i * cents) AS BIGINT) AS t
  FROM ranked GROUP BY segment
)
SELECT segment, n AS n_orders,
  2.0 * t / (n * CAST(s AS DOUBLE)) - CAST(n + 1 AS DOUBLE) / n AS gini
FROM s
"""

QUERIES.append(
    QueryDef(
        "gini_concentration",
        gini_concentration,
        _GINI_ORACLE,
        "per-segment revenue Gini coefficient over exact integer rank "
        "sums, one closed-form double expression",
    )
)


# ---------------------------------------------------------------------------
# Fulfillment-latency percentiles — the operational SLA query: order-to-
# ship lag distribution per order priority
# ---------------------------------------------------------------------------

def ship_lag_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """p50/p90/p99 of the order→ship lag in whole days per priority:
    lineitem ⋈ orders on the order key (the fact-fact equi-join), lag as
    exact integer epoch-day difference, exact interpolated percentiles
    (value_percentiles IEEE-parity contract). One join shuffle + one
    priority-keyed combining agg."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        F.expr("CAST(l_shipdate AS DATE)").alias("ship_d"),
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderpriority",
        F.expr("CAST(o_orderdate AS DATE)").alias("order_d"),
    )
    lag = F.datediff(F.col("ship_d"), F.col("order_d")).cast("long")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select("o_orderpriority", lag.alias("lag_days"))
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.percentile("lag_days", 0.5).alias("p50_days"),
            F.percentile("lag_days", 0.9).alias("p90_days"),
            F.percentile("lag_days", 0.99).alias("p99_days"),
        )
    )


_SHIP_LAG_ORACLE = """
WITH j AS (
  SELECT o_orderpriority,
         date_diff('day', CAST(o_orderdate AS DATE),
                   CAST(l_shipdate AS DATE)) AS lag_days
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
)
SELECT o_orderpriority,
  CAST(count(*) AS BIGINT) AS n,
  quantile_cont(lag_days, 0.5)  AS p50_days,
  quantile_cont(lag_days, 0.9)  AS p90_days,
  quantile_cont(lag_days, 0.99) AS p99_days
FROM j GROUP BY o_orderpriority
"""

QUERIES.append(
    QueryDef(
        "ship_lag_percentiles",
        ship_lag_percentiles,
        _SHIP_LAG_ORACLE,
        "order-to-ship lag p50/p90/p99 per priority: exact integer day "
        "lags through the fact-fact join, interpolated percentiles",
    )
)
