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


# --------------------------------------------------------------------------
# Referential-integrity audit across every TPC-H FK edge — the
# cross-table sibling of dq_expectations' single-edge FK check: orphan
# counts for all six fact→dim edges in one result. Each edge is a
# LEFT ANTI join; dims (nation, supplier-keys, part-keys, customer-keys,
# order-keys) are either broadcast outright or key-projected before the
# anti join, so at 100 TB each edge costs one fact scan + one
# key-distinct build side. Exact integer counts; trivially oracle-exact.
# --------------------------------------------------------------------------

def fk_orphan_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    part = load_table(spark, sf_dir, "part")
    nation = load_table(spark, sf_dir, "nation")

    def edge(name, fact, fk, dim, pk, broadcast_dim):
        # ONE fact scan per edge: left join against the key build side,
        # then a single agg counts rows and null-hits together (an anti
        # join + separate count would scan the fact twice)
        keys = dim.select(F.col(pk).alias(fk)).distinct().withColumn(
            "__hit", F.lit(1)
        )
        if broadcast_dim:
            keys = F.broadcast(keys)
        return (
            fact.select(fk)
            .join(keys, fk, "left")
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                # coalesce: sum over ZERO rows is NULL, but the oracle's
                # scalar count(*) subquery says 0 for an empty fact
                # table (r6 session-3 review)
                F.coalesce(
                    F.sum(F.col("__hit").isNull().cast("long")), F.lit(0)
                ).alias("n_orphans"),
            )
            .select(F.lit(name).alias("edge"), "n_rows", "n_orphans")
        )

    # the three lineitem edges share ONE fact scan (r7, guide §6.1: the
    # uncombined form read the biggest table three times — 3 fact passes
    # -> 1 at 100 TB): project the three FK columns once, left-join the
    # three key sets, count all three orphan tallies in one agg, then
    # explode the 1-row result into the same three edge rows
    def keyset(dim, pk, fk, tag, broadcast_dim):
        k = dim.select(F.col(pk).alias(fk)).distinct().withColumn(
            f"__hit_{tag}", F.lit(1)
        )
        return F.broadcast(k) if broadcast_dim else k

    li3 = (
        li.select("l_orderkey", "l_partkey", "l_suppkey")
        .join(keyset(orders, "o_orderkey", "l_orderkey", "o", False),
              "l_orderkey", "left")
        .join(keyset(part, "p_partkey", "l_partkey", "p", True),
              "l_partkey", "left")
        .join(keyset(supplier, "s_suppkey", "l_suppkey", "s", True),
              "l_suppkey", "left")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            *[
                F.coalesce(
                    F.sum(F.col(f"__hit_{t}").isNull().cast("long")),
                    F.lit(0),
                ).alias(f"orph_{t}")
                for t in ("o", "p", "s")
            ],
        )
        .select(
            F.explode(
                F.expr(
                    "array("
                    "named_struct('edge', 'lineitem->orders',"
                    " 'n_rows', n_rows, 'n_orphans', orph_o),"
                    "named_struct('edge', 'lineitem->part',"
                    " 'n_rows', n_rows, 'n_orphans', orph_p),"
                    "named_struct('edge', 'lineitem->supplier',"
                    " 'n_rows', n_rows, 'n_orphans', orph_s))"
                )
            ).alias("e")
        )
        .select("e.edge", "e.n_rows", "e.n_orphans")
    )
    edges = [
        li3,
        edge("orders->customer", orders, "o_custkey", customer,
             "c_custkey", True),
        edge("customer->nation", customer, "c_nationkey", nation,
             "n_nationkey", True),
        edge("supplier->nation", supplier, "s_nationkey", nation,
             "n_nationkey", True),
    ]
    out = edges[0]
    for e in edges[1:]:
        out = out.unionByName(e)
    return out


_FK_ORACLE = """
SELECT 'lineitem->orders' AS edge,
  CAST((SELECT count(*) FROM lineitem) AS BIGINT) AS n_rows,
  CAST((SELECT count(*) FROM lineitem l LEFT JOIN orders o
        ON l.l_orderkey = o.o_orderkey WHERE o.o_orderkey IS NULL)
    AS BIGINT) AS n_orphans
UNION ALL
SELECT 'lineitem->part',
  (SELECT count(*) FROM lineitem),
  (SELECT count(*) FROM lineitem l LEFT JOIN part p
   ON l.l_partkey = p.p_partkey WHERE p.p_partkey IS NULL)
UNION ALL
SELECT 'lineitem->supplier',
  (SELECT count(*) FROM lineitem),
  (SELECT count(*) FROM lineitem l LEFT JOIN supplier s
   ON l.l_suppkey = s.s_suppkey WHERE s.s_suppkey IS NULL)
UNION ALL
SELECT 'orders->customer',
  (SELECT count(*) FROM orders),
  (SELECT count(*) FROM orders o LEFT JOIN customer c
   ON o.o_custkey = c.c_custkey WHERE c.c_custkey IS NULL)
UNION ALL
SELECT 'customer->nation',
  (SELECT count(*) FROM customer),
  (SELECT count(*) FROM customer c LEFT JOIN nation n
   ON c.c_nationkey = n.n_nationkey WHERE n.n_nationkey IS NULL)
UNION ALL
SELECT 'supplier->nation',
  (SELECT count(*) FROM supplier),
  (SELECT count(*) FROM supplier s LEFT JOIN nation n
   ON s.s_nationkey = n.n_nationkey WHERE n.n_nationkey IS NULL)
"""

QUERIES.append(
    QueryDef(
        "fk_orphan_audit",
        fk_orphan_audit,
        _FK_ORACLE,
        "referential-integrity orphan counts across all six TPC-H FK "
        "edges via anti joins (broadcast key builds)",
    )
)


# --------------------------------------------------------------------------
# Column profiler — the first query anyone runs on an unknown table:
# per-column null count, exact distinct count, min/max (stringified for
# a uniform schema). ONE wide aggregate pass over lineitem computes
# every column's stats simultaneously (count_distinct per column is a
# single Expand + partial agg under AQE), then an unpivot to the
# (column, stat) long form — no per-column scans.
# --------------------------------------------------------------------------

_PROFILE_COLS = (
    "l_orderkey",
    "l_quantity",
    "l_returnflag",
    "l_linestatus",
    "l_extendedprice",
)

#: Per-column HLL++ precision for the approx profilers (r8, r7 verdict
#: #5 — the rsd-0.01 sketch buffer was ~5 s of the entry's cost).
#: Precision is spent where the ERROR REGIME needs it: rsd only governs
#: the HLL dense-mode estimate, which a column enters once its
#: cardinality approaches the register count; columns whose domain is
#: FIXED by the schema (quantity 1–50, two flag enums) stay in the
#: linear-counting regime at ANY data scale, where the estimate is
#: near-exact regardless of m — so they carry a cheap rsd-0.04 sketch
#: (2^10 registers vs 2^14). Columns whose cardinality grows with the
#: data (keys, prices) keep rsd 0.01. The within-5% contract is pinned
#: per column by the ``schema_profile_approx`` check twin (which gates
#: THIS map, not a fixed rsd) and
#: ``test_schema_profile_approx_close_to_exact``.
_PROFILE_RSD = {
    "l_orderkey": 0.01,
    "l_quantity": 0.04,
    "l_returnflag": 0.04,
    "l_linestatus": 0.04,
    "l_extendedprice": 0.01,
}


def schema_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    # The distinct counts and the plain stats are SEPARATE aggregates
    # (crossJoin of two 1-row results), not one wide agg (r7 optimization,
    # guide §2.4/§7.2): mixing countDistinct with min/max over STRING
    # columns forces the multi-distinct rewrite's first-level aggregate
    # into SortAggregate (string min/max buffers are not
    # HashAggregate-mutable), i.e. a full Sort of the 6x-Expanded fact
    # table by 6 keys. Split, the distinct side plans Expand →
    # HashAggregate (no Sort anywhere) and the stats side is a zero-key
    # single-pass fold; the second scan is orders cheaper than sorting
    # 6x the table. Measured sf0.1: 8.3 s → 1.7 s (noop sink, warm).
    base_aggs = [F.count(F.lit(1)).alias("n_rows")]
    dist_aggs = []
    for c in _PROFILE_COLS:
        base_aggs += [
            F.sum(F.col(c).isNull().cast("long")).alias(f"{c}__nulls"),
            # min/max on the NATIVE column (true extremes), stringified
            # once at the end for the uniform schema — lexicographic
            # min/max of stringified numerics would report '10.0' < '9.0'
            F.min(c).cast("string").alias(f"{c}__min"),
            F.max(c).cast("string").alias(f"{c}__max"),
        ]
        dist_aggs.append(F.countDistinct(c).alias(f"{c}__distinct"))
    wide = li.agg(*base_aggs).crossJoin(li.agg(*dist_aggs))
    rows = [
        f"named_struct('col_name', '{c}', 'n_rows', n_rows, "
        f"'n_nulls', {c}__nulls, 'n_distinct', {c}__distinct, "
        f"'min_str', {c}__min, 'max_str', {c}__max)"
        for c in _PROFILE_COLS
    ]
    return wide.select(
        F.explode(F.expr("array(" + ", ".join(rows) + ")")).alias("p")
    ).select("p.*")


def _profile_oracle() -> str:
    parts = []
    for c in _PROFILE_COLS:
        parts.append(f"""
SELECT '{c}' AS col_name,
  CAST(count(*) AS BIGINT) AS n_rows,
  CAST(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
  CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct,
  CAST(min({c}) AS VARCHAR) AS min_str,
  CAST(max({c}) AS VARCHAR) AS max_str
FROM lineitem""")
    return "\nUNION ALL\n".join(parts)


QUERIES.append(
    QueryDef(
        "schema_profile",
        schema_profile,
        _profile_oracle(),
        "one-pass column profiler: null/distinct/min/max for five "
        "lineitem columns in a single wide aggregate + unpivot",
    )
)


def schema_profile_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB column profiler: identical shape to
    :func:`schema_profile` but with ``approx_count_distinct`` (HLL++,
    default rsd 5%) in place of exact ``countDistinct``. Exact
    per-column distinct plans as an Expand that replicates the fact
    table once per profiled column — a 5× row blow-up that is real
    money at 100 TB; the HLL++ sketches fold into the SAME single
    aggregate as the other stats, so this variant is ONE plain
    map-combined pass over the scan with no Expand at all (plan-guarded
    by ``test_schema_profile_approx_no_expand``). Error bound: HLL++ at
    rsd=0.01 (relative standard error 1%, sketch ~2^14 registers — KBs
    per column, irrelevant beside the scan) — pinned within 5% of exact
    by ``test_schema_profile_approx_close_to_exact``. Rows-only driver
    check by design: DuckDB's ``approx_distinct`` uses a different HLL
    implementation, so the estimates differ across engines; the exact
    twin ``schema_profile`` stays the hash-checked gate."""
    li = load_table(spark, sf_dir, "lineitem")
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in _PROFILE_COLS:
        aggs += [
            F.sum(F.col(c).isNull().cast("long")).alias(f"{c}__nulls"),
            F.approx_count_distinct(c, _PROFILE_RSD[c]).alias(
                f"{c}__distinct"
            ),
            F.min(c).cast("string").alias(f"{c}__min"),
            F.max(c).cast("string").alias(f"{c}__max"),
        ]
    wide = li.agg(*aggs)
    rows = [
        f"named_struct('col_name', '{c}', 'n_rows', n_rows, "
        f"'n_nulls', {c}__nulls, 'n_distinct_approx', {c}__distinct, "
        f"'min_str', {c}__min, 'max_str', {c}__max)"
        for c in _PROFILE_COLS
    ]
    return wide.select(
        F.explode(F.expr("array(" + ", ".join(rows) + ")")).alias("p")
    ).select("p.*")


def schema_profile_approx_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bound-gated verification form of :func:`schema_profile_approx`
    (r5 verdict #7): the served entry emits the EXACT distinct counts
    plus a ``distinct_within_5pct`` flag comparing Spark's HLL++ estimate
    (rsd 1%) against exact — so the driver's value hash gates the *error
    bound* cross-engine (DuckDB oracle emits the same exact counts and a
    literal TRUE) without pinning engine-specific HLL bits. The raw
    estimate is deliberately NOT in the output: it differs across
    engines and would always hash-mismatch.

    This is the verification plan, not the production plan — computing
    exact distinct alongside the sketch re-introduces the per-column
    Expand, which is exactly what :func:`schema_profile_approx` (the
    Expand-free single-pass plan, plan-guarded by
    ``test_schema_profile_approx_no_expand``) avoids at 100 TB.
    ``bench=False`` because its cost is exact+approx, not representative
    of either production profiler.

    ⚠ The exact and approx sides are deliberately SEPARATE aggregates
    (crossJoin of two 1-row results), never one mixed agg: Spark's
    multi-distinct rewrite groups the partial stage by (gid, value) and
    allocates every non-distinct aggregate's buffer PER GROUP — five
    rsd-1% HLL++ sketches (~16 KB each) × |distinct values| groups OOMs
    a 1 GB driver on a 60 k-row table, let alone at scale."""
    li = load_table(spark, sf_dir, "lineitem")
    exact_aggs = [F.count(F.lit(1)).alias("n_rows")]
    approx_aggs = []
    for c in _PROFILE_COLS:
        exact_aggs += [
            F.sum(F.col(c).isNull().cast("long")).alias(f"{c}__nulls"),
            F.countDistinct(c).alias(f"{c}__exact"),
            F.min(c).cast("string").alias(f"{c}__min"),
            F.max(c).cast("string").alias(f"{c}__max"),
        ]
        approx_aggs.append(
            # gate the PRODUCTION per-column precision map, not a fixed
            # rsd — the twin exists to bound what the served profiler
            # actually computes (r8)
            F.approx_count_distinct(c, _PROFILE_RSD[c]).alias(
                f"{c}__approx"
            )
        )
    wide = li.agg(*exact_aggs).crossJoin(li.agg(*approx_aggs))
    rows = [
        f"named_struct('col_name', '{c}', 'n_rows', n_rows, "
        f"'n_nulls', {c}__nulls, 'n_distinct', {c}__exact, "
        f"'distinct_within_5pct', "
        f"abs({c}__approx - {c}__exact) <= "
        f"greatest(1L, CAST(0.05 * {c}__exact AS BIGINT)), "
        f"'min_str', {c}__min, 'max_str', {c}__max)"
        for c in _PROFILE_COLS
    ]
    return wide.select(
        F.explode(F.expr("array(" + ", ".join(rows) + ")")).alias("p")
    ).select("p.*")


def _profile_approx_check_oracle() -> str:
    parts = []
    for c in _PROFILE_COLS:
        parts.append(f"""
SELECT '{c}' AS col_name,
  CAST(count(*) AS BIGINT) AS n_rows,
  CAST(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
  CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct,
  TRUE AS distinct_within_5pct,
  CAST(min({c}) AS VARCHAR) AS min_str,
  CAST(max({c}) AS VARCHAR) AS max_str
FROM lineitem""")
    return "\nUNION ALL\n".join(parts)


def schema_profile_approx_raw_gated(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Hash-gated form of the PRODUCTION Expand-free profiler (r6
    verdict #1): a pure projection over :func:`schema_profile_approx` —
    the plan stays ONE map-combined aggregate with no Expand (the same
    ``test_schema_profile_approx_no_expand`` guard covers it) — that
    serves the exact scaffolding (n_rows, n_nulls, min/max — DuckDB
    recomputes all four) plus an in-plan sanity bound on the
    engine-specific HLL++ estimate: ≥1 iff a non-null exists, and
    ≤ 1.1× the non-null count. The TIGHT 5%-vs-exact bound lives in the
    ``schema_profile_approx`` check twin, whose exact countDistinct
    side re-introduces the per-column Expand this production entry
    exists to avoid."""
    p = schema_profile_approx(spark, sf_dir)
    nonnull = F.col("n_rows") - F.col("n_nulls")
    return p.select(
        "col_name",
        "n_rows",
        "n_nulls",
        (
            ((F.col("n_distinct_approx") >= 1) == (nonnull >= 1))
            & (
                F.col("n_distinct_approx")
                <= nonnull
                + F.greatest(F.lit(1), (F.lit(0.1) * nonnull).cast("long"))
            )
        ).alias("distinct_est_sane"),
        "min_str",
        "max_str",
    )


def _profile_approx_raw_oracle() -> str:
    parts = []
    for c in _PROFILE_COLS:
        parts.append(f"""
SELECT '{c}' AS col_name,
  CAST(count(*) AS BIGINT) AS n_rows,
  CAST(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
  TRUE AS distinct_est_sane,
  CAST(min({c}) AS VARCHAR) AS min_str,
  CAST(max({c}) AS VARCHAR) AS max_str
FROM lineitem""")
    return "\nUNION ALL\n".join(parts)


QUERIES.append(
    # raw production profiler stays served + benched, now hash-gated on
    # its exact scaffolding + estimate sanity bound (r7: zero no_oracle
    # rows; Expand-free plan still guarded by
    # test_schema_profile_approx_no_expand; 5% bound gate is the twin)
    QueryDef(
        "schema_profile_approx_raw",
        schema_profile_approx_raw_gated,
        _profile_approx_raw_oracle(),
        "single-pass Expand-free HLL++ column profiler (production "
        "plan, hash-gated on exact rows/nulls/min/max + estimate "
        "sanity bound)",
    )
)
QUERIES.append(
    QueryDef(
        "schema_profile_approx",
        schema_profile_approx_check,
        _profile_approx_check_oracle(),
        "HLL++ profiler, bound-gated: hash check verifies the estimate "
        "is within 5% of exact (production Expand-free plan is "
        "schema_profile_approx, plan-guarded)",
        bench=False,
    )
)
