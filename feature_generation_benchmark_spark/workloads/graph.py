"""Graph workload — integer-quantized PageRank over the customer↔supplier
bipartite trade graph (edges = distinct (customer, supplier) pairs that
traded, both directions so mass circulates).

Node encoding packs both key spaces into one int64 id: customer → 2k,
supplier → 2k+1. The DuckDB twin unrolls the fixed iteration count into
chained CTEs and replays the exact integer trajectory (see
``operators/graph.py`` for why there is no float anywhere).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from feature_generation_benchmark_spark.operators.graph import (
    SCALE,
    pagerank,
)
from feature_generation_benchmark_spark.sources.testdata import load_table
from feature_generation_benchmark_spark.workloads import QueryDef

_PR_ITERS = 5
_PR_DAMP = 85


def _trade_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    pairs = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select(
            (F.col("o_custkey") * 2).alias("cnode"),
            (F.col("l_suppkey") * 2 + 1).alias("snode"),
        )
        .distinct()
    )
    fwd = pairs.select(F.col("cnode").alias("src"), F.col("snode").alias("dst"))
    bwd = pairs.select(F.col("snode").alias("src"), F.col("cnode").alias("dst"))
    return fwd.union(bwd)


def pagerank_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    from feature_generation_benchmark_spark.session import ensure_runtime_confs

    ensure_runtime_confs(spark)
    edges = _trade_edges(spark, sf_dir).cache()
    scores = pagerank(
        edges,
        iterations=_PR_ITERS,
        damping_pct=_PR_DAMP,
        # node space = customers + suppliers (dim-sized) even though the
        # edge list is fact-sized — the broadcast-state iteration applies
        small_state=True,
    )
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        scores.filter(F.col("node") % 2 == 1)
        .select(((F.col("node") - 1) / 2).cast("long").alias("s_suppkey"),
                "score_e9")
        .join(F.broadcast(supp), "s_suppkey")
        .select("s_suppkey", "s_name", "score_e9")
    )


def _pagerank_oracle() -> str:
    d = _PR_DAMP
    sql = f"""
WITH pairs AS (
  SELECT DISTINCT o_custkey * 2 AS cnode, l_suppkey * 2 + 1 AS snode
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
),
edges AS (
  SELECT cnode AS src, snode AS dst FROM pairs
  UNION ALL
  SELECT snode AS src, cnode AS dst FROM pairs
),
nodes AS (SELECT DISTINCT src AS node FROM edges
          UNION SELECT DISTINCT dst FROM edges),
deg AS (SELECT src, count(*) AS out_deg FROM edges GROUP BY src),
nn AS (SELECT count(*) AS n FROM nodes),
s0 AS (SELECT node, CAST({SCALE} // n AS BIGINT) AS score
       FROM nodes CROSS JOIN nn)"""
    for i in range(_PR_ITERS):
        sql += f""",
m{i + 1} AS (
  SELECT e.dst, sum(s.score // deg.out_deg) AS in_mass
  FROM edges e JOIN s{i} s ON e.src = s.node JOIN deg ON e.src = deg.src
  GROUP BY e.dst
),
s{i + 1} AS (
  SELECT nodes.node,
    CAST(({100 - d}::BIGINT * {SCALE}) // (100 * nn.n)
         + ({d}::BIGINT * coalesce(m.in_mass, 0)) // 100 AS BIGINT)
      AS score
  FROM nodes CROSS JOIN nn LEFT JOIN m{i + 1} m ON nodes.node = m.dst
)"""
    sql += f"""
SELECT s_suppkey, s_name, score AS score_e9
FROM s{_PR_ITERS} JOIN supplier ON (node - 1) // 2 = s_suppkey
WHERE node % 2 = 1
"""
    return sql


QUERIES = [
    QueryDef(
        "pagerank_suppliers",
        pagerank_suppliers,
        _pagerank_oracle(),
        "integer-quantized PageRank over the trade graph, 5 unrolled iters",
    ),
]
