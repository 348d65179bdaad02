"""PageRank as a pure DataFrame program — the join-iteration pattern
(sibling of ``operators/kmeans.py``'s agg-iteration and
``operators/clustering.py``'s star-contraction).

Scores are carried as **e9-scaled int64** and every per-iteration op is
integer arithmetic: contribution = ``score div out_degree``, damping =
``(d·Σcontrib) div 100``, teleport = ``((100−d)·1e9) div (100·N)``. With
no floating point anywhere, the whole trajectory is bit-reproducible on
any engine — a SQL twin replays training exactly (same trick that made
k-means oracle-checkable, here with zero rounding because the domain is
already integral). The standard float formulation differs from this one
by < 1e-7 relative — irrelevant for ranking, decisive for verification.

Dangling nodes (no out-edges) drop their mass — the simplified PageRank
variant; total mass shrinks accordingly, rankings are unaffected for the
connected bipartite graphs this engine builds.

Scale posture: one shuffle per iteration pair (join scores→edges on src,
re-agg on dst); the iteration count is a compile-time constant so the
whole K-round program is ONE lazy plan. Edges and degrees are computed
once and cached by the caller if reused.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCALE = 10**9


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 5,
    damping_pct: int = 85,
    small_state: bool = False,
) -> DataFrame:
    """(src, dst) int64 edge list → (node, score_e9) after ``iterations``
    integer-quantized power steps from a uniform start.

    ``small_state=True`` declares the NODE space dim-sized (even when the
    edge list is huge — e.g. customers×suppliers trade graphs): per-node
    state (scores, degrees, in-mass) is broadcast into the edge-side joins
    and each iteration's scores are ``localCheckpoint``ed. That leaves ONE
    shuffle per iteration (the in-mass re-aggregation over edges) and caps
    lineage depth at one step, instead of three shuffle joins per
    iteration over an ever-deeper plan. For web-scale node spaces leave it
    False: state then stays partitioned and every join is a hash shuffle —
    the horizontally-scaling posture.
    """
    if not 0 < damping_pct < 100:
        raise ValueError("damping_pct must be in (0, 100)")
    bc = F.broadcast if small_state else (lambda df: df)
    e = edges.select(
        F.col(src).cast("long").alias("src"), F.col(dst).cast("long").alias("dst")
    )
    # loop invariants, each read once per iteration: cache so the K-round
    # plan re-reads a materialized RDD instead of recomputing the
    # distinct/agg subtrees K times (and the lineage stays shallow).
    # They must stay cached until the CALLER's action runs, so cleanup is
    # the caller's: unpersist via spark.catalog.clearCache() (or let LRU
    # eviction handle it) once the result is materialized.
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .cache()
    )
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("out_deg")).cache()
    nn = nodes.agg(F.count(F.lit(1)).alias("n"))
    # (node, n) hoisted out of the loop: each iteration's rank update
    # needs every node with the node count, but the crossJoin-with-agg
    # subtree is loop-invariant — cache it once instead of re-deriving
    # (and re-broadcasting nn) every round (r7, guide §2.4)
    base = nodes.crossJoin(F.broadcast(nn)).selectExpr("node", "n").cache()
    scores = base.selectExpr(
        "node", f"CAST({SCALE}L div n AS LONG) AS score_e9"
    )
    d = damping_pct
    for _ in range(iterations):
        # pre-join the node-sized (score, out_deg) state BEFORE the
        # fact-sized edge join: one broadcast build + one hash-table
        # probe per edge row per iteration instead of two (r7
        # optimization, guide §3.1 — the join result is identical: both
        # joins are inner on the same key, so composing them node-side
        # first changes no rows)
        state = scores.withColumnRenamed("node", "src").join(deg, "src")
        contrib = e.join(bc(state), "src").selectExpr(
            "dst", "score_e9 div out_deg AS c"
        )
        sums = contrib.groupBy("dst").agg(F.sum("c").alias("in_mass"))
        scores = (
            base
            .join(bc(sums), base.node == sums.dst, "left")
            .selectExpr(
                "node",
                f"CAST(({100 - d}L * {SCALE}L) div (100L * n)"
                f" + ({d}L * coalesce(in_mass, 0L)) div 100L AS LONG)"
                " AS score_e9",
            )
        )
        if small_state:
            # cut lineage each step: iteration i+1 starts from i's few
            # thousand materialized rows, not its whole replayed plan.
            # eager=False (the kmeans pattern): plan construction stays
            # job-free and the checkpoint materializes inside the first
            # broadcast job that needs it — same-session A/B at sf0.1:
            # lazy 2.23-2.33 s vs eager 2.32-2.81 s warm, values
            # identical (integer-quantized scores pin the trajectory)
            scores = scores.localCheckpoint(eager=False)
    return scores


def bfs_hops(
    edges: DataFrame,
    sources: list[int],
    max_hops: int,
    src: str = "src",
    dst: str = "dst",
    small_state: bool = True,
) -> DataFrame:
    """Bounded-depth min-hop BFS from a source node set — the
    level-synchronous frontier-expansion iteration (the Pregel BFS
    shape, as a pure DataFrame loop). Returns ``(node, hop)`` with one
    row per reached node carrying its FIRST (= minimum) hop count; the
    whole program is integer-only, so a SQL twin (a depth-bounded
    recursive CTE + ``min(hop)``) replays it exactly.

    Per hop: frontier ⋈ edges on ``src`` (the only fact-sized op) →
    project ``dst`` → dedup → anti-join the visited set → stamp the hop.
    Frontier and visited are NODE-sized; with ``small_state=True`` both
    broadcast into the edge-side joins, leaving one shuffle per hop (the
    post-join dedup agg), and each level is ``localCheckpoint``ed so
    lineage depth stays at one step. The loop exits early on an empty
    frontier (an ``isEmpty`` action on a node-sized frame — cheap, and
    it never changes the result, only skips provably-empty levels). For
    web-scale node spaces set ``small_state=False``: state then stays
    hash-partitioned on the node key and every join/dedup shuffles —
    the horizontally-scaling posture.
    """
    if max_hops < 0:
        raise ValueError("max_hops must be >= 0")
    if not sources:
        raise ValueError("sources must be non-empty")
    spark = edges.sparkSession
    bc = F.broadcast if small_state else (lambda df: df)
    e = edges.select(
        F.col(src).cast("long").alias("src"),
        F.col(dst).cast("long").alias("dst"),
    )
    visited = spark.createDataFrame(
        [(int(s), 0) for s in dict.fromkeys(sources)], "node long, hop int"
    ).localCheckpoint(eager=False)
    frontier = visited.select("node")
    for h in range(1, max_hops + 1):
        nxt = bfs_level(e, frontier, visited, h, bc).localCheckpoint(
            eager=False
        )
        if nxt.isEmpty():
            break
        visited = visited.union(nxt).localCheckpoint(eager=False)
        frontier = nxt.select("node")
    return visited


def bfs_level(e, frontier, visited, h, bc=F.broadcast):
    """One BFS level: the next frontier with its hop stamp. Split out of
    :func:`bfs_hops` so plan tests can assert the level's join strategy —
    the loop consumes each level through a ``localCheckpoint``, which
    hides the join plan from the returned frame."""
    return (
        e.join(bc(frontier.withColumnRenamed("node", "src")), "src")
        .select(F.col("dst").alias("node"))
        .distinct()
        .join(bc(visited.select("node")), "node", "left_anti")
        .select("node", F.lit(h).cast("int").alias("hop"))
    )


def feature_propagation(
    edges: DataFrame, cust_feats: DataFrame, supp_feats: DataFrame
) -> DataFrame:
    """SGC-style 1- and 2-hop neighbor-mean aggregation over a bipartite
    (custkey, suppkey) edge set, per supplier — MULTISET path semantics:
    a supplier reachable via k shared customers contributes k times
    (self-paths included), the standard GNN message-passing weighting.

    2-hop is computed as TWO chained keyed aggregations — a per-customer
    sum/count over its supplier neighborhood, then a per-supplier sum of
    those customer totals:

        n_2hop(s)   = Σ_{c∈N(s)} deg(c)
        sum_2hop(s) = Σ_{c∈N(s)} Σ_{s2∈N(c)} x_{s2}

    This is exactly the multiset edge ⋈ edge 2-hop, but linear in
    |edges|: a viral-hub customer of degree D costs ONE wide aggregate
    row instead of D² joined rows (the skewed-key straggler the naive
    self-join plan produces at scale). Inputs: ``edges(custkey,
    suppkey)`` distinct, ``cust_feats(custkey, c_cents)``,
    ``supp_feats(suppkey, s_cents)``; all sums exact integer cents, the
    two means single e6-quantized divisions."""
    h1 = (
        edges.join(cust_feats, "custkey")
        .groupBy("suppkey")
        .agg(
            F.count(F.lit(1)).alias("n_1hop"),
            F.sum("c_cents").alias("sum_1hop_cents"),
        )
    )
    cust_totals = (
        edges.join(supp_feats, "suppkey")
        .groupBy("custkey")
        .agg(
            F.count(F.lit(1)).alias("deg_c"),
            F.sum("s_cents").alias("c_sup_sum"),
        )
    )
    h2 = (
        edges.join(cust_totals, "custkey")
        .groupBy("suppkey")
        .agg(
            F.sum("deg_c").alias("n_2hop"),
            F.sum("c_sup_sum").alias("sum_2hop_cents"),
        )
    )
    return (
        supp_feats.join(h1, "suppkey")
        .join(h2, "suppkey")
        .select(
            "suppkey",
            "s_cents",
            "n_1hop",
            F.round(
                F.col("sum_1hop_cents") * F.lit(1e6) / F.col("n_1hop"), 0
            )
            .cast("long")
            .alias("mean_1hop_e6"),
            "n_2hop",
            F.round(
                F.col("sum_2hop_cents") * F.lit(1e6) / F.col("n_2hop"), 0
            )
            .cast("long")
            .alias("mean_2hop_e6"),
        )
    )
