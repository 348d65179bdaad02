"""Connected components over a pair (edge) table — the clustering step of a
dedup pipeline: near-duplicate PAIRS (from exact / Jaccard / MinHash /
SimHash / cosine operators) become duplicate CLUSTERS, each with a
canonical representative (the minimum id).

Algorithm: alternating **large-star / small-star** (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC'14) expressed as
DataFrame joins — converges in O(log^2 n) rounds on any graph shape,
unlike naive min-label propagation whose round count is the graph
diameter (a 1M-node duplicate *chain* would need 1M rounds; this needs
~40). Each round is two (join + groupBy-min) stages, all JVM-side; no
``collect_list`` — per-node neighborhood minima come from ``groupBy.min``
so hub nodes with huge neighborhoods never materialize a list in one
task. ``localCheckpoint`` truncates the plan between rounds (iterative
joins otherwise stack lineage and blow up analysis time).

At 100 TB: edge sets from dedup are usually a small fraction of the
corpus (pairs, not documents); every round shuffles only the current edge
set on node id. The convergence check is one tiny aggregate per round.

No counterpart in the reference (its dedup surface is ours to define;
clustering mirrors what production pipelines do after pair generation).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _canon(edges: DataFrame) -> DataFrame:
    """Canonicalize to distinct (hi, lo) pairs with hi > lo."""
    hi = F.greatest("src", "dst")
    lo = F.least("src", "dst")
    return (
        edges.select(hi.alias("src"), lo.alias("dst"))
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )


def _large_star(edges: DataFrame) -> DataFrame:
    """For each node u: connect every strictly-larger neighbor to
    min(N(u) ∪ {u}).  Input/output: canonical (src>dst) pair sets."""
    sym = edges.union(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    mins = sym.groupBy("src").agg(
        F.least(F.min("dst"), F.first("src")).alias("mn")
    )
    return (
        sym.join(mins, "src")
        .where(F.col("dst") > F.col("src"))
        .select(F.col("dst").alias("src"), F.col("mn").alias("dst"))
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """For each node u with smaller-or-equal neighbors N≤(u): connect u and
    all of N≤(u) to min(N≤(u) ∪ {u}).  Canonical pairs in, canonical out."""
    mins = edges.groupBy("src").agg(F.min("dst").alias("mn"))
    with_min = edges.join(mins, "src")
    to_min = with_min.select(F.col("src"), F.col("mn").alias("dst"))
    neighbors = with_min.select(F.col("dst").alias("src"), F.col("mn").alias("dst"))
    return (
        to_min.union(neighbors)
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )


def connected_components(
    edges: DataFrame,
    src: str | Column = "src",
    dst: str | Column = "dst",
    max_iter: int = 50,
) -> DataFrame:
    """Resolve ``edges`` (undirected, any orientation, self-loops ignored)
    into components. Returns ``(id, component)`` for every node that
    appears in an edge, where ``component`` is the minimum node id of its
    connected component. Deterministic.

    Iterates large-star/small-star until the edge set is a fixed point
    (every node points directly at its component min — a "star"), checked
    with a count+hash aggregate (one cheap action per round, no
    ``collect`` of data rows).
    """
    cur = _canon(edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")))
    prev_sig = None
    for _ in range(max_iter):
        cur = _small_star(_large_star(cur)).localCheckpoint(eager=True)
        sig = cur.agg(
            F.count(F.lit(1)).alias("n"),
            F.bit_xor(F.xxhash64("src", "dst")).alias("h"),
        ).first()
        if prev_sig == (sig["n"], sig["h"]):
            break
        prev_sig = (sig["n"], sig["h"])
    else:
        raise RuntimeError(f"connected_components: no fixpoint in {max_iter} rounds")
    # fixed point: every edge is (member, component_min); component minima
    # themselves appear only on the dst side — add their self-assignment.
    members = cur.select(F.col("src").alias("id"), F.col("dst").alias("component"))
    roots = cur.select(F.col("dst").alias("id")).distinct().withColumn(
        "component", F.col("id")
    )
    return members.union(roots).distinct()
