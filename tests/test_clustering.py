"""connected_components (large-star/small-star) + the new dataset-assembly
queries: union-find ground truth, convergence on chains, packing/sampling
invariants, quality-gate sanity."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from feature_generation_benchmark_spark.operators.clustering import (
    connected_components,
)
from feature_generation_benchmark_spark.workloads.sampling import (
    SAMPLE_RATES,
    sample_stratified,
    sequence_packing,
)
from feature_generation_benchmark_spark.workloads.text import text_quality
from tests.conftest import SF_CORRECT


def _uf_components(edges: list[tuple[int, int]]) -> dict[int, int]:
    """Union-find ground truth: node -> min id of its component."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


def _run_cc(spark, edges: list[tuple[int, int]]) -> dict[int, int]:
    df = spark.createDataFrame(edges, "src long, dst long")
    out = connected_components(df).collect()
    return {r["id"]: r["component"] for r in out}


def test_cc_chain_and_clique(spark):
    # a 12-node chain (forces multiple star rounds — naive one-hop
    # propagation would need 12) + a clique + reversed/duplicate edges
    chain = [(i, i + 1) for i in range(100, 111)]
    clique = [(a, b) for a in (1, 2, 3) for b in (1, 2, 3) if a != b]
    edges = chain + clique + [(2, 1), (200, 201), (201, 200), (300, 300)]
    got = _run_cc(spark, edges)
    assert {n: c for n, c in got.items() if n >= 100 and n < 200} == {
        n: 100 for n in range(100, 112)
    }
    assert {n: c for n, c in got.items() if n < 10} == {1: 1, 2: 1, 3: 1}
    assert got[200] == 200 and got[201] == 200
    # pure self-loop node carries no connectivity information
    assert 300 not in got


def test_cc_random_graph_matches_union_find(spark):
    rng = random.Random(7)
    nodes = list(range(1000, 1300))
    edges = [
        (rng.choice(nodes), rng.choice(nodes)) for _ in range(200)
    ]
    edges = [(a, b) for a, b in edges if a != b]
    assert _run_cc(spark, edges) == _uf_components(edges)


def test_sequence_packing_conserves_tokens(spark):
    packed = sequence_packing(spark, SF_CORRECT).collect()
    # every source's packed sequences partition its documents
    by_source: dict[str, int] = {}
    for r in packed:
        by_source[r["source"]] = by_source.get(r["source"], 0) + r["n_docs"]
        assert r["seq_tokens"] > 0 and r["first_doc"] <= r["last_doc"]
    assert sum(by_source.values()) == 500  # sf0.01 documents rows


def test_stratified_sample_rates(spark):
    out = sample_stratified(spark, SF_CORRECT).groupBy("lang").count().collect()
    got = {r["lang"]: r["count"] for r in out}
    # md5 keys are uniform: observed rate within a loose binomial bound
    totals = {"en": 218, "de": 70, "es": 73, "fr": 64, "zh": 75}
    for lang, rate in SAMPLE_RATES.items():
        assert abs(got.get(lang, 0) / totals[lang] - rate) < 0.15, lang


def test_quality_gate_splits_corpus(spark):
    counts = (
        text_quality(spark, SF_CORRECT)
        .groupBy("passes_quality")
        .count()
        .collect()
    )
    got = {r["passes_quality"]: r["count"] for r in counts}
    assert got.get(True, 0) > 0 and got.get(False, 0) > 0
