"""PageRank operator sanity on crafted graphs (the oracle equality lives
in the driver gate; these pin ranking behavior from first principles)."""

from __future__ import annotations

import pytest

from feature_generation_benchmark_spark.operators.graph import SCALE, pagerank


def _scores(spark, edges, **kw):
    df = spark.createDataFrame(edges, "src long, dst long")
    return {r["node"]: r["score_e9"] for r in pagerank(df, **kw).collect()}


def test_symmetric_cycle_is_uniform(spark):
    # a 2-cycle: both nodes must end with identical scores
    s = _scores(spark, [(1, 2), (2, 1)])
    assert s[1] == s[2]
    # and total mass stays ~1e9 (no dangling nodes -> nothing drops)
    assert abs(s[1] + s[2] - SCALE) <= 2


def test_hub_outranks_leaves(spark):
    # star: all leaves point at the hub, hub points back at one leaf
    edges = [(i, 100) for i in range(1, 6)] + [(100, 1)]
    s = _scores(spark, edges)
    hub = s[100]
    assert all(hub > s[i] for i in range(1, 6))
    # the leaf receiving the hub's mass outranks the other leaves
    assert all(s[1] > s[i] for i in range(2, 6))


def test_damping_bounds(spark):
    with pytest.raises(ValueError):
        _scores(spark, [(1, 2), (2, 1)], damping_pct=0)
    with pytest.raises(ValueError):
        _scores(spark, [(1, 2), (2, 1)], damping_pct=100)


def test_feature_propagation_smooths_toward_global_mean(spark):
    """Message passing must contract the feature spread: the variance of
    2-hop means is no larger than the variance of raw supplier balances
    (the SGC smoothing property), and every n_2hop >= n_1hop (each
    1-hop customer contributes at least the supplier's own edge back)."""
    import statistics

    from feature_generation_benchmark_spark.workloads.graph import (
        graph_feature_propagation,
    )
    from tests.conftest import SF_SMOKE

    rows = graph_feature_propagation(spark, SF_SMOKE).collect()
    assert rows
    raw = [r.s_cents for r in rows]
    h2 = [r.mean_2hop_e6 / 1e6 for r in rows]
    assert statistics.pvariance(h2) <= statistics.pvariance(raw)
    for r in rows:
        assert r.n_2hop >= r.n_1hop, r
