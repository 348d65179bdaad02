"""Round-4c operators vs independent Python models: bounded-depth BFS
(hand graph with cycles + unreachable component), one-pass Pearson
correlation matrix (numpy corrcoef), and lang-source mutual information
(Counter-based plug-in MI). The DuckDB oracle is the cross-engine gate;
these pin SEMANTICS on edge-case fixtures and real sf0.001 data.
"""

from __future__ import annotations

import math
from collections import Counter
from itertools import combinations

import numpy as np
import pytest

from feature_generation_benchmark_spark.operators.graph import bfs_hops
from feature_generation_benchmark_spark.workloads.features_eng import (
    _CORR_VARS,
    lineitem_corr_matrix,
)
from feature_generation_benchmark_spark.workloads.graph import (
    supplier_bfs_hops,
)
from feature_generation_benchmark_spark.workloads.text import lang_source_mi
from tests.conftest import SF_SMOKE


def _edges_df(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def test_bfs_hops_chain_cycle_and_unreachable(spark):
    # 1->2->3->4->5 chain, 3->1 back-edge (cycle), 9<->10 disconnected
    pairs = [(1, 2), (2, 3), (3, 4), (4, 5), (3, 1), (9, 10), (10, 9)]
    got = {
        r["node"]: r["hop"]
        for r in bfs_hops(_edges_df(spark, pairs), [1], 3).collect()
    }
    # hop 4 node (5) is beyond max_hops=3; cycle must not re-add node 1
    assert got == {1: 0, 2: 1, 3: 2, 4: 3}


def test_bfs_hops_min_hop_wins_on_diamond(spark):
    # 1->2->4 and 1->3, 3->5->4: node 4 reachable at hop 2 and hop 3 —
    # the visited anti-join must keep the FIRST (minimum) level.
    pairs = [(1, 2), (2, 4), (1, 3), (3, 5), (5, 4)]
    got = {
        r["node"]: r["hop"]
        for r in bfs_hops(_edges_df(spark, pairs), [1], 5).collect()
    }
    assert got == {1: 0, 2: 1, 3: 1, 4: 2, 5: 2}


def test_bfs_hops_multi_source_and_early_stop(spark):
    # two sources; frontier empties at hop 2 << max_hops=10 (early exit)
    pairs = [(1, 2), (7, 8)]
    got = {
        r["node"]: r["hop"]
        for r in bfs_hops(_edges_df(spark, pairs), [1, 7, 1], 10).collect()
    }
    assert got == {1: 0, 7: 0, 2: 1, 8: 1}


def test_supplier_bfs_source_at_zero_hops(spark):
    rows = {r["s_suppkey"]: r["hops"] for r in supplier_bfs_hops(spark, SF_SMOKE).collect()}
    assert rows[1] == 0
    # bipartite encoding: suppliers sit at even hop counts only
    assert all(h % 2 == 0 for h in rows.values())
    assert all(h <= 4 for h in rows.values())


def test_corr_matrix_matches_numpy(spark):
    import duckdb

    con = duckdb.connect()
    m = con.execute(
        f"""
        SELECT CAST(l_quantity AS BIGINT),
               CAST(round(l_extendedprice, 0) AS BIGINT),
               CAST(round(l_discount * 100, 0) AS BIGINT),
               CAST(round(l_tax * 100, 0) AS BIGINT)
        FROM '{SF_SMOKE}/lineitem.parquet'
        """
    ).fetchnumpy()
    cols = list(m.values())
    want = np.corrcoef(np.vstack([c.astype(np.float64) for c in cols]))
    got = {
        (r["col_x"], r["col_y"]): r["corr"]
        for r in lineitem_corr_matrix(spark, SF_SMOKE).collect()
    }
    names = list(_CORR_VARS)
    assert len(got) == 6
    for (a, b), v in got.items():
        ia, ib = names.index(a), names.index(b)
        assert v == pytest.approx(want[ia, ib], abs=1e-9), (a, b)


def test_corr_matrix_row_count_is_constant(spark):
    out = lineitem_corr_matrix(spark, SF_SMOKE)
    rows = out.collect()
    assert len(rows) == 6
    assert {tuple(sorted((r["col_x"], r["col_y"]))) for r in rows} == {
        tuple(sorted(p)) for p in combinations(_CORR_VARS, 2)
    }
    n = rows[0]["n_rows"]
    assert all(r["n_rows"] == n for r in rows)


def _plug_in_mi(pairs):
    n = len(pairs)
    c_xy = Counter(pairs)
    c_x = Counter(p[0] for p in pairs)
    c_y = Counter(p[1] for p in pairs)
    return sum(
        c / n * math.log((n * c) / (c_x[x] * c_y[y]))
        for (x, y), c in c_xy.items()
    )


def test_lang_source_mi_matches_counter_model(spark):
    import duckdb

    con = duckdb.connect()
    pairs = con.execute(
        f"SELECT lang, source FROM '{SF_SMOKE}/documents.parquet' "
        "WHERE lang IS NOT NULL AND source IS NOT NULL"
    ).fetchall()
    want = _plug_in_mi(pairs)
    row = lang_source_mi(spark, SF_SMOKE).collect()[0]
    assert row["n_docs"] == len(pairs)
    assert row["n_langs"] == len({p[0] for p in pairs})
    assert row["n_sources"] == len({p[1] for p in pairs})
    # micro-nat quantization error is bounded by 0.5e-6 per cell count
    assert row["mi_nats"] == pytest.approx(want, abs=2e-6)
    assert row["mi_nats"] >= 0 or row["mi_nats"] == pytest.approx(0, abs=2e-6)


def test_lang_source_mi_zero_for_independent_labels(spark, tmp_path_factory):
    # a perfectly balanced grid: lang and source independent -> MI = 0
    rows = [
        (i, "t", lang, src, 1)
        for i, (lang, src) in enumerate(
            (lang, src) for lang in ("en", "de") for src in ("a", "b")
        )
    ]
    d = tmp_path_factory.mktemp("mi_zero")
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(str(d / "documents.parquet"))
    row = lang_source_mi(spark, str(d)).collect()[0]
    assert row["mi_nats"] == pytest.approx(0.0, abs=1e-9)
    assert row["n_cells"] == 4


def _py_es_sample(sf_dir, k=10):
    """Independent A-ES model: hashlib md5 uniforms, micro-quantized ln,
    exponential-race ranking — mirrors the engine with no Spark/DuckDB."""
    import duckdb
    import hashlib

    con = duckdb.connect()
    rows = con.execute(
        f"""
        SELECT c_mktsegment, c_custkey,
               CAST(sum(round(o_totalprice * 100, 0)) AS BIGINT) AS w
        FROM '{sf_dir}/customer.parquet'
        JOIN '{sf_dir}/orders.parquet' ON c_custkey = o_custkey
        GROUP BY c_mktsegment, c_custkey
        """
    ).fetchall()
    by_seg = {}
    for seg, ck, w in rows:
        h = int(hashlib.md5(str(ck).encode()).hexdigest()[:8], 16)
        lmicro = round(math.log((h + 0.5) / 4294967296.0) * 1e6)
        by_seg.setdefault(seg, []).append((-(lmicro / w), ck, w))
    out = {}
    for seg, items in by_seg.items():
        items.sort()
        out[seg] = [(ck, w) for _, ck, w in items[:k]]
    return out


def test_weighted_sample_matches_python_model(spark):
    from feature_generation_benchmark_spark.workloads.sampling import (
        weighted_sample_segments,
    )

    want = _py_es_sample(SF_SMOKE)
    got = {}
    for r in weighted_sample_segments(spark, SF_SMOKE).collect():
        got.setdefault(r["c_mktsegment"], []).append(
            (r["rn"], r["c_custkey"], r["revenue_cents"])
        )
    assert set(got) == set(want)
    for seg, rows in got.items():
        rows.sort()
        assert [(ck, w) for _, ck, w in rows] == want[seg], seg


def test_weighted_sample_huge_weight_ranks_first(spark, tmp_path_factory):
    # A-ES: as w -> inf the race key lmicro/w -> 0- (the maximum), so a
    # customer with overwhelming revenue must be sampled at rank 1.
    d = tmp_path_factory.mktemp("ws_bias")
    cust = [(i, f"Customer#{i}", "SEG") for i in range(1, 40)]
    spark.createDataFrame(
        cust, "c_custkey long, c_name string, c_mktsegment string"
    ).coalesce(1).write.mode("overwrite").parquet(str(d / "customer.parquet"))
    orders = [(i, i, 1e9 if i == 7 else 10.0) for i in range(1, 40)]
    spark.createDataFrame(
        orders, "o_orderkey long, o_custkey long, o_totalprice double"
    ).coalesce(1).write.mode("overwrite").parquet(str(d / "orders.parquet"))
    from feature_generation_benchmark_spark.workloads.sampling import (
        weighted_sample_segments,
    )

    rows = weighted_sample_segments(spark, str(d)).collect()
    top = next(r for r in rows if r["rn"] == 1)
    assert top["c_custkey"] == 7
    assert len(rows) == 10
