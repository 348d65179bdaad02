"""Round-4d operators vs independent Python models: distributed Gram
matrix (numpy int64 GEMM), per-customer integer-exact EMA (hand fold +
partition invariance), and BM25 keyword ranking (math.log scorer). The
DuckDB oracle is the cross-engine gate; these pin SEMANTICS on models
that share no code with the engine.
"""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import numpy as np
import pandas as pd

from feature_generation_benchmark_spark.workloads.similarity import (
    _GRAM_Q,
    embedding_gram_matrix,
)
from feature_generation_benchmark_spark.workloads.text import (
    _BM25_K,
    _BM25_TERMS,
    bm25_doc_ranking,
)
from feature_generation_benchmark_spark.workloads.timeseries import (
    ema_customer_spend,
)
from tests.conftest import SF_SMOKE


# ---------------------------------------------------------------- gram ---


def test_gram_matrix_matches_numpy_int64_gemm(spark):
    got = {
        (r["i"], r["j"]): r["dot_q"]
        for r in embedding_gram_matrix(spark, SF_SMOKE).collect()
    }
    emb = pd.read_parquet(f"{SF_SMOKE}/embeddings.parquet")
    V = np.stack([np.asarray(v, dtype=np.float64) for v in emb["embedding"]])
    Q = np.round(V * _GRAM_Q).astype(np.int64)
    G = Q.T @ Q
    d = G.shape[0]
    want = {(i, j): int(G[i, j]) for i in range(d) for j in range(i, d)}
    assert got == want
    assert len(got) == d * (d + 1) // 2  # upper triangle exactly once


def test_gram_matrix_partition_invariant(spark):
    """Integer cells ⇒ bit-identical under any input partitioning."""
    base = embedding_gram_matrix(spark, SF_SMOKE)
    reparted = (
        spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
        .repartition(13)
        .cache()
    )
    try:
        path = None  # reuse the query but on the repartitioned frame:
        from pyspark.sql import functions as F
        from feature_generation_benchmark_spark.operators.similarity import (
            as_double_array,
        )

        q = F.transform(
            as_double_array("embedding"),
            lambda v: F.round(v * _GRAM_Q).cast("long"),
        )
        rows = reparted.select(q.alias("__q"))
        last = F.size("__q") - F.lit(1)
        cells = F.flatten(
            F.transform(
                F.sequence(F.lit(0), last),
                lambda i: F.transform(
                    F.sequence(i, last),
                    lambda j: F.struct(
                        i.cast("int").alias("i"),
                        j.cast("int").alias("j"),
                        (F.get("__q", i) * F.get("__q", j)).alias("p"),
                    ),
                ),
            )
        )
        alt = (
            rows.select(F.explode(cells).alias("c"))
            .select("c.i", "c.j", "c.p")
            .groupBy("i", "j")
            .agg(F.sum("p").alias("dot_q"))
        )
        lhs = {(r["i"], r["j"]): r["dot_q"] for r in base.collect()}
        rhs = {(r["i"], r["j"]): r["dot_q"] for r in alt.collect()}
        assert lhs == rhs
    finally:
        reparted.unpersist()


# ----------------------------------------------------------------- ema ---


def _ema_model(rows):
    """Independent fold: rows = [(custkey, sort_key, cents)]."""
    by_key = defaultdict(list)
    for ck, sk, cents in rows:
        by_key[ck].append((sk, cents))
    out = {}
    for ck, seq in by_key.items():
        seq.sort()
        e = None
        for _, c in seq:
            e = c if e is None else (c + 3 * e) // 4
        out[ck] = (len(seq), e)
    return out


def test_ema_matches_python_fold_model(spark):
    got = {
        r["o_custkey"]: (r["n_orders"], r["ema_cents"])
        for r in ema_customer_spend(spark, SF_SMOKE).collect()
    }
    orders = pd.read_parquet(f"{SF_SMOKE}/orders.parquet")
    rows = [
        (
            int(r.o_custkey),
            (r.o_orderdate, int(r.o_orderkey)),
            int(round(float(r.o_totalprice) * 100)),
        )
        for r in orders.itertuples()
    ]
    assert got == _ema_model(rows)


def test_ema_known_sequence(spark):
    """Hand-checkable: 400, 800, 1200 cents in date order →
    e1=400, e2=(800+1200)//4=500, e3=(1200+1500)//4=675."""
    df = spark.createDataFrame(
        [
            (7, "2024-01-03", 103, 12.00),
            (7, "2024-01-01", 101, 4.00),
            (7, "2024-01-02", 102, 8.00),
        ],
        "o_custkey long, o_orderdate string, o_orderkey long, o_totalprice double",
    )
    import tempfile, os

    with tempfile.TemporaryDirectory() as td:
        sf = os.path.join(td)
        df.selectExpr(
            "o_custkey",
            "CAST(o_orderdate AS DATE) AS o_orderdate",
            "o_orderkey",
            "o_totalprice",
        ).write.parquet(os.path.join(sf, "orders.parquet"))
        got = ema_customer_spend(spark, sf).collect()
    assert len(got) == 1
    r = got[0]
    # e1=400; e2=(800+3*400)//4=500; e3=(1200+3*500)//4=675
    assert (r["o_custkey"], r["n_orders"], r["ema_cents"]) == (7, 3, 675)


# ---------------------------------------------------------------- bm25 ---


def _bm25_model(texts_by_doc):
    """Independent scorer with math.log over Counter term stats."""
    import re

    tok_re = re.compile(r"[^a-z0-9]+")
    toks = {
        d: [t for t in tok_re.split(txt.lower()) if t]
        for d, txt in texts_by_doc.items()
    }
    n_docs = len(toks)
    sum_dl = sum(len(v) for v in toks.values())
    avgdl = sum_dl / n_docs
    dfreq = Counter()
    tf = {}
    for d, ts in toks.items():
        c = Counter(t for t in ts if t in _BM25_TERMS)
        tf[d] = c
        for term in c:
            dfreq[term] += 1
    scores = {}
    for d, c in tf.items():
        if not c:
            continue
        dl = len(toks[d])
        s = 0
        for term, f in c.items():
            idf = math.log(1.0 + (n_docs - dfreq[term] + 0.5) / (dfreq[term] + 0.5))
            w = idf * (f * 2.2) / (f + 1.2 * (0.25 + (0.75 * dl) / avgdl))
            s += int(round(w * 1e6))
        scores[d] = s
    ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
    return ranked[:_BM25_K]


def test_bm25_matches_python_model(spark):
    got = [
        (r["doc_id"], r["score_micro"])
        for r in bm25_doc_ranking(spark, SF_SMOKE).collect()
    ]
    docs = pd.read_parquet(f"{SF_SMOKE}/documents.parquet")
    want = _bm25_model(dict(zip(docs["doc_id"].astype(int), docs["text"])))
    assert got == want


def test_bm25_rewards_term_density(spark):
    """A short doc saturated with query terms must outrank a long doc
    with a single occurrence (the length normalization b=0.75)."""
    import tempfile, os

    rows = [
        (1, "join vector stream join vector stream", "en", "s", 10),
        (2, "join " + "filler " * 200, "en", "s", 10),
        (3, "nothing relevant here at all", "en", "s", 10),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    with tempfile.TemporaryDirectory() as td:
        df.write.parquet(os.path.join(td, "documents.parquet"))
        got = bm25_doc_ranking(spark, td).collect()
    ids = [r["doc_id"] for r in got]
    assert ids[0] == 1 and 2 in ids and 3 not in ids


# ----------------------------------------------------------------- rrf ---


def test_hybrid_rrf_matches_python_fusion_model(spark):
    """Independent fusion: numpy cosine ranking + the math.log BM25
    model, fused with integer micro-RRF — no engine code shared."""
    from feature_generation_benchmark_spark.workloads.similarity import (
        _RRF_C,
        _RRF_K,
        _RRF_N,
        hybrid_search_rrf,
    )

    got = [
        (r["doc_id"], r["rrf_micro"], r["n_sources"])
        for r in hybrid_search_rrf(spark, SF_SMOKE).collect()
    ]

    emb = pd.read_parquet(f"{SF_SMOKE}/embeddings.parquet")
    V = np.stack([np.asarray(v, dtype=np.float64) for v in emb["embedding"]])
    ids = emb["vec_id"].astype(int).to_numpy()
    Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
    q = Vn[list(ids).index(0)]
    sims = np.round(Vn @ q, 6)
    order = sorted(
        (i for i in range(len(ids)) if ids[i] != 0),
        key=lambda i: (-sims[i], ids[i]),
    )[:_RRF_N]
    sem_rank = {int(ids[i]): r + 1 for r, i in enumerate(order)}

    docs = pd.read_parquet(f"{SF_SMOKE}/documents.parquet")
    # reuse the BM25 scorer model but rank to depth _RRF_N
    all_scores = dict(
        _bm25_model_full(dict(zip(docs["doc_id"].astype(int), docs["text"])))
    )
    lex_sorted = sorted(all_scores.items(), key=lambda kv: (-kv[1], kv[0]))
    lex_rank = {d: r + 1 for r, (d, _) in enumerate(lex_sorted[:_RRF_N])}

    fused = Counter()
    nsrc = Counter()
    for d, r in sem_rank.items():
        fused[d] += int(round(1e6 / (_RRF_C + r)))
        nsrc[d] += 1
    for d, r in lex_rank.items():
        fused[d] += int(round(1e6 / (_RRF_C + r)))
        nsrc[d] += 1
    want = sorted(
        ((d, s, nsrc[d]) for d, s in fused.items()),
        key=lambda t: (-t[1], t[0]),
    )[:_RRF_K]
    assert got == want
    assert any(n == 2 for _, _, n in got)  # fusion actually fuses


def _bm25_model_full(texts_by_doc):
    """All per-doc BM25 micro-scores (unranked) — shared by the rrf test."""
    import re

    tok_re = re.compile(r"[^a-z0-9]+")
    toks = {
        d: [t for t in tok_re.split(txt.lower()) if t]
        for d, txt in texts_by_doc.items()
    }
    n_docs = len(toks)
    avgdl = sum(len(v) for v in toks.values()) / n_docs
    dfreq = Counter()
    tf = {}
    for d, ts in toks.items():
        c = Counter(t for t in ts if t in _BM25_TERMS)
        tf[d] = c
        for term in c:
            dfreq[term] += 1
    out = []
    for d, c in tf.items():
        if not c:
            continue
        dl = len(toks[d])
        s = 0
        for term, f in c.items():
            idf = math.log(1.0 + (n_docs - dfreq[term] + 0.5) / (dfreq[term] + 0.5))
            w = idf * (f * 2.2) / (f + 1.2 * (0.25 + (0.75 * dl) / avgdl))
            s += int(round(w * 1e6))
        out.append((d, s))
    return out


# ------------------------------------------------------- grouping sets ---


def test_grouping_sets_equals_union_of_plain_aggs(spark):
    """Cross-strategy equality: the one-Expand plan must match the naive
    union of the three separate aggregations it replaces."""
    from pyspark.sql import functions as F

    from feature_generation_benchmark_spark.workloads.relational import (
        _cents,
        grouping_sets_lineitem,
    )

    got = {
        (r["l_returnflag"], r["l_linestatus"], r["gid"]): (
            r["sum_qty"], r["sum_price_cents"], r["n_lines"],
        )
        for r in grouping_sets_lineitem(spark, SF_SMOKE).collect()
    }

    li = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet").select(
        "l_returnflag",
        "l_linestatus",
        F.col("l_quantity").alias("qty"),
        _cents("l_extendedprice").alias("price_cents"),
    )

    def agg(df):
        return df.agg(
            F.sum("qty").alias("sq"),
            F.sum("price_cents").alias("sp"),
            F.count(F.lit(1)).alias("n"),
        )

    want = {}
    for r in agg(li.groupBy("l_returnflag", "l_linestatus")).collect():
        want[(r["l_returnflag"], r["l_linestatus"], 0)] = (
            r["sq"], r["sp"], r["n"],
        )
    for r in agg(li.groupBy("l_linestatus")).collect():
        want[(None, r["l_linestatus"], 2)] = (r["sq"], r["sp"], r["n"])
    t = agg(li).collect()[0]
    want[(None, None, 3)] = (t["sq"], t["sp"], t["n"])
    assert got == want


# ------------------------------------------------------------------ hll ---


def test_hll_rollup_matches_single_pass(spark):
    """HLL register updates are idempotent maxes, so merging day-grain
    sketches must equal the one-level sketch over all events EXACTLY,
    and land within 5% of the exact distinct count."""
    from pyspark.sql import functions as F

    from feature_generation_benchmark_spark.sources.testdata import (
        load_table,
    )
    from feature_generation_benchmark_spark.workloads.relational import (
        hll_users_sketch_rollup,
    )

    got = {
        r["event_type"]: (r["n_days"], r["est_users"])
        for r in hll_users_sketch_rollup(spark, SF_SMOKE).collect()
    }
    ev = load_table(spark, SF_SMOKE, "events")
    one = {
        r["event_type"]: r["e"]
        for r in ev.groupBy("event_type")
        .agg(
            F.round(F.hll_sketch_estimate(F.hll_sketch_agg("user_id")))
            .cast("long")
            .alias("e")
        )
        .collect()
    }
    exact = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert set(got) == set(one) == set(exact) and got
    for t, (n_days, est) in got.items():
        assert n_days > 1  # the rollup actually merged multiple sketches
        assert est == one[t]  # two-level merge == one-level sketch
        assert abs(est - exact[t]) <= max(1, round(0.05 * exact[t]))
