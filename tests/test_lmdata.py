"""Unit tests for the LM-data pipeline operators (workloads/lmdata.py):
textbook-equivalence for the BPE trainer, the tertile-partition contract
for CCNet bucketing, rank-ordering for DSIR weights, and an exhaustive
micro-mirror for snapshot_diff. Oracle parity at sf0.001 is covered by
test_oracle_parity.py's auto-parametrization."""

from __future__ import annotations

import re
import sys
from collections import Counter

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")

from feature_generation_benchmark_spark.functions.textfns import (  # noqa: E402
    tokens,
)
from feature_generation_benchmark_spark.sources.testdata import (  # noqa: E402
    load_table,
)
from feature_generation_benchmark_spark.workloads.lmdata import (  # noqa: E402
    _BPE_ROUNDS,
    _BPE_VOCAB,
    _SNAP_ADD_OFFSET,
    bpe_train_merges,
    ccnet_perplexity_buckets,
    dsir_importance_weights,
    snapshot_diff,
)
from tests.conftest import SF_SMOKE  # noqa: E402


def _write_docs(spark, tmp_path_factory, rows, name):
    """rows: (doc_id, text, lang). Writes a documents-shaped parquet dir."""
    d = tmp_path_factory.mktemp(name)
    spark.createDataFrame(
        [(i, t, lang, "src", len(t)) for i, t, lang in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.mode("overwrite").parquet(
        str(d / "documents.parquet")
    )
    return str(d)


# ---------------------------------------------------------------------------
# BPE trainer vs textbook reference
# ---------------------------------------------------------------------------


def _textbook_bpe_train(texts, m, k):
    """Sennrich alg. 1 on the frequency-truncated word vocab; returns
    [(rank, a, b, merged, weighted_count)]."""
    wc = Counter(w for t in texts for w in re.findall(r"[a-z0-9]+", t.lower()))
    vocab = sorted(wc.items(), key=lambda kv: (-kv[1], kv[0]))[:m]
    words = [(list(w), c) for w, c in vocab]
    rules = []
    for rank in range(1, k + 1):
        pc: Counter = Counter()
        for sym, c in words:
            for i in range(len(sym) - 1):
                pc[(sym[i], sym[i + 1])] += c
        if not pc:
            break
        (a, b), cnt = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        rules.append((rank, a, b, a + b, cnt))
        new_words = []
        for sym, c in words:
            out, i = [], 0
            while i < len(sym):
                if i < len(sym) - 1 and sym[i] == a and sym[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            new_words.append((out, c))
        words = new_words
    return rules


def test_bpe_train_matches_textbook_trainer(spark, tmp_path_factory):
    texts = [
        "lower lower lower newest newest newest newest widest widest",
        "low low low low lowest lowest newer newer newer wider",
        "er er er est est new new wid wid lo lo",
    ]
    d = _write_docs(
        spark,
        tmp_path_factory,
        [(i, t, "en") for i, t in enumerate(texts)],
        "bpe_train",
    )
    got = [
        (r["merge_rank"], r["sym_a"], r["sym_b"], r["merged"], r["pair_count"])
        for r in sorted(
            bpe_train_merges(spark, str(d)).collect(),
            key=lambda r: r["merge_rank"],
        )
    ]
    want = _textbook_bpe_train(texts, _BPE_VOCAB, _BPE_ROUNDS)
    assert got == want


def test_bpe_train_smoke_corpus_is_monotone_and_consistent(spark):
    """On the real smoke corpus: ranks are 1..K, merged = a||b, and each
    rule's pair_count is positive. (Counts need not be monotone non-
    increasing across ranks — a merge can CREATE a more frequent pair —
    but rank-1 must be the global max of the initial pair table.)"""
    rows = sorted(
        bpe_train_merges(spark, SF_SMOKE).collect(),
        key=lambda r: r["merge_rank"],
    )
    assert [r["merge_rank"] for r in rows] == list(range(1, _BPE_ROUNDS + 1))
    for r in rows:
        assert r["merged"] == r["sym_a"] + r["sym_b"]
        assert r["pair_count"] > 0


# ---------------------------------------------------------------------------
# CCNet bucketing
# ---------------------------------------------------------------------------


def test_ccnet_buckets_partition_scored_docs(spark):
    out = {r["bucket"]: r for r in
           ccnet_perplexity_buckets(spark, SF_SMOKE).collect()}
    docs = load_table(spark, SF_SMOKE, "documents")
    scorable = docs.select(tokens("text").alias("t")).filter(
        F.size("t") >= 2
    ).count()
    nt = sum(r["n_docs"] for r in out.values())
    assert nt == scorable
    assert set(out) == {"head", "middle", "tail"}
    # Bin-edge boundaries: buckets are disjoint score ranges in order.
    assert out["head"]["max_nll_e6"] < out["middle"]["min_nll_e6"]
    assert out["middle"]["max_nll_e6"] < out["tail"]["min_nll_e6"]
    # Cumulative-crossing contract: head covers ≥1/3, head+middle ≥2/3.
    assert 3 * out["head"]["n_docs"] >= nt
    assert 3 * (out["head"]["n_docs"] + out["middle"]["n_docs"]) >= 2 * nt
    # avg ordering follows the score ranges.
    assert out["head"]["avg_nll"] < out["middle"]["avg_nll"]
    assert out["middle"]["avg_nll"] < out["tail"]["avg_nll"]


# ---------------------------------------------------------------------------
# DSIR importance weights
# ---------------------------------------------------------------------------


def test_dsir_ranks_target_distribution_docs_first(spark, tmp_path_factory):
    """Docs written in the target (en) token distribution must outweigh
    docs written in the out-of-target distribution, and a half-half doc
    must land between them."""
    en_text = "alpha beta gamma delta alpha beta gamma delta"
    de_text = "zulu yankee xray whiskey zulu yankee xray whiskey"
    mix_text = "alpha beta gamma delta zulu yankee xray whiskey"
    rows = (
        [(i, en_text, "en") for i in range(4)]
        + [(10 + i, de_text, "de") for i in range(4)]
        + [(20, mix_text, "de")]
    )
    d = _write_docs(spark, tmp_path_factory, rows, "dsir")
    out = {r["doc_id"]: r for r in
           dsir_importance_weights(spark, str(d)).collect()}
    assert len(out) == 9  # < top-K, so every doc appears
    w_en = out[0]["weight_e6"]
    w_de = out[10]["weight_e6"]
    w_mix = out[20]["weight_e6"]
    assert w_en > w_mix > w_de
    # Same text ⇒ same weight regardless of the doc's own label (weights
    # are a token-distribution property; the label only shaped the model).
    assert all(out[i]["weight_e6"] == w_en for i in range(4))
    assert all(out[10 + i]["weight_e6"] == w_de for i in range(4))
    assert out[0]["log_weight"] == pytest.approx(w_en / 1e6)


# ---------------------------------------------------------------------------
# snapshot diff
# ---------------------------------------------------------------------------


def test_snapshot_diff_matches_python_mirror(spark, tmp_path_factory):
    ids = list(range(0, 40))
    rows = [(i, f"text of document {i}", "en") for i in ids]
    d = _write_docs(spark, tmp_path_factory, rows, "snapdiff")
    out = {r["status"]: r for r in snapshot_diff(spark, str(d)).collect()}

    exp = Counter()
    deltas: Counter = Counter()
    keys: dict[str, list[int]] = {}
    for i in ids:
        if i % 11 == 3:
            st, delta = "removed", -len(f"text of document {i}")
        elif i % 7 == 0:
            st, delta = "changed", len(" rev2")
        else:
            st, delta = "unchanged", 0
        exp[st] += 1
        deltas[st] += delta
        keys.setdefault(st, []).append(i)
        if i % 13 == 5:
            exp["added"] += 1
            deltas["added"] += len(f"text of document {i}")
            keys.setdefault("added", []).append(i + _SNAP_ADD_OFFSET)

    assert {s: r["n_docs"] for s, r in out.items()} == dict(exp)
    for st, r in out.items():
        assert r["chars_delta"] == deltas[st], st
        assert r["min_doc_id"] == min(keys[st])
        assert r["max_doc_id"] == max(keys[st])
