"""Ground-truth tests for the feature-engineering workload (TF-IDF,
feature hashing, heavy hitters, min-max scaling, deciles) and the
sentence-split UDTF, on crafted micro-frames."""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from feature_generation_benchmark_spark.functions.udtfs import (
    SentenceSplit,
    register_udtfs,
)
from feature_generation_benchmark_spark.workloads import features_eng

SF_SMOKE = "/root/testdata/sf0.001"


def _docs_parquet(spark, tmp_path_factory, texts):
    path = str(tmp_path_factory.mktemp("fe_docs") / "dir")
    spark.createDataFrame(
        [(i, t, "en", "web", len(t)) for i, t in enumerate(texts)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(f"{path}/documents.parquet")
    return path


def test_tfidf_scores_and_ranking(spark, tmp_path_factory):
    # "rare" appears in 1 of 2 docs; "common" in both (idf = ln(1) = 0)
    path = _docs_parquet(
        spark, tmp_path_factory, ["common rare rare", "common solo"]
    )
    rows = features_eng.tfidf_top_terms(spark, path).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    d0 = sorted(by_doc[0], key=lambda r: r.rank)
    assert d0[0].term == "rare"
    assert d0[0].score_e6 == round(2 * math.log(2 / 1) * 1e6)
    assert d0[1].term == "common" and d0[1].score_e6 == 0
    d1 = sorted(by_doc[1], key=lambda r: r.rank)
    assert [r.term for r in d1] == ["solo", "common"]
    assert d1[0].score_e6 == round(1 * math.log(2 / 1) * 1e6)


def test_feature_hash_bucket_matches_md5(spark, tmp_path_factory):
    path = _docs_parquet(spark, tmp_path_factory, ["hello hello world"])
    rows = features_eng.feature_hash_buckets(spark, path).collect()
    expect = {
        "hello": int(hashlib.md5(b"hello").hexdigest()[:8], 16) % 64,
        "world": int(hashlib.md5(b"world").hexdigest()[:8], 16) % 64,
    }
    got = {(r.bucket, r.n) for r in rows}
    assert got == {(expect["hello"], 2), (expect["world"], 1)}


def test_heavy_hitters_rank_and_tiebreak(spark):
    out = features_eng.heavy_hitters(spark, SF_SMOKE)
    rows = out.collect()
    # per type: ranks are 1..k, counts non-increasing, user breaks ties
    by_type = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append(r)
    for rs in by_type.values():
        rs.sort(key=lambda r: r.rank)
        assert [r.rank for r in rs] == list(range(1, len(rs) + 1))
        for a, b in zip(rs, rs[1:]):
            assert (a.n, -a.user_id) >= (b.n, -b.user_id)
            if a.n == b.n:
                assert a.user_id < b.user_id


def test_minmax_norm_bounds_and_extremes(spark):
    rows = features_eng.embedding_minmax_norm(spark, SF_SMOKE).collect()
    assert rows
    by_dim = {}
    for r in rows:
        by_dim.setdefault(r.dim, []).append(r.norm)
        assert -1e-12 <= r.norm <= 1 + 1e-12
    for vals in by_dim.values():
        assert min(vals) == 0.0 and max(vals) == 1.0


def test_value_deciles_partition_rows_evenly(spark):
    rows = features_eng.value_deciles(spark, SF_SMOKE).collect()
    by_type = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append(r)
    for rs in by_type.values():
        assert sorted(r.decile for r in rs) == list(range(1, 11))
        sizes = [r.n for r in rs]
        assert max(sizes) - min(sizes) <= 1  # ntile's evenness contract
        rs.sort(key=lambda r: r.decile)
        for a, b in zip(rs, rs[1:]):
            assert a.hi_cents <= b.lo_cents  # deciles are value-ordered


def test_sentence_split_udtf_rules():
    got = list(SentenceSplit().eval("Hi there! How are you?? ...  Ok."))
    assert got == [
        (1, "Hi there", 2),
        (2, "How are you", 3),
        (3, "Ok", 1),
    ]
    assert list(SentenceSplit().eval(None)) == []
    assert list(SentenceSplit().eval("!!!")) == []


def test_sentence_split_lateral_join(spark):
    register_udtfs(spark)
    df = spark.createDataFrame([(1, "a b. c!")], "doc_id long, text string")
    rows = spark.sql(
        "SELECT d.doc_id, s.sent_idx, s.sentence, s.n_tokens "
        "FROM {d} d, LATERAL sentence_split(d.text) s ORDER BY s.sent_idx",
        d=df,
    ).collect()
    assert [(r.sent_idx, r.sentence, r.n_tokens) for r in rows] == [
        (1, "a b", 2),
        (2, "c", 1),
    ]


def test_sentence_split_arrow_equals_pickled(spark):
    """The Arrow-optimized UDTF evaluation (the registered default) must
    emit exactly the rows of the pickled row-at-a-time path."""
    df = spark.createDataFrame(
        [(1, "a b. c!"), (2, None), (3, "!!!"), (4, "x? y z.  w")],
        "doc_id long, text string",
    )
    q = (
        "SELECT d.doc_id, s.sent_idx, s.sentence, s.n_tokens "
        "FROM {d} d, LATERAL sentence_split(d.text) s "
        "ORDER BY d.doc_id, s.sent_idx"
    )
    assert register_udtfs(spark, use_arrow=True) == "arrow", (
        "Arrow UDTF evaluation silently fell back to the pickled path"
    )
    arrow_rows = [tuple(r) for r in spark.sql(q, d=df).collect()]
    assert register_udtfs(spark, use_arrow=False) == "pickled"
    pickled_rows = [tuple(r) for r in spark.sql(q, d=df).collect()]
    # restore the engine default registration (PICKLED — the measured
    # faster path for per-row-yield UDTFs, see register_udtfs docstring)
    assert register_udtfs(spark) == "pickled"
    assert arrow_rows == pickled_rows
    assert len(arrow_rows) == 5
