"""Property nets for the r3b text operators: random token-list corpora
through top_ngram_coverage and dedup_chunk_exact vs independent Python
models (collections.Counter / dict counting)."""

from __future__ import annotations

from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from tests._budget import examples

from feature_generation_benchmark_spark.workloads.dedup import (
    _DEDUP_CHUNK_TOKENS,
    dedup_chunk_exact,
)
from feature_generation_benchmark_spark.workloads.text import (
    _TOP2_MAX,
    _TOP3_MAX,
    top_ngram_coverage,
)

_SETTINGS = dict(
    max_examples=examples(6),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

#: Tiny vocabulary so n-gram repeats and cross-doc chunk dupes occur.
_WORDS = ["aa", "bb", "cc", "dd"]


@st.composite
def corpora(draw):
    n_docs = draw(st.integers(min_value=1, max_value=5))
    return [
        draw(
            st.lists(
                st.sampled_from(_WORDS), min_size=0, max_size=12
            )
        )
        for _ in range(n_docs)
    ]


def _write(spark, tmp_path_factory, corpus):
    from tests.conftest import write_docs_dir

    return write_docs_dir(
        spark,
        tmp_path_factory,
        [(i, " ".join(toks)) for i, toks in enumerate(corpus)],
        name="prop_text",
    )


@given(corpus=corpora())
@settings(**_SETTINGS)
def test_top_ngram_matches_counter_model(spark, tmp_path_factory, corpus):
    d = _write(spark, tmp_path_factory, corpus)
    out = {r["doc_id"]: r for r in top_ngram_coverage(spark, d).collect()}
    for i, toks in enumerate(corpus):
        if len(toks) < 2:
            assert i not in out
            continue
        r = out[i]
        top2 = max(
            Counter(
                " ".join(toks[j : j + 2]) for j in range(len(toks) - 1)
            ).values()
        )
        f2 = 2 * top2 / len(toks)
        assert abs(r["top2gram_frac"] - f2) < 1e-12
        if len(toks) >= 3:
            top3 = max(
                Counter(
                    " ".join(toks[j : j + 3])
                    for j in range(len(toks) - 2)
                ).values()
            )
            f3 = 3 * top3 / len(toks)
            assert abs(r["top3gram_frac"] - f3) < 1e-12
            expect_flag = f2 > _TOP2_MAX or f3 > _TOP3_MAX
        else:
            assert r["top3gram_frac"] is None
            expect_flag = f2 > _TOP2_MAX
        assert r["repetitive"] is expect_flag


@given(corpus=corpora())
@settings(**_SETTINGS)
def test_chunk_dedup_matches_counter_model(spark, tmp_path_factory, corpus):
    d = _write(spark, tmp_path_factory, corpus)
    out = {r["doc_id"]: r for r in dedup_chunk_exact(spark, d).collect()}
    w = _DEDUP_CHUNK_TOKENS
    chunks_per_doc = {
        i: [
            " ".join(toks[s : s + w]) for s in range(0, len(toks), w)
        ]
        for i, toks in enumerate(corpus)
        if toks
    }
    counts = Counter(
        c for chunks in chunks_per_doc.values() for c in chunks
    )
    assert set(out) == set(chunks_per_doc)
    for i, chunks in chunks_per_doc.items():
        dup = sum(1 for c in chunks if counts[c] > 1)
        r = out[i]
        assert r["n_chunks"] == len(chunks)
        assert r["dup_chunks"] == dup
        assert r["keep"] is (dup / len(chunks) <= 0.5)
