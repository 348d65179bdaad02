"""Unit tests for the text-analysis expression library."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from feature_generation_benchmark_spark.functions.textfns import (
    bpe_token_count,
    fingerprint_md5,
    lang_predict,
    normalize_text,
    token_count,
    tokens,
    word_ngrams,
)


@pytest.fixture(scope="module")
def df(spark):
    rows = [
        (1, "The quick, brown fox!  Jumps 42 times."),
        (2, "der hund und die katze sind mit dem ball auf der wiese"),
        (3, "le chat et le chien sont dans le jardin pour une heure"),
        (4, ""),
        (5, "xyz"),
    ]
    return spark.createDataFrame(rows, "id long, text string")


def _one(df, col, id_):
    return df.select("id", col.alias("v")).where(F.col("id") == id_).first()["v"]


def test_tokens_and_counts(spark, df):
    assert _one(df, tokens("text"), 1) == [
        "the", "quick", "brown", "fox", "jumps", "42", "times",
    ]
    assert _one(df, token_count("text"), 1) == 7
    assert _one(df, token_count("text"), 4) == 0
    # bpe-ish units: 7 word/number runs + "," "!" "." = 10
    assert _one(df, bpe_token_count("text"), 1) == 10


def test_word_ngrams(spark, df):
    grams = _one(df, word_ngrams(tokens("text"), 3), 1)
    assert grams[0] == "the quick brown"
    assert grams[-1] == "jumps 42 times"
    assert len(grams) == 5
    assert _one(df, word_ngrams(tokens("text"), 3), 5) == []  # < n tokens


def test_normalize_and_fingerprint(spark, df):
    assert _one(df, normalize_text("text"), 1) == (
        "the quick brown fox jumps 42 times"
    )
    fp = df.select(fingerprint_md5("text").alias("f")).collect()
    assert all(len(r["f"]) == 32 for r in fp)
    # normalization-insensitive: punctuation/caps/extra-space variants match
    two = spark.createDataFrame(
        [(1, "Hello,   World!"), (2, "hello world")], "id long, text string"
    )
    fps = [r["f"] for r in two.select(fingerprint_md5("text").alias("f")).collect()]
    assert fps[0] == fps[1]


def test_lang_predict(spark, df):
    got = {
        r["id"]: r["v"]
        for r in df.select("id", lang_predict(tokens("text")).alias("v")).collect()
    }
    assert got[1] == "en"
    assert got[2] == "de"
    assert got[3] == "fr"
    assert got[4] == "und"
    assert got[5] == "und"


def test_text_quality_degenerate_docs_dont_crash(spark, tmp_path_factory):
    """Empty and punctuation-only documents have zero tokens — under
    ANSI mode the unguarded long/long ratio divisions used to raise
    DIVIDE_BY_ZERO (same class the doc_repetition net caught). They must
    instead yield NULL ratios and passes_quality=False."""
    from feature_generation_benchmark_spark.workloads.text import (
        text_quality,
    )

    d = tmp_path_factory.mktemp("degen_docs")
    spark.createDataFrame(
        [
            (0, "", "en", "s0", 0),
            (1, "!!! ??? ...", "en", "s0", 11),
            (2, "some real words in here now", "en", "s0", 27),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.mode("overwrite").parquet(
        str(d / "documents.parquet")
    )
    rows = {r["doc_id"]: r for r in text_quality(spark, str(d)).collect()}
    for i in (0, 1):
        assert rows[i]["n_tokens"] == 0
        assert rows[i]["avg_token_len"] is None
        assert rows[i]["stopword_ratio"] is None
        assert rows[i]["passes_quality"] is False
    assert rows[2]["avg_token_len"] is not None


def test_quality_stratified_mixture_skips_zero_token_docs(
    spark, tmp_path_factory
):
    """The curation mixture excludes zero-token docs (no trainable
    tokens) instead of crashing on the q_score division."""
    from feature_generation_benchmark_spark.workloads.curation import (
        quality_stratified_mixture,
    )

    d = tmp_path_factory.mktemp("degen_mixture")
    rows = [(0, "...", "en", "s0", 3)] + [
        (i, f"word{i} alpha beta gamma delta", "en", "s0", 25)
        for i in range(1, 9)
    ]
    spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.mode("overwrite").parquet(
        str(d / "documents.parquet")
    )
    out = quality_stratified_mixture(spark, str(d)).collect()
    assert sum(r["n_docs"] for r in out) == 8  # doc 0 excluded, no crash


def _bpe_exact(word: str, merges) -> list[str]:
    """Textbook BPE application: apply each merge in rank order, replacing
    every (a, b) adjacency left-to-right."""
    sym = list(word)
    for a, b in merges:
        out, i = [], 0
        while i < len(sym):
            if i < len(sym) - 1 and sym[i] == a and sym[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(sym[i])
                i += 1
        sym = out
    return sym


def test_bpe_apply_matches_textbook_bpe(spark, tmp_path_factory):
    """The nested-replace merge chain equals textbook BPE application on
    the corpus vocabulary (plus overlap/degenerate probes), per document."""
    import re

    from feature_generation_benchmark_spark.workloads.text import (
        BPE_MERGES,
        bpe_apply_merges,
    )

    vocab = [
        "join", "hash", "row", "batch", "scan", "column", "customer",
        "filter", "merge", "sort", "stream", "window", "table", "value",
        "query", "part", "order", "group", "small", "slow", "fast", "key",
        "agg", "data", "line", "spark", "vector", "big", "the", "a",
        # overlap probes: repeated merge-pair runs ("erer", "tata") and a
        # multi-merge cascade word ("hashhash" → h+ash twice)
        "ererer", "tatata", "hashhash", "rowrow", "joinjoin",
    ]
    docs = [
        (0, " ".join(vocab), "en", "s0"),
        (1, "", "en", "s0"),          # empty text → 0 symbols, NULL ratio
        (2, "!!! ???", "en", "s0"),   # no alnum chars → same
        (3, "er er er", "en", "s0"),  # single-merge words
    ]
    d = tmp_path_factory.mktemp("bpe_apply")
    spark.createDataFrame(
        [(i, t, lang, src, len(t)) for i, t, lang, src in docs],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.mode("overwrite").parquet(
        str(d / "documents.parquet")
    )
    rows = {r["doc_id"]: r for r in bpe_apply_merges(spark, str(d)).collect()}
    for i, text, _, _ in docs:
        words = re.findall(r"[a-z0-9]+", text.lower())
        exact = [s for w in words for s in _bpe_exact(w, BPE_MERGES)]
        r = rows[i]
        assert r["n_words"] == len(words)
        assert r["n_bpe_symbols"] == len(exact), (text, exact)
        assert r["n_alnum_chars"] == sum(len(w) for w in words)
        if exact:
            assert r["chars_per_symbol"] == pytest.approx(
                sum(len(w) for w in words) / len(exact)
            )
        else:
            assert r["chars_per_symbol"] is None
