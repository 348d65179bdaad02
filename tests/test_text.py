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
