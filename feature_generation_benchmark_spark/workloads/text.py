"""Text-analysis workload on the ``documents`` table (extension operators:
quality scoring, token counting, language ID, fingerprinting).

Oracle parity notes: the canonical tokenization (lower → split
``[^a-z0-9]+`` → drop empties) is expressed identically in Spark
higher-order functions and DuckDB list functions; all ratios are divisions
of exact integer counts (deterministic doubles).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from feature_generation_benchmark_spark.functions.textfns import (
    LANG_STOPWORDS,
    bpe_token_count,
    char_class_count,
    fingerprint_md5,
    lang_predict,
    lang_scores,
    rolling_fingerprint,
    token_count,
    tokens,
)
from feature_generation_benchmark_spark.sources.testdata import load_table
from feature_generation_benchmark_spark.workloads import QueryDef

_TOKS_SQL = (
    "list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '')"
)


def text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = tokens("text")
    n_tokens = token_count("text")
    token_len_sum = F.aggregate(
        F.transform(toks, lambda t: F.length(t)), F.lit(0), lambda a, x: a + x
    )
    n_chars = F.length("text")
    return docs.select(
        "doc_id",
        n_chars.cast("long").alias("n_chars"),
        n_tokens.cast("long").alias("n_tokens"),
        bpe_token_count("text").cast("long").alias("n_bpe_tokens"),
        char_class_count(F.lower(F.col("text")), r"[^a-z0-9\s]")
        .cast("long")
        .alias("n_punct"),
        char_class_count(F.col("text"), "[0-9]").cast("long").alias("n_digits"),
        F.when(n_tokens > 0, token_len_sum / n_tokens).alias("avg_token_len"),
        (
            char_class_count(F.lower(F.col("text")), r"[^a-z0-9\s]") / n_chars
        ).alias("punct_ratio"),
    )


_TEXT_STATS_ORACLE = f"""
WITH t AS (
  SELECT doc_id, text, {_TOKS_SQL} AS toks FROM documents
)
SELECT doc_id,
  CAST(length(text) AS BIGINT) AS n_chars,
  CAST(len(toks) AS BIGINT) AS n_tokens,
  CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 ]'))
       AS BIGINT) AS n_bpe_tokens,
  CAST(len(regexp_extract_all(lower(text), '[^a-z0-9\\s]')) AS BIGINT)
       AS n_punct,
  CAST(len(regexp_extract_all(text, '[0-9]')) AS BIGINT) AS n_digits,
  CASE WHEN len(toks) > 0 THEN
    CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE) / len(toks)
  END AS avg_token_len,
  CAST(len(regexp_extract_all(lower(text), '[^a-z0-9\\s]')) AS DOUBLE)
       / length(text) AS punct_ratio
FROM t
"""


def lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = tokens("text")
    scores = lang_scores(toks)
    return docs.select(
        "doc_id",
        *[scores[lang].cast("long").alias(f"score_{lang}") for lang in scores],
        lang_predict(toks).alias("lang_pred"),
    )


def _lang_oracle() -> str:
    score_items = []
    for lang, words in LANG_STOPWORDS.items():
        arr = ", ".join(f"'{w}'" for w in words)
        score_items.append(
            f"CAST(len(list_filter(toks, x -> list_contains([{arr}], x))) "
            f"AS BIGINT) AS score_{lang}"
        )
    langs = list(LANG_STOPWORDS)
    g = "greatest(" + ", ".join(f"score_{x}" for x in langs) + ")"
    case = f"CASE WHEN {g} = 0 THEN 'und' "
    for lang in langs[:-1]:
        case += f"WHEN score_{lang} = {g} THEN '{lang}' "
    case += f"ELSE '{langs[-1]}' END AS lang_pred"
    return f"""
WITH t AS (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents),
s AS (SELECT doc_id, {", ".join(score_items)} FROM t)
SELECT doc_id, {", ".join("score_" + x for x in langs)}, {case} FROM s
"""


def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        fingerprint_md5("text").alias("fingerprint"),
        token_count("text").cast("long").alias("n_tokens"),
        rolling_fingerprint(tokens("text")).alias("rolling_fp"),
    )


_FINGERPRINT_ORACLE = f"""
WITH t AS (SELECT doc_id, text, {_TOKS_SQL} AS toks FROM documents)
SELECT doc_id,
  md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')))
    AS fingerprint,
  CAST(len(toks) AS BIGINT) AS n_tokens,
  CAST(list_reduce(
    list_prepend(0, list_transform(
      toks, x -> unicode(x) * 1000 + length(x))),
    (h, v) -> (h * 31 + v) % 1000000007) AS BIGINT) AS rolling_fp
FROM t
"""


def lang_id_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion counts of predicted vs labeled language (the testdata's
    ``lang`` column is ground truth; zh has no stopword list → 'und')."""
    docs = load_table(spark, sf_dir, "documents")
    toks = tokens("text")
    return (
        docs.select("lang", lang_predict(toks).alias("lang_pred"))
        .groupBy("lang", "lang_pred")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


def _lang_accuracy_oracle() -> str:
    return f"""
WITH p AS ({_lang_oracle()})
SELECT d.lang, p.lang_pred, CAST(count(*) AS BIGINT) AS n_docs
FROM p JOIN documents d USING (doc_id)
GROUP BY d.lang, p.lang_pred
"""


QUERIES = [
    QueryDef("text_stats", text_stats, _TEXT_STATS_ORACLE,
             "token/char/punct/quality statistics per document"),
    QueryDef("lang_id", lang_id, _lang_oracle(),
             "stopword-overlap language identification"),
    QueryDef("lang_id_accuracy", lang_id_accuracy, _lang_accuracy_oracle(),
             "language-ID confusion counts vs labeled ground truth"),
    QueryDef("doc_fingerprint", doc_fingerprint, _FINGERPRINT_ORACLE,
             "md5 content fingerprint over normalized text"),
]
