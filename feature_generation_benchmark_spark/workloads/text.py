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


#: Gopher-style quality-gate bounds (Rae et al. 2021 §A1.1, adapted to the
#: synthetic corpus' 10-99-token documents so both outcomes occur).
QUALITY_BOUNDS = {
    "min_tokens": 20,
    "max_tokens": 100_000,
    "min_avg_token_len": 2.0,
    "max_avg_token_len": 10.0,
    "min_stopword_ratio": 0.03,
    "max_dup_token_ratio": 0.7,
    "max_digit_char_ratio": 0.3,
}

#: Union of all per-language stopword lists — the language-agnostic
#: "natural language-ness" signal for the quality gate.
_ALL_STOPWORDS = tuple(
    dict.fromkeys(w for ws in LANG_STOPWORDS.values() for w in ws)
)


def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document quality signals + composite pass/fail gate. The token
    array is materialized in its own projection BEFORE the lambda-heavy
    stats select — higher-order functions re-evaluate argument expressions
    per element, so feeding them ``tokens(text)`` inline would re-split the
    text O(tokens) times (see spark-perf notes)."""
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select("doc_id", "text", tokens("text").alias("toks"))
    vocab = F.array(*[F.lit(w) for w in _ALL_STOPWORDS])
    n_tokens = F.size("toks").cast("long")
    n_chars = F.length("text").cast("long")
    token_len_sum = F.aggregate(
        F.transform("toks", lambda x: F.length(x)), F.lit(0), lambda a, x: a + x
    )
    stop_hits = F.size(F.filter("toks", lambda x: F.array_contains(vocab, x)))
    n_distinct = F.size(F.array_distinct("toks"))
    n_digits = char_class_count(F.col("text"), "[0-9]")
    b = QUALITY_BOUNDS
    stats = t.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        (token_len_sum / n_tokens).alias("avg_token_len"),
        (stop_hits / n_tokens).alias("stopword_ratio"),
        (F.lit(1.0) - n_distinct / n_tokens).alias("dup_token_ratio"),
        (n_digits / n_chars).alias("digit_char_ratio"),
    )
    passes = (
        F.col("n_tokens").between(b["min_tokens"], b["max_tokens"])
        & F.col("avg_token_len").between(
            b["min_avg_token_len"], b["max_avg_token_len"]
        )
        & (F.col("stopword_ratio") >= b["min_stopword_ratio"])
        & (F.col("dup_token_ratio") <= b["max_dup_token_ratio"])
        & (F.col("digit_char_ratio") <= b["max_digit_char_ratio"])
    )
    return stats.withColumn("passes_quality", passes)


def _quality_oracle() -> str:
    b = QUALITY_BOUNDS
    vocab = ", ".join(f"'{w}'" for w in _ALL_STOPWORDS)
    return f"""
WITH t AS (
  SELECT doc_id, text, {_TOKS_SQL} AS toks FROM documents
),
s AS (
  SELECT doc_id,
    CAST(len(toks) AS BIGINT) AS n_tokens,
    CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE)
      / len(toks) AS avg_token_len,
    CAST(len(list_filter(toks, x -> list_contains([{vocab}], x)))
      AS DOUBLE) / len(toks) AS stopword_ratio,
    1.0 - CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks)
      AS dup_token_ratio,
    CAST(len(regexp_extract_all(text, '[0-9]')) AS DOUBLE) / length(text)
      AS digit_char_ratio
  FROM t
)
SELECT *,
  (n_tokens BETWEEN {b["min_tokens"]} AND {b["max_tokens"]})
  AND (avg_token_len BETWEEN {b["min_avg_token_len"]}
       AND {b["max_avg_token_len"]})
  AND stopword_ratio >= {b["min_stopword_ratio"]}
  AND dup_token_ratio <= {b["max_dup_token_ratio"]}
  AND digit_char_ratio <= {b["max_digit_char_ratio"]} AS passes_quality
FROM s
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
    QueryDef("text_quality", text_quality, _quality_oracle(),
             "Gopher-style quality signals + composite pass/fail gate"),
]


# --------------------------------------------------------------------------
# tokenizer-training corpus statistics (r3)
# --------------------------------------------------------------------------

_VOCAB_K = 25  # top tokens per language
_PAIR_K = 50  # top adjacent BPE-unit pairs corpus-wide


def vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language vocabulary head: top ``_VOCAB_K`` tokens by frequency
    (ties broken by token text) — the corpus artifact tokenizer training
    starts from. Explode → count → per-language top-k window; at 100 TB
    the count is the only full shuffle and combines map-side (token
    cardinality ≪ corpus size)."""
    docs = load_table(spark, sf_dir, "documents")
    counts = (
        docs.select("lang", F.explode(tokens("text")).alias("token"))
        .groupBy("lang", "token")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("lang").orderBy(F.col("n").desc(), F.col("token"))
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _VOCAB_K)
        .select("lang", "rank", "token", "n")
    )


_VOCAB_ORACLE = f"""
WITH toks AS (
  SELECT lang, unnest({_TOKS_SQL}) AS token FROM documents
),
c AS (
  SELECT lang, token, CAST(count(*) AS BIGINT) AS n
  FROM toks GROUP BY lang, token
)
SELECT lang, rank, token, n FROM (
  SELECT lang, token, n,
         row_number() OVER (PARTITION BY lang
                            ORDER BY n DESC, token) AS rank
  FROM c)
WHERE rank <= {_VOCAB_K}
"""


def bpe_pair_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adjacent BPE-unit pair frequencies — the statistic the first BPE
    merge iteration maximizes. Units follow ``BPE_TOKEN_RE`` (letter runs /
    digit runs / single punctuation). Pair explosion is a shuffle-free
    per-row flatMap; the pair count combines map-side; the global top-k is
    a sort of the (tiny) distinct-pair aggregate."""
    from feature_generation_benchmark_spark.functions.textfns import (
        BPE_TOKEN_RE,
    )

    docs = load_table(spark, sf_dir, "documents")
    units = docs.select(
        F.regexp_extract_all(
            F.lower(F.col("text")), F.lit(BPE_TOKEN_RE), F.lit(0)
        ).alias("u")
    ).filter(F.size("u") >= 2)
    pairs = units.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.size("u") - 2),
                lambda i: F.struct(
                    F.element_at(F.col("u"), i + 1).alias("a"),
                    F.element_at(F.col("u"), i + 2).alias("b"),
                ),
            )
        ).alias("p")
    ).select("p.a", "p.b")
    return (
        pairs.groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "a", "b")
        .limit(_PAIR_K)
    )


_BPE_UNITS_SQL = (
    "regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 ]')"
)

_PAIR_ORACLE = f"""
WITH u AS (
  SELECT {_BPE_UNITS_SQL} AS u FROM documents
  WHERE len({_BPE_UNITS_SQL}) >= 2
),
p AS (
  SELECT u[s] AS a, u[s + 1] AS b
  FROM (SELECT u, unnest(generate_series(1, len(u) - 1)) AS s FROM u)
)
SELECT a, b, CAST(count(*) AS BIGINT) AS n
FROM p GROUP BY a, b
ORDER BY n DESC, a, b LIMIT {_PAIR_K}
"""

QUERIES.append(
    QueryDef(
        "vocab_topk",
        vocab_topk,
        _VOCAB_ORACLE,
        "per-language top-k vocabulary (tokenizer-training head)",
    )
)
QUERIES.append(
    QueryDef(
        "bpe_pair_stats",
        bpe_pair_stats,
        _PAIR_ORACLE,
        "adjacent BPE-unit pair frequencies (first BPE merge statistic)",
    )
)
