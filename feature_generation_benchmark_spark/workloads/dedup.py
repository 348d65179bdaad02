"""Deduplication workload on ``documents`` / ``embeddings`` (extension
operators: exact, n-gram Jaccard, MinHash-LSH, SimHash, embedding cosine).

Exact dedup, pairwise Jaccard and cosine near-dup are oracle-checked; the
hash-based approximations (MinHash/SimHash — xxhash64 has no DuckDB twin)
get rows-only driver checks plus planted-duplicate ground-truth tests in
``tests/test_dedup.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from feature_generation_benchmark_spark.operators.dedup import (
    exact_dedup,
    minhash_dedup_pairs,
    ngram_jaccard_pairs,
    simhash_dup_pairs,
)
from feature_generation_benchmark_spark.operators.similarity import (
    cosine_dup_pairs_blocked,
)
from feature_generation_benchmark_spark.sources.testdata import load_table
from feature_generation_benchmark_spark.workloads import QueryDef

_JACCARD_T = 0.05
_COS_T = 0.4


def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    return exact_dedup(load_table(spark, sf_dir, "documents"), "doc_id", "text")


_EXACT_ORACLE = """
WITH fp AS (
  SELECT doc_id,
         md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')))
           AS fingerprint
  FROM documents
)
SELECT fingerprint, min(doc_id) AS doc_id,
       CAST(count(*) AS BIGINT) AS n_duplicates
FROM fp GROUP BY fingerprint
"""


def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    # prefix_filter off: the synthetic corpus has near-uniform shingle
    # frequencies (no hot shingles), so the naive inverted-index join has
    # no blowup to prune and the prefix pass's extra shuffles just cost.
    # Real corpora are Zipfian — keep the operator's scale-safe default on.
    return ngram_jaccard_pairs(
        load_table(spark, sf_dir, "documents"),
        "doc_id",
        "text",
        n=3,
        threshold=_JACCARD_T,
        prefix_filter=False,
    )


_JACCARD_ORACLE = f"""
WITH t AS (
  SELECT doc_id,
    list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> '')
      AS toks
  FROM documents
),
sh AS (
  SELECT doc_id, unnest(list_distinct(
    CASE WHEN len(toks) >= 3 THEN
      list_transform(range(1, len(toks) - 1),
                     i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
    ELSE [] END)) AS shingle
  FROM t
),
sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
common AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS common
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT id_a, id_b, CAST(common AS BIGINT) AS common,
       CAST(common AS DOUBLE) / (na.n + nb.n - common) AS jaccard
FROM common
JOIN sizes na ON na.doc_id = id_a
JOIN sizes nb ON nb.doc_id = id_b
WHERE CAST(common AS DOUBLE) / (na.n + nb.n - common) >= {_JACCARD_T}
"""


def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    return minhash_dedup_pairs(
        load_table(spark, sf_dir, "documents"),
        "doc_id",
        "text",
        n=3,
        num_perm=64,
        bands=16,
        threshold=_JACCARD_T,
    )


def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return simhash_dup_pairs(
        load_table(spark, sf_dir, "documents"), "doc_id", "text", max_hamming=3
    )


def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    return cosine_dup_pairs_blocked(
        load_table(spark, sf_dir, "embeddings"),
        "vec_id",
        "embedding",
        threshold=_COS_T,
    )


_COSINE_ORACLE = f"""
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       round(list_cosine_similarity(a.v, b.v), 6) AS cos_sim
FROM e a JOIN e b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.v, b.v) >= {_COS_T}
"""


QUERIES = [
    QueryDef("dedup_exact", dedup_exact, _EXACT_ORACLE,
             "exact dedup via md5 fingerprint group-by"),
    QueryDef("dedup_ngram_jaccard", dedup_ngram_jaccard, _JACCARD_ORACLE,
             "exact pairwise Jaccard via shingle inverted index"),
    QueryDef("dedup_minhash_lsh", dedup_minhash_lsh, None,
             "MinHash signatures + banded LSH candidates + exact verify"),
    QueryDef("dedup_simhash", dedup_simhash, None,
             "SimHash near-dup pairs (hamming <= 3 via 16-bit bands)"),
    QueryDef("dedup_embedding_cosine", dedup_embedding_cosine, _COSINE_ORACLE,
             "embedding cosine near-duplicate pairs"),
]
