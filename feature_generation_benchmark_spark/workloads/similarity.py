"""Similarity-search workload on ``embeddings`` (extension operators:
brute-force cosine top-k baseline; LSH and IVF approximate variants).

Brute force is oracle-checked against DuckDB ``list_cosine_similarity``
(cast to DOUBLE[] — DuckDB computes FLOAT[] inputs in float32, Spark in
double). LSH is approximate but DETERMINISTIC given its plan-literal
hyperplanes, so it carries a full oracle too (bucket ids recomputed from
dot-product signs in SQL). IVF stays rows-only (its centroid model comes
from a driver-side collect) — plus recall-vs-bruteforce assertions in
``tests/test_similarity.py`` for both approximate paths.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from feature_generation_benchmark_spark.operators.similarity import (
    brute_force_topk,
    ivf_topk,
    lsh_topk,
    random_hyperplanes,
)
from feature_generation_benchmark_spark.sources.testdata import load_table
from feature_generation_benchmark_spark.workloads import QueryDef

_N_QUERIES = 10
_K = 5


def _queries_and_corpus(spark: SparkSession, sf_dir: str):
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.filter(F.col("vec_id") < _N_QUERIES), emb


def ann_bruteforce_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    q, c = _queries_and_corpus(spark, sf_dir)
    return brute_force_topk(q, c, "vec_id", "embedding", k=_K)


_BRUTE_ORACLE = f"""
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
),
q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < {_N_QUERIES}),
scored AS (
  SELECT q.query_id, e.vec_id AS neighbor_id,
         list_cosine_similarity(q.qv, e.v) AS cos,
         row_number() OVER (
           PARTITION BY q.query_id
           ORDER BY list_cosine_similarity(q.qv, e.v) DESC, e.vec_id
         ) AS rn
  FROM q JOIN e ON e.vec_id <> q.query_id
)
SELECT query_id, neighbor_id, round(cos, 6) AS cos_sim
FROM scored WHERE rn <= {_K}
"""


def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    q, c = _queries_and_corpus(spark, sf_dir)
    return lsh_topk(q, c, "vec_id", "embedding", k=_K, dim=64, n_planes=8)


def _lsh_oracle() -> str:
    """DuckDB twin of the LSH plan. The hyperplanes are PLAN LITERALS
    (seeded NumPy, ``operators/similarity.py:random_hyperplanes``), so the
    oracle embeds the identical planes and recomputes bucket ids from
    dot-product signs — sign(dot(v, p)) is scale-invariant, so the raw
    vector substitutes for Spark's unit-normalized one. Buckets, candidate
    join, rerank and top-k are all checked; only pathological near-zero
    dots (|dot| ~ 1e-16) could flip a sign cross-engine, and the fixed
    synthetic corpus has none."""
    planes = random_hyperplanes(64, 8, seed=42)
    bucket = " + ".join(
        "(CASE WHEN list_dot_product(v, ["
        + ", ".join(repr(float(x)) for x in p)
        + f"]) >= 0 THEN {1 << i} ELSE 0 END)"
        for i, p in enumerate(planes)
    )
    return f"""
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
),
b AS (SELECT vec_id, v, {bucket} AS bucket FROM e),
q AS (
  SELECT vec_id AS query_id, v AS qv, bucket
  FROM b WHERE vec_id < {_N_QUERIES}
),
scored AS (
  SELECT q.query_id, c.vec_id AS neighbor_id,
         list_cosine_similarity(q.qv, c.v) AS cos,
         row_number() OVER (
           PARTITION BY q.query_id
           ORDER BY list_cosine_similarity(q.qv, c.v) DESC, c.vec_id
         ) AS rn
  FROM q JOIN b c ON c.bucket = q.bucket AND c.vec_id <> q.query_id
)
SELECT query_id, neighbor_id, round(cos, 6) AS cos_sim
FROM scored WHERE rn <= {_K}
"""


_LSH_ORACLE = _lsh_oracle()


def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    q, c = _queries_and_corpus(spark, sf_dir)
    # coarse quantizer: a tiny deterministic sample as centroids (a real
    # deployment trains k-means offline; the engine takes centroids as a
    # broadcast-able literal model either way)
    cents = [
        [float(x) for x in r["embedding"]]
        for r in c.filter(F.col("vec_id") % 97 == 0).orderBy("vec_id")
        .limit(8).collect()
    ]
    return ivf_topk(q, c, "vec_id", "embedding", centroids=cents, k=_K, n_probe=2)


QUERIES = [
    QueryDef("ann_bruteforce_topk", ann_bruteforce_topk, _BRUTE_ORACLE,
             "exact cosine top-k (baseline)"),
    QueryDef("ann_lsh_topk", ann_lsh_topk, _LSH_ORACLE,
             "random-hyperplane LSH bucketed approximate top-k "
             "(plan-literal planes -> full cross-engine oracle)"),
    QueryDef("ann_ivf_topk", ann_ivf_topk, None,
             "IVF coarse-quantizer approximate top-k"),
]
