"""Similarity-search workload on ``embeddings`` (extension operators:
brute-force cosine top-k baseline; LSH and IVF approximate variants).

All three are oracle-checked. Brute force compares against DuckDB
``list_cosine_similarity`` (cast to DOUBLE[] — DuckDB computes FLOAT[]
inputs in float32, Spark in double). The approximate paths are
DETERMINISTIC, so they get full oracles too: LSH's hyperplanes are plan
literals the SQL twin re-embeds (bucket ids from dot-product signs); IVF's
centroid model is a deterministic function of the table the SQL twin
rebuilds. Recall-vs-bruteforce assertions live in
``tests/test_similarity.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from feature_generation_benchmark_spark.operators.similarity import (
    as_double_array,
    brute_force_topk,
    brute_force_topk_partial,
    ivf_topk,
    lsh_topk,
    pq_adc_topk,
    pq_adc_topk_partial,
    pq_codebooks,
    random_hyperplanes,
    semdedup_flags,
)
from feature_generation_benchmark_spark.operators.gram import (
    gram_suffstat_cells,
)
from feature_generation_benchmark_spark.sources.testdata import load_table
from feature_generation_benchmark_spark.workloads import QueryDef

_N_QUERIES = 10
_K = 5


def _queries_and_corpus(spark: SparkSession, sf_dir: str):
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.filter(F.col("vec_id") < _N_QUERIES), emb


def ann_bruteforce_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT top-k, served on the scale-safe partial-top-k plan (r3):
    per-partition GEMM scoring + bounded local top-k, so the merge
    shuffle carries P×Q×k candidate rows instead of N×Q scored rows.
    ``brute_force_topk`` (the window-over-all-pairs form) remains the
    didactic baseline, equality-tested against this plan."""
    q, c = _queries_and_corpus(spark, sf_dir)
    return brute_force_topk_partial(q, c, "vec_id", "embedding", k=_K)


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
           ORDER BY round(list_cosine_similarity(q.qv, e.v), 6) DESC, e.vec_id
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
           ORDER BY round(list_cosine_similarity(q.qv, c.v), 6) DESC, c.vec_id
         ) AS rn
  FROM q JOIN b c ON c.bucket = q.bucket AND c.vec_id <> q.query_id
)
SELECT query_id, neighbor_id, round(cos, 6) AS cos_sim
FROM scored WHERE rn <= {_K}
"""


_LSH_ORACLE = _lsh_oracle()


def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    q, c = _queries_and_corpus(spark, sf_dir)
    return ivf_topk(
        q, c, "vec_id", "embedding", centroids=_ivf_centroids(c), k=_K,
        n_probe=2,
    )


# The centroid "model" is itself a deterministic function of the table
# (vec_id % 97 == 0, ordered, first 8), so DuckDB rebuilds the SAME model
# and replays assignment (argmax dot vs unit centroids — scale-invariant,
# raw vectors suffice), 2-cell probing, candidate join and rerank. Ties in
# the argmax break toward the lower cell id on both engines.
_IVF_ORACLE = f"""
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
),
cr AS (
  SELECT vec_id, v FROM e WHERE vec_id % 97 = 0 ORDER BY vec_id LIMIT 8
),
cents AS (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell,
         list_transform(v, x -> x / sqrt(list_dot_product(v, v))) AS cv
  FROM cr
),
assign AS (
  SELECT e.vec_id, e.v, c.cell,
         row_number() OVER (
           PARTITION BY e.vec_id
           ORDER BY list_dot_product(e.v, c.cv) DESC, c.cell
         ) AS rk
  FROM e CROSS JOIN cents c
),
corpus AS (SELECT vec_id, v, cell FROM assign WHERE rk = 1),
probes AS (
  SELECT vec_id AS query_id, v AS qv, cell
  FROM assign WHERE rk <= 2 AND vec_id < {_N_QUERIES}
),
scored AS (
  SELECT p.query_id, c.vec_id AS neighbor_id,
         list_cosine_similarity(p.qv, c.v) AS cos
  FROM probes p JOIN corpus c ON c.cell = p.cell AND c.vec_id <> p.query_id
),
ranked AS (
  SELECT query_id, neighbor_id, cos,
         row_number() OVER (
           PARTITION BY query_id ORDER BY round(cos, 6) DESC, neighbor_id
         ) AS rn
  FROM scored
)
SELECT query_id, neighbor_id, round(cos, 6) AS cos_sim
FROM ranked WHERE rn <= {_K}
"""


_SEM_T = 0.35


def _ivf_centroids(corpus: DataFrame) -> list[list[float]]:
    """Deterministic centroid model shared by ``ann_ivf_topk`` and
    ``semdedup``: a tiny fixed sample of the table (a real deployment
    trains k-means offline; either way the model is a broadcast literal
    the SQL twin can rebuild)."""
    return [
        [float(x) for x in r["embedding"]]
        for r in corpus.filter(F.col("vec_id") % 97 == 0)
        .orderBy("vec_id")
        .limit(8)
        .collect()
    ]


def semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return semdedup_flags(
        emb, "vec_id", "embedding", centroids=_ivf_centroids(emb),
        threshold=_SEM_T,
    )


# Same deterministic model replay as the IVF oracle (assignment argmax over
# unit centroids is scale-invariant; ties break to the lower cell), then the
# published SemDeDup keep-rule: drop iff a lower-id cluster-mate is above
# the threshold.
_SEMDEDUP_ORACLE = f"""
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
),
cr AS (
  SELECT vec_id, v FROM e WHERE vec_id % 97 = 0 ORDER BY vec_id LIMIT 8
),
cents AS (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell,
         list_transform(v, x -> x / sqrt(list_dot_product(v, v))) AS cv
  FROM cr
),
assign AS (
  SELECT e.vec_id, e.v, c.cell,
         row_number() OVER (
           PARTITION BY e.vec_id
           ORDER BY list_dot_product(e.v, c.cv) DESC, c.cell
         ) AS rk
  FROM e CROSS JOIN cents c
),
a AS (SELECT vec_id, v, cell FROM assign WHERE rk = 1),
pairs AS (
  SELECT x.vec_id AS id_a, y.vec_id AS id_b,
         list_cosine_similarity(x.v, y.v) AS cos
  FROM a x JOIN a y ON x.cell = y.cell AND x.vec_id < y.vec_id
  WHERE list_cosine_similarity(x.v, y.v) >= {_SEM_T}
),
drops AS (
  SELECT id_b, min(id_a) AS dup_of, max(cos) AS max_cos
  FROM pairs GROUP BY id_b
)
SELECT a.vec_id, CAST(a.cell AS INTEGER) AS cell,
       (drops.dup_of IS NULL) AS kept, drops.dup_of,
       round(drops.max_cos, 6) AS max_cos
FROM a LEFT JOIN drops ON drops.id_b = a.vec_id
"""


_KM_ITERS = 3
_KM_DIM = 64  # embeddings table dimension (TESTDATA.md)


def kmeans_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    from feature_generation_benchmark_spark.operators.kmeans import (
        kmeans_train,
    )
    from feature_generation_benchmark_spark.session import ensure_runtime_confs

    ensure_runtime_confs(spark)  # iterative training re-reads cached input
    emb = load_table(spark, sf_dir, "embeddings")
    return kmeans_train(
        emb, "vec_id", "embedding", init_centroids=_ivf_centroids(emb),
        n_iter=_KM_ITERS,
    )


def _kmeans_oracle() -> str:
    """Unrolled Lloyd's twin: one (assign, update) CTE pair per iteration.
    Per-iteration centroid rounding (CENTROID_DECIMALS) keeps the whole
    trajectory bit-equal cross-engine — see ``operators/kmeans.py``."""
    sql = f"""
WITH e AS (
  SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
),
c0 AS (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell,
         CAST(embedding AS DOUBLE[]) AS cv
  FROM embeddings WHERE vec_id % 97 = 0 ORDER BY vec_id LIMIT 8
)"""
    for i in range(_KM_ITERS):
        sql += f""",
a{i + 1} AS (
  SELECT id, v, cell FROM (
    SELECT e.id, e.v, c.cell,
           row_number() OVER (PARTITION BY e.id ORDER BY
             (list_dot_product(c.cv, c.cv)
              - 2 * list_dot_product(e.v, c.cv)) ASC, c.cell ASC) AS rk
    FROM e CROSS JOIN c{i} c) WHERE rk = 1
),
c{i + 1} AS (
  SELECT cell, list(m ORDER BY dim) AS cv FROM (
    SELECT cell, dim, round(avg(v[dim]), 6) AS m
    FROM a{i + 1} CROSS JOIN
         (SELECT unnest(generate_series(1, {_KM_DIM})) AS dim) d
    GROUP BY cell, dim)
  GROUP BY cell
)"""
    n = _KM_ITERS
    sql += f""",
fin AS (
  SELECT id, v, cell FROM (
    SELECT e.id, e.v, c.cell,
           row_number() OVER (PARTITION BY e.id ORDER BY
             (list_dot_product(c.cv, c.cv)
              - 2 * list_dot_product(e.v, c.cv)) ASC, c.cell ASC) AS rk
    FROM e CROSS JOIN c{n} c) WHERE rk = 1
)
SELECT f.cell, CAST(count(*) AS BIGINT) AS n_vecs,
       round(sum(list_dot_product(f.v, f.v)
                 - 2 * list_dot_product(f.v, c.cv)
                 + list_dot_product(c.cv, c.cv)), 4) AS inertia,
       first(c.cv[1]) AS c0
FROM fin f JOIN c{n} c USING (cell)
GROUP BY f.cell
"""
    return sql


_PQ_M = 16
_PQ_DSUB = 64 // _PQ_M
_PQ_KSUB = 16
_PQ_MOD = 29
_PQ_L = 100


def ann_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization top-k with ADC shortlist + exact rerank —
    the compression half of IVF-PQ: the corpus is its 16×4-bit PQ codes
    (16 bytes vs 256 bytes of raw float32 at d=64 — the representation
    that still fits cluster RAM at 100 TB); queries broadcast
    integer-quantized LUTs, ADC scoring is 16 lookups + integer adds per
    coded vector, and exact squared-L2 touches ONLY the Q×L shortlist
    (the FAISS refine stage — required here because the synthetic
    embeddings are isotropic noise, the worst case for quantization;
    recall@5 ≥ 0.8 pinned in tests). Codebook model = deterministic
    table sample (k-means random-sample init, same contract as the IVF
    centroids) so the SQL twin replays encode, LUT, ADC, shortlist and
    rerank exactly — every score is an exact integer, so this
    approximate index is nonetheless FULLY hash-gated."""
    q, c = _queries_and_corpus(spark, sf_dir)
    cb = pq_codebooks(c, "vec_id", "embedding",
                      m=_PQ_M, ksub=_PQ_KSUB, sample_mod=_PQ_MOD)
    # served on the partial plan (vectorized ADC scan, bounded per-query
    # top-L state); pq_adc_topk is the didactic Catalyst twin, equality-
    # tested in tests/test_similarity.py
    return pq_adc_topk_partial(q, c, "vec_id", "embedding", cb, k=_K,
                               shortlist=_PQ_L)


# Replays the deterministic codebook (16 sampled rows' subvectors), the
# argmin encode (ties -> lowest centroid id), the e6-quantized LUT and
# the integer ADC sum — identical left-fold float math via list_reduce,
# so every intermediate double is bit-equal to Spark's.
_PQ_ORACLE = f"""
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
),
cr AS (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, v
  FROM (SELECT vec_id, v FROM e WHERE vec_id % {_PQ_MOD} = 0
        ORDER BY vec_id LIMIT {_PQ_KSUB})
),
ms AS (SELECT unnest(generate_series(0, {_PQ_M - 1})) AS m),
cb AS (
  SELECT m, cid,
         array_slice(v, {_PQ_DSUB} * m + 1, {_PQ_DSUB} * m + {_PQ_DSUB}) AS cv
  FROM cr CROSS JOIN ms
),
dists AS (
  SELECT e.vec_id, cb.m, cb.cid,
    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
      list_transform(list_zip(
          array_slice(e.v, {_PQ_DSUB} * cb.m + 1,
                      {_PQ_DSUB} * cb.m + {_PQ_DSUB}), cb.cv),
        s -> (s[1] - s[2]) * (s[1] - s[2]))),
      (a, b) -> a + b) AS d
  FROM e CROSS JOIN cb
),
codes AS (
  SELECT vec_id, m, cid AS code FROM (
    SELECT vec_id, m, cid,
           row_number() OVER (PARTITION BY vec_id, m ORDER BY d, cid) AS rk
    FROM dists)
  WHERE rk = 1
),
lut AS (
  SELECT vec_id AS query_id, m, cid,
         CAST(round(d * 1e6) AS BIGINT) AS d_e6
  FROM dists WHERE vec_id < {_N_QUERIES}
),
adc AS (
  SELECT l.query_id, c.vec_id AS neighbor_id,
         CAST(sum(l.d_e6) AS BIGINT) AS adc_e6
  FROM codes c JOIN lut l ON l.m = c.m AND l.cid = c.code
  WHERE c.vec_id <> l.query_id
  GROUP BY 1, 2
),
short AS (
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, neighbor_id,
           row_number() OVER (
             PARTITION BY query_id ORDER BY adc_e6, neighbor_id) AS rn
    FROM adc)
  WHERE rn <= {_PQ_L}
),
rer AS (
  SELECT s.query_id, s.neighbor_id,
    CAST(round(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
      list_transform(list_zip(q.v, c.v),
        z -> (z[1] - z[2]) * (z[1] - z[2]))),
      (a, b) -> a + b) * 1e6) AS BIGINT) AS l2_e6
  FROM short s
  JOIN e q ON q.vec_id = s.query_id
  JOIN e c ON c.vec_id = s.neighbor_id
),
ranked AS (
  SELECT query_id, neighbor_id, l2_e6,
         row_number() OVER (
           PARTITION BY query_id ORDER BY l2_e6, neighbor_id) AS rn
  FROM rer
)
SELECT query_id, neighbor_id, l2_e6 FROM ranked WHERE rn <= {_K}
"""


_IVFPQ_NPROBE = 3


def ann_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end IVF-PQ — the standard FAISS inverted-list layout
    composing the engine's two ANN halves: the coarse router assigns
    every corpus vector to its nearest sampled centroid (squared L2,
    metric-consistent with the PQ refine), each query probes its 3
    nearest cells, ADC scores only the probed rows (16×4-bit codes +
    integer LUTs, bounded per-query state), and exact squared-L2
    reranks the Q×L shortlist. At 100 TB this is the layout where the
    coded corpus lives partitioned by cell and a query touches
    n_probe/|cells| of it. On this isotropic corpus the router loses
    recall in proportion to the unprobed mass (recall@5 = 0.72, floor
    0.6 pinned — vs 0.90 for the full-scan ``ann_pq_topk``); both
    deterministic models replay in SQL, so the composed index is FULLY
    hash-gated end to end."""
    q, c = _queries_and_corpus(spark, sf_dir)
    cb = pq_codebooks(c, "vec_id", "embedding",
                      m=_PQ_M, ksub=_PQ_KSUB, sample_mod=_PQ_MOD)
    return pq_adc_topk_partial(
        q, c, "vec_id", "embedding", cb, k=_K, shortlist=_PQ_L,
        coarse_centroids=_ivf_centroids(c), n_probe=_IVFPQ_NPROBE,
    )


_FOLD64 = (
    "list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
    "list_transform(list_zip({a}, {b}), "
    "z -> (z[1] - z[2]) * (z[1] - z[2]))), (x, y) -> x + y)"
)

_IVFPQ_ORACLE = f"""
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
),
ccr AS (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell, v
  FROM (SELECT vec_id, v FROM e WHERE vec_id % 97 = 0
        ORDER BY vec_id LIMIT 8)
),
cdist AS (
  SELECT e.vec_id, cc.cell,
         {_FOLD64.format(a="e.v", b="cc.v")} AS cd
  FROM e CROSS JOIN ccr cc
),
assign AS (
  SELECT vec_id, cell FROM (
    SELECT vec_id, cell,
           row_number() OVER (PARTITION BY vec_id ORDER BY cd, cell) AS rk
    FROM cdist)
  WHERE rk = 1
),
qprobe AS (
  SELECT vec_id AS query_id, cell FROM (
    SELECT vec_id, cell,
           row_number() OVER (PARTITION BY vec_id ORDER BY cd, cell) AS rk
    FROM cdist WHERE vec_id < {_N_QUERIES})
  WHERE rk <= {_IVFPQ_NPROBE}
),
cr AS (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cid, v
  FROM (SELECT vec_id, v FROM e WHERE vec_id % {_PQ_MOD} = 0
        ORDER BY vec_id LIMIT {_PQ_KSUB})
),
ms AS (SELECT unnest(generate_series(0, {_PQ_M - 1})) AS m),
cb AS (
  SELECT m, cid,
         array_slice(v, {_PQ_DSUB} * m + 1, {_PQ_DSUB} * m + {_PQ_DSUB}) AS cv
  FROM cr CROSS JOIN ms
),
dists AS (
  SELECT e.vec_id, cb.m, cb.cid,
    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
      list_transform(list_zip(array_slice(e.v, {_PQ_DSUB} * cb.m + 1,
                      {_PQ_DSUB} * cb.m + {_PQ_DSUB}), cb.cv),
        s -> (s[1] - s[2]) * (s[1] - s[2]))),
      (a, b) -> a + b) AS d
  FROM e CROSS JOIN cb
),
codes AS (
  SELECT vec_id, m, cid AS code FROM (
    SELECT vec_id, m, cid,
           row_number() OVER (PARTITION BY vec_id, m ORDER BY d, cid) AS rk
    FROM dists)
  WHERE rk = 1
),
lut AS (
  SELECT vec_id AS query_id, m, cid,
         CAST(round(d * 1e6) AS BIGINT) AS d_e6
  FROM dists WHERE vec_id < {_N_QUERIES}
),
adc AS (
  SELECT l.query_id, c.vec_id AS neighbor_id,
         CAST(sum(l.d_e6) AS BIGINT) AS adc_e6
  FROM codes c
  JOIN assign a ON a.vec_id = c.vec_id
  JOIN qprobe p ON p.cell = a.cell
  JOIN lut l ON l.query_id = p.query_id AND l.m = c.m AND l.cid = c.code
  WHERE c.vec_id <> l.query_id
  GROUP BY 1, 2
),
short AS (
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, neighbor_id,
           row_number() OVER (
             PARTITION BY query_id ORDER BY adc_e6, neighbor_id) AS rn
    FROM adc)
  WHERE rn <= {_PQ_L}
),
rer AS (
  SELECT s.query_id, s.neighbor_id,
    CAST(round({_FOLD64.format(a="q.v", b="c.v")} * 1e6) AS BIGINT) AS l2_e6
  FROM short s
  JOIN e q ON q.vec_id = s.query_id
  JOIN e c ON c.vec_id = s.neighbor_id
),
ranked AS (
  SELECT query_id, neighbor_id, l2_e6,
         row_number() OVER (
           PARTITION BY query_id ORDER BY l2_e6, neighbor_id) AS rn
  FROM rer
)
SELECT query_id, neighbor_id, l2_e6 FROM ranked WHERE rn <= {_K}
"""


QUERIES = [
    QueryDef("ann_bruteforce_topk", ann_bruteforce_topk, _BRUTE_ORACLE,
             "exact cosine top-k on the partial-top-k plan (per-partition "
             "GEMM + bounded local top-k; merge shuffle is P*Q*k rows)"),
    QueryDef("kmeans_embeddings", kmeans_embeddings, _kmeans_oracle(),
             "Lloyd's k-means training as chained DataFrame iterations "
             "(per-iteration centroid quantization -> exact SQL replay)"),
    QueryDef("semdedup", semdedup, _SEMDEDUP_ORACLE,
             "SemDeDup semantic dedup: coarse-quantizer clusters + "
             "intra-cluster cosine keep-rule (cell equi-join candidates)"),
    QueryDef("ann_lsh_topk", ann_lsh_topk, _LSH_ORACLE,
             "random-hyperplane LSH bucketed approximate top-k "
             "(plan-literal planes -> full cross-engine oracle)"),
    QueryDef("ann_ivf_topk", ann_ivf_topk, _IVF_ORACLE,
             "IVF coarse-quantizer approximate top-k (deterministic "
             "centroid model -> full cross-engine oracle)"),
    QueryDef("ann_pq_topk", ann_pq_topk, _PQ_ORACLE,
             "product-quantization top-k: 16x4-bit codes, integer ADC "
             "shortlist + exact rerank -> full cross-engine oracle"),
    QueryDef("ann_ivfpq_topk", ann_ivfpq_topk, _IVFPQ_ORACLE,
             "end-to-end IVF-PQ: L2 cell routing + coded ADC over probed "
             "cells + exact rerank -> full cross-engine oracle"),
]


# ---------------------------------------------------------------------------
# higher-order array expressions — per-vector stats, JVM-side (r2)
# ---------------------------------------------------------------------------

def embedding_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector dimensionality, squared L2 norm, and min/max component —
    computed entirely with higher-order array expressions (``transform`` +
    ``aggregate`` + ``array_min/max``) inside codegen: no UDF, no explode,
    no shuffle. Components are quantized to 1e-6 ints before squaring/
    summing, so every aggregate is an exact integer and the DuckDB list-
    function twin matches bit-for-bit (float32 folds would be at the mercy
    of each engine's accumulation order)."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = F.transform(
        "embedding",
        lambda x: F.round(x.cast("double") * F.lit(1e6), 0),
    )
    return emb.select(
        "vec_id",
        "label",
        F.size("embedding").alias("dim"),
        F.aggregate(
            q, F.lit(0.0), lambda acc, x: acc + x * x
        ).alias("norm_sq_e12"),
        F.array_min(q).alias("min_e6"),
        F.array_max(q).alias("max_e6"),
    )


_EMB_STATS_ORACLE = """
WITH q AS (
  SELECT vec_id, label, len(embedding) AS dim,
    list_transform(embedding, x -> round(CAST(x AS DOUBLE) * 1e6))
      AS qe
  FROM embeddings
)
SELECT vec_id, label, CAST(dim AS INT) AS dim,
  list_sum(list_transform(qe, x -> x * x)) AS norm_sq_e12,
  list_min(qe) AS min_e6,
  list_max(qe) AS max_e6
FROM q
"""

QUERIES.append(
    QueryDef(
        "embedding_stats",
        embedding_stats,
        _EMB_STATS_ORACLE,
        "higher-order array exprs: transform/aggregate/min/max, no UDF",
    )
)


def embedding_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension affine int8 quantization of the embedding corpus —
    the storage/serving compression step (FAISS SQ8-style): pass 1
    computes per-dim [min, max] (posexplode → dim-keyed agg, partial agg
    bounds the exchange to P×d rows), pass 2 broadcasts the d-row model
    as ONE array-of-structs row and quantizes each vector ROW-LOCALLY
    with ``zip_with`` — the corpus itself is never shuffled (the kmeans
    assignment pattern).

    Determinism: components are first quantized to exact 1e-6 ints (the
    `embedding_stats` convention), so min/max are exact; the only double
    ops are the two affine divisions, written as the identical
    expression on both engines; q ∈ [0,255] and the dequantization
    error are re-quantized to ints before aggregation (order-free sums).
    Constant dims (max = min) quantize to 0 with zero error.

    Output: (vec_id, n_dims, q_sum, max_err_e6) — q_sum is the exact
    integer checksum of the int8 codes; max_err_e6 the worst per-dim
    reconstruction error in 1e-6 units of the original value.
    """
    emb = load_table(spark, sf_dir, "embeddings").filter(
        F.col("embedding").isNotNull()
    )
    qe = F.transform(
        "embedding",
        lambda x: F.round(x.cast("double") * F.lit(1e6), 0).cast("long"),
    )
    base = emb.select("vec_id", qe.alias("qe"))
    dims = base.select(F.posexplode("qe").alias("dim", "x"))
    stats = dims.groupBy("dim").agg(
        F.min("x").alias("mn"), F.max("x").alias("mx")
    )
    model = stats.agg(
        F.array_sort(F.collect_list(F.struct("dim", "mn", "mx"))).alias(
            "__m"
        )
    )

    def per_dim(x, m):
        qv = (
            F.when(
                m["mx"] > m["mn"],
                F.round(
                    (x - m["mn"]) * F.lit(255.0) / (m["mx"] - m["mn"]), 0
                ).cast("long"),
            )
            .otherwise(F.lit(0).cast("long"))
        )
        deq = m["mn"] + qv * (m["mx"] - m["mn"]) / F.lit(255.0)
        err = F.round(F.abs(deq - x), 0).cast("long")
        return F.struct(qv.alias("q"), err.alias("e"))

    pairs = F.zip_with(F.col("qe"), F.col("__m"), per_dim)
    return base.crossJoin(F.broadcast(model)).select(
        "vec_id",
        F.size("qe").cast("long").alias("n_dims"),
        F.aggregate(
            pairs, F.lit(0).cast("long"), lambda acc, p: acc + p["q"]
        ).alias("q_sum"),
        F.array_max(F.transform(pairs, lambda p: p["e"])).alias(
            "max_err_e6"
        ),
    )


_QUANTIZE_ORACLE = """
WITH base AS (
  SELECT vec_id,
    list_transform(embedding,
      x -> CAST(round(CAST(x AS DOUBLE) * 1e6) AS BIGINT)) AS qe
  FROM embeddings WHERE embedding IS NOT NULL
),
d AS (
  SELECT vec_id, u.i AS dim, qe[u.i] AS x
  FROM base, unnest(generate_series(1, len(qe))) AS u(i)
),
s AS (SELECT dim, min(x) AS mn, max(x) AS mx FROM d GROUP BY dim),
q AS (
  SELECT vec_id, x, mn, mx,
    CASE WHEN mx > mn
      THEN CAST(round((x - mn) * 255.0 / (mx - mn)) AS BIGINT)
      ELSE 0 END AS qi
  FROM d JOIN s USING (dim)
),
e AS (
  SELECT vec_id, qi,
    CAST(round(abs(mn + qi * (mx - mn) / 255.0 - x)) AS BIGINT) AS err
  FROM q
)
SELECT vec_id,
  CAST(count(*) AS BIGINT) AS n_dims,
  CAST(sum(qi) AS BIGINT) AS q_sum,
  CAST(max(err) AS BIGINT) AS max_err_e6
FROM e GROUP BY vec_id
"""

QUERIES.append(
    QueryDef(
        "embedding_quantize_int8",
        embedding_quantize_int8,
        _QUANTIZE_ORACLE,
        "per-dim affine int8 quantization (SQ8): broadcast d-row model, "
        "row-local zip_with encode, corpus never shuffled",
    )
)


# ---------------------------------------------------------------------------
# Distributed Gram matrix — the PCA / covariance primitive at scale
# ---------------------------------------------------------------------------

_GRAM_Q = 10_000  # fixed-point component quantization (1e-4 resolution)


def embedding_gram_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact d×d Gram matrix G = Σᵣ vᵣvᵣᵀ over all embeddings (upper
    triangle, ``d(d+1)/2`` rows of ``(i, j, dot_q)``) — the one
    distributed pass behind PCA / whitening / covariance at corpus scale.

    Components are quantized to ``_GRAM_Q`` fixed-point int64 up front, so
    every per-row product and the global sum are EXACT integers — no
    float summation-order drift between partition layouts or engines.
    |q| ≤ ~6e4 ⇒ |q·q| ≤ ~3.6e9 ⇒ the int64 cell sums hold through
    ~2.5e9 corpus rows; beyond that cast the sum to decimal(38,0) (same
    escape hatch as ``lineitem_corr_matrix``).

    Scale posture: the d²/2 products per row exist only PIPELINED inside
    the scan stage — since the r7 partition-GEMM rewrite the cell source
    is ``mapInPandas`` (one fused int64 VᵀV per Arrow batch,
    ``operators/gram.py::_gemm_cells``) emitting the d(d+1)/2 triangle
    once per PARTITION, followed by ``HashAggregate(partial)`` below the
    single exchange, which therefore carries at most P × d(d+1)/2
    partial cells, independent of corpus row count. The JVM two-level
    explode forms remain in ``operators/gram.py`` for the A/B tool and
    the gemm == nested == numpy property tests (``tests/test_gram.py``)."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = F.transform(
        as_double_array("embedding"),
        lambda v: F.round(v * _GRAM_Q).cast("long"),
    )
    rows = emb.select(q.alias("__q"))
    return (
        gram_suffstat_cells(rows, "__q")
        .groupBy("i", "j")
        .agg(F.sum("p").alias("dot_q"))
    )


_GRAM_ORACLE = f"""
WITH comp AS (
  SELECT vec_id,
         CAST(unnest(generate_series(0, len(embedding) - 1)) AS INT) AS i,
         CAST(round(unnest(CAST(embedding AS DOUBLE[])) * {_GRAM_Q})
              AS BIGINT) AS q
  FROM embeddings
)
SELECT a.i AS i, b.i AS j, CAST(sum(a.q * b.q) AS BIGINT) AS dot_q
FROM comp a JOIN comp b ON a.vec_id = b.vec_id AND b.i >= a.i
GROUP BY 1, 2
"""

QUERIES.append(
    QueryDef(
        "embedding_gram_matrix",
        embedding_gram_matrix,
        _GRAM_ORACLE,
        "exact fixed-point d×d Gram matrix in ONE pass: per-row upper-"
        "triangle products pipelined into a map-combined partial agg; "
        "the only exchange carries P×d(d+1)/2 cells",
    )
)


# ---------------------------------------------------------------------------
# Hybrid retrieval — Reciprocal Rank Fusion of lexical BM25 + semantic ANN
# ---------------------------------------------------------------------------

_RRF_N = 50   # per-source candidate depth
_RRF_C = 60   # the standard RRF dampening constant
_RRF_K = 20   # fused results returned


def hybrid_search_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval: fuse the lexical BM25 ranking (fixed keyword
    query, ``workloads/text.py``) with the semantic cosine ranking
    (query = embedding 0) by Reciprocal Rank Fusion —
    ``score(d) = Σ_sources 1/(C + rank_source(d))``, C = 60 — the
    standard fusion for RAG / retrieval pipelines (Cormack et al.).

    Documents and embeddings share the id space by construction
    (``doc_id`` ≡ ``vec_id``), so each source contributes a top-``_RRF_N``
    ranking over the same corpus.

    Determinism: both source rankings are already cross-engine exact
    (BM25 ranks on integer micro-scores; cosine ranks on round-6 sims
    with id tie-breaks), ranks are integers, and each contribution is
    quantized to ``round(1e6/(C+rank))`` int64 BEFORE the order-free
    integer sum — the fused score is bit-exact.

    Scale posture: each source reduces to its top-N FIRST (BM25 via
    TakeOrdered; cosine via the partial-top-k merge), so the ranking
    windows and the fusion union/agg run on ≤2N rows — corpus-sized work
    stays inside the two source plans, which are themselves
    shuffle-bounded (see their docstrings)."""
    from pyspark.sql import Window

    from feature_generation_benchmark_spark.workloads.text import (
        bm25_scores,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") == 0)
    sem = brute_force_topk_partial(q, emb, "vec_id", "embedding", k=_RRF_N)
    w_sem = Window.orderBy(F.col("cos_sim").desc(), F.col("neighbor_id"))
    sem_rank = sem.select(
        F.col("neighbor_id").alias("doc_id"),
        F.row_number().over(w_sem).alias("rank"),
    )
    lex_top = (
        bm25_scores(spark, sf_dir)
        .orderBy(F.col("score_micro").desc(), "doc_id")
        .limit(_RRF_N)
    )
    w_lex = Window.orderBy(F.col("score_micro").desc(), F.col("doc_id"))
    lex_rank = lex_top.select(
        "doc_id", F.row_number().over(w_lex).alias("rank")
    )
    contrib = F.round(F.lit(1e6) / (F.lit(_RRF_C) + F.col("rank"))).cast(
        "long"
    )
    return (
        sem_rank.select("doc_id", contrib.alias("c"))
        .unionByName(lex_rank.select("doc_id", contrib.alias("c")))
        .groupBy("doc_id")
        .agg(
            F.sum("c").alias("rrf_micro"),
            F.count(F.lit(1)).alias("n_sources"),
        )
        .orderBy(F.col("rrf_micro").desc(), "doc_id")
        .limit(_RRF_K)
    )


def _rrf_oracle() -> str:
    from feature_generation_benchmark_spark.workloads.text import (
        _BM25_SCORE_CTES,
    )

    return f"""
WITH {_BM25_SCORE_CTES.strip().rstrip()},
e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
),
qv AS (SELECT v AS q FROM e WHERE vec_id = 0),
sem AS (
  SELECT e.vec_id AS doc_id,
         row_number() OVER (
           ORDER BY round(list_cosine_similarity(qv.q, e.v), 6) DESC,
                    e.vec_id
         ) AS rank
  FROM e CROSS JOIN qv WHERE e.vec_id <> 0
),
lex AS (
  SELECT doc_id,
         row_number() OVER (ORDER BY score_micro DESC, doc_id) AS rank
  FROM bm25_scores
),
contrib AS (
  SELECT doc_id, CAST(round(1e6 / ({_RRF_C} + rank)) AS BIGINT) AS c
  FROM sem WHERE rank <= {_RRF_N}
  UNION ALL
  SELECT doc_id, CAST(round(1e6 / ({_RRF_C} + rank)) AS BIGINT) AS c
  FROM lex WHERE rank <= {_RRF_N}
)
SELECT doc_id,
       CAST(sum(c) AS BIGINT) AS rrf_micro,
       CAST(count(*) AS BIGINT) AS n_sources
FROM contrib GROUP BY doc_id
ORDER BY rrf_micro DESC, doc_id
LIMIT {_RRF_K}
"""


QUERIES.append(
    QueryDef(
        "hybrid_search_rrf",
        hybrid_search_rrf,
        _rrf_oracle(),
        "Reciprocal Rank Fusion of BM25 lexical + cosine semantic top-N: "
        "each source top-k's first, fusion runs on ≤2N rows with integer "
        "micro-contributions",
    )
)


# ---------------------------------------------------------------------------
# hard-negative mining — contrastive-training pair generation (r5)
# ---------------------------------------------------------------------------

_HN_K = 3  # hard negatives per anchor


def hard_negative_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard negatives for contrastive training: for each anchor vector,
    the top-k most cosine-similar corpus vectors whose ``label`` DIFFERS
    from the anchor's (the near-miss impostors that make the best
    negative examples).

    Served on the same scale-safe partial-top-k plan as
    ``ann_bruteforce_topk`` — the anchor set is a broadcast Q×d model,
    each corpus partition GEMM-scores its rows and masks same-label
    pairs to -inf inside the batch scorer, so shuffle volume stays
    P×Q×k regardless of corpus size. Tie-break and round-6 quantization
    follow the engine-wide top-k contract."""
    q, c = _queries_and_corpus(spark, sf_dir)
    return brute_force_topk_partial(
        q, c, "vec_id", "embedding", k=_HN_K, exclude_label_col="label"
    )


_HARD_NEGATIVE_ORACLE = f"""
WITH e AS (
  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
),
q AS (
  SELECT vec_id AS query_id, label AS qlabel, v AS qv
  FROM e WHERE vec_id < {_N_QUERIES}
),
scored AS (
  SELECT q.query_id, e.vec_id AS neighbor_id,
         list_cosine_similarity(q.qv, e.v) AS cos,
         row_number() OVER (
           PARTITION BY q.query_id
           ORDER BY round(list_cosine_similarity(q.qv, e.v), 6) DESC, e.vec_id
         ) AS rn
  FROM q JOIN e ON e.vec_id <> q.query_id AND e.label <> q.qlabel
)
SELECT query_id, neighbor_id, round(cos, 6) AS cos_sim
FROM scored WHERE rn <= {_HN_K}
"""


QUERIES.append(
    QueryDef(
        "hard_negative_mining",
        hard_negative_mining,
        _HARD_NEGATIVE_ORACLE,
        "contrastive hard negatives: per anchor, top-k nearest-cosine "
        "corpus vectors with a DIFFERENT label (same-label pairs masked "
        "inside the bounded partial-top-k scorer; shuffle stays P*Q*k)",
    )
)
