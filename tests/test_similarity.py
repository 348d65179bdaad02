"""Similarity-search tests: exactness of the brute-force baseline on a
constructed geometry, and recall of the approximate variants against it."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from feature_generation_benchmark_spark.operators.similarity import (
    brute_force_topk,
    cosine_dup_pairs,
    cosine_dup_pairs_blocked,
    ivf_topk,
    lsh_topk,
)

DIM = 8


def _vec(i: int, seed_dim: int) -> list[float]:
    """Deterministic near-axis vectors: vector i points mostly along axis
    ``seed_dim`` with a small index-dependent wobble."""
    v = [0.05 * ((i * 7 + d * 3) % 5 - 2) for d in range(DIM)]
    v[seed_dim] += 10.0
    return v


@pytest.fixture(scope="module")
def emb(spark):
    rows = []
    for i in range(30):
        axis = i % 3  # three well-separated clusters on axes 0,1,2
        rows.append((i, _vec(i, axis), axis))
    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
            T.StructField("label", T.IntegerType()),
        ]
    )
    return spark.createDataFrame(rows, schema)


def _py_cosine(a, b):
    d = sum(x * y for x, y in zip(a, b))
    return d / (math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(y * y for y in b)))


def test_bruteforce_matches_python(spark, emb):
    out = brute_force_topk(
        emb.filter(F.col("vec_id") < 3), emb, "vec_id", "embedding", k=4,
        round_decimals=None,
    ).collect()
    rows = [(r["embedding"], r["vec_id"]) for r in emb.collect()]
    for r in out:
        qv = next(v for v, i in rows if i == r["query_id"])
        nv = next(v for v, i in rows if i == r["neighbor_id"])
        assert abs(_py_cosine(qv, nv) - r["cos_sim"]) < 1e-9


def test_bruteforce_neighbors_same_cluster(spark, emb):
    out = brute_force_topk(
        emb.filter(F.col("vec_id") < 3), emb, "vec_id", "embedding", k=4
    ).collect()
    for r in out:
        assert r["neighbor_id"] % 3 == r["query_id"] % 3


def test_partial_topk_equals_plain(spark, emb):
    """The scale-safe partial-top-k plan must return exactly the plain
    window-over-all-pairs results (ids AND rounded sims), including
    self-match exclusion and (sim desc, id asc) tie-breaking."""
    from feature_generation_benchmark_spark.operators.similarity import (
        brute_force_topk_partial,
    )

    q = emb.filter(F.col("vec_id") < 3)
    # repartition the corpus so multiple partitions genuinely contribute
    corpus = emb.repartition(5)
    plain = sorted(
        map(tuple, brute_force_topk(q, emb, "vec_id", "embedding", k=4).collect())
    )
    partial = sorted(
        map(
            tuple,
            brute_force_topk_partial(
                q, corpus, "vec_id", "embedding", k=4
            ).collect(),
        )
    )
    assert partial == plain and len(plain) > 0


def test_partial_topk_single_merge_shuffle(spark, emb):
    """Plan guard: the only Exchange is the P×Q×k candidate merge — the
    corpus itself never shuffles (that is the whole point of the plan)."""
    from feature_generation_benchmark_spark.operators.similarity import (
        brute_force_topk_partial,
    )

    q = emb.filter(F.col("vec_id") < 3)
    df = brute_force_topk_partial(q, emb.repartition(5), "vec_id", "embedding", k=4)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_partial_topk_ties_with_duplicate_vectors(spark):
    """Exact-duplicate vectors produce exactly tied cosines; the partial
    plan's per-partition heaps and the global merge must both break ties
    toward the lower neighbor_id, matching the plain window form."""
    from feature_generation_benchmark_spark.operators.similarity import (
        brute_force_topk_partial,
    )

    # 4 distinct directions, each repeated 6 times → heavy tie pressure
    rows = [
        (i, [float((i % 4 == d) * 2 + 1) for d in range(4)])
        for i in range(24)
    ]
    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
        ]
    )
    emb = spark.createDataFrame(rows, schema)
    q = emb.filter(F.col("vec_id") < 4)
    plain = sorted(
        map(tuple, brute_force_topk(q, emb, "vec_id", "embedding", k=5).collect())
    )
    for parts in (1, 3, 7):
        partial = sorted(
            map(
                tuple,
                brute_force_topk_partial(
                    q, emb.repartition(parts), "vec_id", "embedding", k=5
                ).collect(),
            )
        )
        assert partial == plain, parts


def test_topk_excludes_null_and_zero_vectors(spark):
    """NULL and zero-norm corpus vectors have no defined cosine; both
    forms must exclude them (not crash, not rank them) and still agree."""
    from feature_generation_benchmark_spark.operators.similarity import (
        brute_force_topk_partial,
    )

    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [1.0, 0.1, 0.0, 0.0]),
        (2, [0.9, 0.2, 0.0, 0.0]),
        (3, None),
        (4, [0.0, 0.0, 0.0, 0.0]),
        (5, [0.5, 0.5, 0.0, 0.0]),
    ]
    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
        ]
    )
    emb = spark.createDataFrame(rows, schema)
    q = emb.filter(F.col("vec_id") == 0)
    plain = sorted(
        map(tuple, brute_force_topk(q, emb, "vec_id", "embedding", k=10).collect())
    )
    partial = sorted(
        map(
            tuple,
            brute_force_topk_partial(
                q, emb.repartition(3), "vec_id", "embedding", k=10
            ).collect(),
        )
    )
    assert partial == plain
    neighbor_ids = {r[1] for r in plain}
    assert neighbor_ids == {1, 2, 5}  # 3 (NULL) and 4 (zero) excluded


def test_lsh_recall_against_bruteforce(spark, emb):
    q = emb.filter(F.col("vec_id") < 3)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in brute_force_topk(q, emb, "vec_id", "embedding", k=4).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in lsh_topk(
            q, emb, "vec_id", "embedding", k=4, dim=DIM, n_planes=4
        ).collect()
    }
    # separated clusters → high recall expected from sign-LSH
    assert len(approx & exact) >= len(exact) * 0.7


def test_ivf_recall_against_bruteforce(spark, emb):
    q = emb.filter(F.col("vec_id") < 3)
    cents = [_vec(0, 0), _vec(1, 1), _vec(2, 2)]
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in brute_force_topk(q, emb, "vec_id", "embedding", k=4).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in ivf_topk(
            q, emb, "vec_id", "embedding", centroids=cents, k=4, n_probe=1
        ).collect()
    }
    assert len(approx & exact) >= len(exact) * 0.7


def test_cosine_dup_pairs_threshold(spark, emb):
    pairs = cosine_dup_pairs(emb, "vec_id", "embedding", threshold=0.99)
    for r in pairs.collect():
        assert r["id_a"] % 3 == r["id_b"] % 3
        assert r["cos_sim"] >= 0.99


def test_blocked_equals_simple_pairs(spark, emb):
    """The blocked-matmul physical form must emit exactly the pairwise
    fold's results (same pairs, same rounded sims)."""
    simple = {
        (r["id_a"], r["id_b"]): r["cos_sim"]
        for r in cosine_dup_pairs(
            emb, "vec_id", "embedding", threshold=0.9
        ).collect()
    }
    blocked = {
        (r["id_a"], r["id_b"]): r["cos_sim"]
        for r in cosine_dup_pairs_blocked(
            emb, "vec_id", "embedding", threshold=0.9, n_blocks=4
        ).collect()
    }
    assert simple.keys() == blocked.keys()
    for k in simple:
        assert abs(simple[k] - blocked[k]) < 1e-6


# --- hard-negative mining (r5) --------------------------------------------


def test_hard_negatives_match_filtered_python(spark, emb):
    """Label-masked partial top-k must equal the brute-force Python
    ranking restricted to different-label candidates."""
    from feature_generation_benchmark_spark.operators.similarity import (
        brute_force_topk_partial,
    )

    k = 4
    out = brute_force_topk_partial(
        emb.filter(F.col("vec_id") < 3),
        emb,
        "vec_id",
        "embedding",
        k=k,
        exclude_label_col="label",
    ).collect()
    rows = [(r["vec_id"], r["embedding"], r["label"]) for r in emb.collect()]
    by_query = {}
    for r in out:
        by_query.setdefault(r["query_id"], []).append(
            (r["neighbor_id"], r["cos_sim"])
        )
    for qid, got in by_query.items():
        qv = next(v for i, v, _l in rows if i == qid)
        qlabel = next(l for i, _v, l in rows if i == qid)
        want = sorted(
            (
                (round(_py_cosine(qv, v), 6), -i)
                for i, v, l in rows
                if i != qid and l != qlabel
            ),
            reverse=True,
        )[:k]
        want_ids = [-x[1] for x in want]
        got_sorted = sorted(got, key=lambda t: (-t[1], t[0]))
        assert [n for n, _s in got_sorted] == want_ids
        # every mined negative must actually carry a different label
        labels = {i: l for i, _v, l in rows}
        assert all(labels[n] != qlabel for n, _s in got)


def test_hard_negatives_exclude_all_same_label(spark, emb):
    """Anchors keep k slots even when their own (same-label) cluster
    dominates the near field — the mask must never leak a same-label id."""
    from feature_generation_benchmark_spark.operators.similarity import (
        brute_force_topk_partial,
    )

    out = brute_force_topk_partial(
        emb.filter(F.col("vec_id") < 6),
        emb,
        "vec_id",
        "embedding",
        k=3,
        exclude_label_col="label",
    )
    joined = (
        out.join(
            emb.select(
                F.col("vec_id").alias("query_id"),
                F.col("label").alias("qlabel"),
            ),
            "query_id",
        )
        .join(
            emb.select(
                F.col("vec_id").alias("neighbor_id"),
                F.col("label").alias("nlabel"),
            ),
            "neighbor_id",
        )
    )
    assert joined.filter(F.col("qlabel") == F.col("nlabel")).count() == 0
    assert out.groupBy("query_id").count().filter("count != 3").count() == 0


# ---------------------------------------------------------------------------
# product quantization
# ---------------------------------------------------------------------------

def _pq_setup(spark, sf):
    from feature_generation_benchmark_spark.operators.similarity import (
        pq_codebooks,
    )
    from feature_generation_benchmark_spark.sources.testdata import load_table

    emb = load_table(spark, sf, "embeddings")
    q = emb.filter(F.col("vec_id") < 10)
    cb = pq_codebooks(emb, "vec_id", "embedding", m=16, ksub=16,
                      sample_mod=29)
    return q, emb, cb


def test_pq_encode_code_bounds(spark):
    from feature_generation_benchmark_spark.operators.similarity import (
        pq_encode,
    )

    _, emb, cb = _pq_setup(spark, "/root/testdata/sf0.001")
    rows = pq_encode(emb, "vec_id", "embedding", cb).collect()
    assert len(rows) == emb.count()
    for r in rows:
        assert len(r["codes"]) == 16
        assert all(0 <= c < 16 for c in r["codes"])


def test_pq_partial_equals_catalyst_formulation(spark):
    """The vectorized bounded-state scan and the didactic Catalyst plan
    must produce IDENTICAL rows — every membership decision on both
    paths is integer-based (ADC sums, micro-unit rerank), so this is
    exact equality, not approximate."""
    from feature_generation_benchmark_spark.operators.similarity import (
        pq_adc_topk,
        pq_adc_topk_partial,
    )

    q, emb, cb = _pq_setup(spark, "/root/testdata/sf0.001")
    cat = {
        (r["query_id"], r["neighbor_id"]): r["l2_e6"]
        for r in pq_adc_topk(
            q, emb, "vec_id", "embedding", cb, k=5, shortlist=50
        ).collect()
    }
    par = {
        (r["query_id"], r["neighbor_id"]): r["l2_e6"]
        for r in pq_adc_topk_partial(
            q, emb, "vec_id", "embedding", cb, k=5, shortlist=50
        ).collect()
    }
    assert cat == par


def test_pq_rerank_recall_floor(spark):
    """Shortlist+rerank recall@5 vs exact L2 ≥ 0.8 on the isotropic
    (worst-case) sf0.01 embeddings — measured 0.90 with M=16, L=100."""
    import numpy as np

    from feature_generation_benchmark_spark.workloads.similarity import (
        ann_pq_topk,
    )

    sf = "/root/testdata/sf0.01"
    emb = spark.read.parquet(f"{sf}/embeddings.parquet").collect()
    ids = np.array([r["vec_id"] for r in emb])
    V = np.array([r["embedding"] for r in emb], dtype=np.float64)
    got: dict[int, set[int]] = {}
    for r in ann_pq_topk(spark, sf).collect():
        got.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    recalls = []
    for qid in range(10):
        qv = V[ids == qid][0]
        d = ((V - qv) ** 2).sum(axis=1)
        d[ids == qid] = np.inf
        exact = set(
            int(ids[i]) for i in np.argsort(d, kind="stable")[:5]
        )
        recalls.append(len(exact & got[qid]) / 5)
    assert sum(recalls) / len(recalls) >= 0.8, recalls


def test_ivfpq_rerank_recall_floor(spark):
    """IVF routing on structureless data loses recall in proportion to
    the unprobed mass (3 of 6 cells probed at sf0.01): measured 0.72 vs
    0.90 for the full-scan PQ — floor 0.6. The composed layout is the
    point; the recall gap IS the documented router behavior on noise."""
    import numpy as np

    from feature_generation_benchmark_spark.workloads.similarity import (
        ann_ivfpq_topk,
    )

    sf = "/root/testdata/sf0.01"
    emb = spark.read.parquet(f"{sf}/embeddings.parquet").collect()
    ids = np.array([r["vec_id"] for r in emb])
    V = np.array([r["embedding"] for r in emb], dtype=np.float64)
    got: dict[int, set[int]] = {}
    for r in ann_ivfpq_topk(spark, sf).collect():
        got.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    recalls = []
    for qid in range(10):
        qv = V[ids == qid][0]
        d = ((V - qv) ** 2).sum(axis=1)
        d[ids == qid] = np.inf
        exact = set(int(ids[i]) for i in np.argsort(d, kind="stable")[:5])
        recalls.append(len(exact & got.get(qid, set())) / 5)
    assert sum(recalls) / len(recalls) >= 0.6, recalls


# ---------------------------------------------------------------------------
# r6 session-3 review regressions: the approximate forms must survive the
# same degenerate vectors the brute-force forms already exclude, and the
# blocked pair path must not drop negative ids.
# ---------------------------------------------------------------------------


def _degen_emb(spark):
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [1.0, 0.1, 0.0, 0.0]),
        (2, [0.9, 0.2, 0.0, 0.0]),
        (3, None),                    # NULL embedding
        (4, [0.0, 0.0, 0.0, 0.0]),    # zero norm → NaN cosine
        (5, [0.5, 0.5, 0.0, 0.0]),
    ]
    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
        ]
    )
    return spark.createDataFrame(rows, schema)


def test_lsh_topk_excludes_null_and_zero_vectors(spark):
    """Pre-fix: the zero-norm vector normalized to NaN, fell into bucket 0
    (all-zero sign bits), and its NaN sim ranked FIRST; NULL crashed."""
    emb = _degen_emb(spark)
    q = emb.filter(F.col("vec_id") == 0)
    out = lsh_topk(q, emb, "vec_id", "embedding", k=10, dim=4, n_planes=2)
    ids = {r["neighbor_id"] for r in out.collect()}
    assert 3 not in ids and 4 not in ids
    assert all(
        r["cos_sim"] == r["cos_sim"] for r in out.collect()
    )  # no NaN survives


def test_ivf_topk_excludes_null_and_zero_vectors(spark):
    emb = _degen_emb(spark)
    q = emb.filter(F.col("vec_id") == 0)
    cents = [[1.0, 0.0, 0.0, 0.0], [0.0, 1.0, 0.0, 0.0]]
    out = ivf_topk(
        q, emb, "vec_id", "embedding", centroids=cents, k=10, n_probe=2
    ).collect()
    ids = {r["neighbor_id"] for r in out}
    assert ids == {1, 2, 5}


def test_cosine_pairs_exclude_degenerate_vectors_both_forms(spark):
    """Zero-norm vectors: Spark's NaN >= t predicate is TRUE while the
    blocked worker's numpy comparison is False — both forms must filter
    them so the documented equivalence holds."""
    from feature_generation_benchmark_spark.operators.similarity import (
        cosine_dup_pairs,
        cosine_dup_pairs_blocked,
    )

    emb = _degen_emb(spark)
    plain = sorted(
        map(tuple, cosine_dup_pairs(emb, "vec_id", "embedding", 0.8).collect())
    )
    blocked = sorted(
        map(
            tuple,
            cosine_dup_pairs_blocked(
                emb, "vec_id", "embedding", 0.8, n_blocks=3
            ).collect(),
        )
    )
    assert plain == blocked
    flat = {i for r in plain for i in (r[0], r[1])}
    assert 3 not in flat and 4 not in flat


def test_blocked_pairs_keep_negative_ids(spark):
    """Pre-fix: % kept the dividend's sign, so negative ids hashed to a
    block with no membership row and every pair involving them vanished."""
    from feature_generation_benchmark_spark.operators.similarity import (
        cosine_dup_pairs,
        cosine_dup_pairs_blocked,
    )

    rows = [
        (-7, [1.0, 0.0]),
        (-3, [1.0, 0.05]),
        (2, [0.9, 0.1]),
        (5, [0.0, 1.0]),
    ]
    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
        ]
    )
    emb = spark.createDataFrame(rows, schema)
    plain = sorted(
        map(tuple, cosine_dup_pairs(emb, "vec_id", "embedding", 0.9).collect())
    )
    blocked = sorted(
        map(
            tuple,
            cosine_dup_pairs_blocked(
                emb, "vec_id", "embedding", 0.9, n_blocks=4
            ).collect(),
        )
    )
    assert plain == blocked
    assert any(r[0] == -7 or r[1] == -7 for r in plain)
