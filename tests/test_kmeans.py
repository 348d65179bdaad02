"""Lloyd's-iteration invariants for ``operators/kmeans.py`` beyond the
DuckDB oracle: monotone inertia, assignment totality, determinism."""

from __future__ import annotations

from pyspark.sql import functions as F

from feature_generation_benchmark_spark.operators.kmeans import kmeans_train
from feature_generation_benchmark_spark.sources.testdata import load_table
from feature_generation_benchmark_spark.workloads.similarity import (
    _ivf_centroids,
)
from tests.conftest import SF_SMOKE


def _total_inertia(spark, n_iter: int) -> tuple[float, int]:
    emb = load_table(spark, SF_SMOKE, "embeddings")
    out = kmeans_train(
        emb, "vec_id", "embedding",
        init_centroids=_ivf_centroids(emb), n_iter=n_iter,
    ).agg(
        F.sum("inertia").alias("i"), F.sum("n_vecs").alias("n")
    ).collect()[0]
    return float(out["i"]), int(out["n"])


def test_kmeans_inertia_decreases_and_assignment_is_total(spark):
    i0, n0 = _total_inertia(spark, 0)  # stats of the raw init assignment
    i3, n3 = _total_inertia(spark, 3)
    assert n0 == n3 == 500  # every vector assigned exactly once
    # Lloyd's monotonicity (1e-6 centroid quantization can cost at most a
    # sliver; give it epsilon headroom)
    assert i3 <= i0 + 1e-3
    assert i3 < i0 * 0.9  # and it genuinely converged, not a no-op


def test_assignment_is_zero_shuffle(spark):
    """The per-iteration assignment must not shuffle the corpus: the k×d
    model reaches rows as one broadcast array column and the argmin is
    row-local (``array_min(transform(...))``). A hashpartitioning
    Exchange here means the plan regressed to the k-multiplying
    crossJoin + groupBy(__id) shape that re-shuffles every (id, vector)
    pair once per iteration."""
    from feature_generation_benchmark_spark.operators.kmeans import _assign

    emb = load_table(spark, SF_SMOKE, "embeddings")
    corpus = emb.select(
        F.col("vec_id").alias("__id"),
        F.col("embedding").cast("array<double>").alias("__v"),
    )
    cents = spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(_ivf_centroids(emb))],
        "cell int, cv array<double>",
    )
    plan = _assign(corpus, cents)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 0, plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_kmeans_deterministic(spark):
    a, _ = _total_inertia(spark, 2)
    b, _ = _total_inertia(spark, 2)
    assert a == b


def test_update_shuffles_partials_not_rows(spark):
    """The centroid update's exchange must carry map-side partial
    aggregates (≤ P×k×d (sum, count) rows), never the N×d exploded
    (cell, dim, value) rows: the plan must keep the shape
    ``Generate posexplode → HashAggregate(partial_avg) → Exchange`` so
    shuffle volume stays independent of corpus size per iteration. A
    plan where the Exchange sits directly above the Generate (partial
    agg lost — e.g. an expression change defeating partial aggregation)
    regresses the update to an N×d shuffle."""
    from feature_generation_benchmark_spark.operators.kmeans import (
        _assign,
        _update,
    )

    emb = load_table(spark, SF_SMOKE, "embeddings")
    corpus = emb.select(
        F.col("vec_id").alias("__id"),
        F.col("embedding").cast("array<double>").alias("__v"),
    )
    cents = spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(_ivf_centroids(emb))],
        "cell int, cv array<double>",
    )
    plan = (
        _update(_assign(corpus, cents))
        ._jdf.queryExecution().executedPlan().toString()
    )
    # tree prints parents first: partial_avg must sit BETWEEN the
    # (cell, dim) exchange (above it) and the Generate (below it)
    assert "partial_avg" in plan, plan
    gen = plan.index("Generate")
    partial = plan.index("partial_avg")
    exch = plan.rindex("Exchange hashpartitioning", 0, partial)
    assert exch < partial < gen, plan
