"""Property tests for the dimension-guarded Gram cell generator
(operators/gram.py, r5 verdict #6)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from feature_generation_benchmark_spark.operators.gram import (
    _flat_cells,
    _nested_cells,
    gram_suffstat_cells,
)


def _mk_rows(spark, n, d, seed=7):
    rng = np.random.default_rng(seed)
    data = rng.integers(-500, 500, size=(n, d)).tolist()
    return spark.createDataFrame(
        [([int(v) for v in row],) for row in data], "__q array<long>"
    ), np.array(data, dtype=np.int64)


@pytest.mark.parametrize("d", [5, 64, 130])
def test_both_forms_match_numpy(spark, d):
    """Flat and nested cell generation produce the exact same integer
    sufficient statistics as a numpy reference — at d≥64 and past the
    FLAT_MAX_D guard."""
    df, mat = _mk_rows(spark, 40, d)
    expect_gram = mat.T @ mat
    expect_sums = mat.sum(axis=0)
    results = {}
    for label, form in (("flat", _flat_cells), ("nested", _nested_cells)):
        agg = (
            form(df, "__q", True)
            .groupBy("i", "j")
            .agg(F.sum("p").alias("v"))
            .collect()
        )
        results[label] = {(r["i"], r["j"]): r["v"] for r in agg}
    assert results["flat"] == results["nested"]
    cells = results["nested"]
    assert cells[(-1, -1)] == 40
    tri = d * (d + 1) // 2
    assert len(cells) == tri + d + 1
    for i in range(d):
        assert cells[(i, -1)] == expect_sums[i], i
        for j in range(i, d):
            assert cells[(i, j)] == expect_gram[i, j], (i, j)


def test_production_form_is_partition_gemm(spark):
    """r7: the production form folds each partition with one vectorized
    int64 GEMM inside mapInPandas (cells emitted per partition, not per
    row) — the plan must carry the Python map node and no Generate."""
    df, _ = _mk_rows(spark, 4, 6)
    plan = (
        gram_suffstat_cells(df)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "MapInPandas" in plan or "mapInPandas" in plan, plan
    assert "Generate" not in plan, plan


@pytest.mark.parametrize("with_moments", [False, True])
def test_gemm_form_matches_nested(spark, with_moments):
    """The partition-GEMM production form reproduces the exploded
    nested form's integer sufficient statistics exactly — including
    moment pseudo-cells, empty vectors, and RAGGED vector lengths
    (per-length accumulation into the top-left block)."""
    df, _ = _mk_rows(spark, 40, 64)
    ragged = spark.createDataFrame(
        [([1, 2, 3],), ([],), ([4, -5],), ([7],), ([2, 0, -9],)],
        "__q array<long>",
    )
    for frame in (df, ragged):
        results = {}
        for label, form in (
            ("gemm", gram_suffstat_cells),
            ("nested", _nested_cells),
        ):
            agg = (
                form(frame, "__q", with_moments)
                .groupBy("i", "j")
                .agg(F.sum("p").alias("v"))
                .collect()
            )
            results[label] = {(r["i"], r["j"]): r["v"] for r in agg}
        assert results["gemm"] == results["nested"]


def test_flat_form_drops_empty_vectors_like_nested(spark):
    """Pre-fix: sequence(0, -1) on an empty vector produced the
    DESCENDING [0, -1] and emitted bogus cells colliding with the i=-1
    moment pseudo-cell space; nested's posexplode simply drops the row."""
    df = spark.createDataFrame(
        [([1, 2],), ([],), ([3],)], "__q array<long>"
    )
    results = {}
    for label, form in (("flat", _flat_cells), ("nested", _nested_cells)):
        agg = (
            form(df, "__q", True)
            .groupBy("i", "j")
            .agg(F.sum("p").alias("v"))
            .collect()
        )
        results[label] = {(r["i"], r["j"]): r["v"] for r in agg}
    assert results["flat"] == results["nested"]
    # count pseudo-cell sees only the two NON-empty rows
    assert results["flat"][(-1, -1)] == 2
    assert all(i >= -1 and j >= -1 for i, j in results["flat"])
