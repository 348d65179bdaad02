"""In-engine classifier training (workloads/classifier.py)."""

from __future__ import annotations

import numpy as np
import pytest

from feature_generation_benchmark_spark.workloads.classifier import (
    _N_ITER,
    train_text_classifier,
)
from feature_generation_benchmark_spark.sources.testdata import load_table
from tests.conftest import SF_CORRECT


@pytest.fixture(scope="module")
def trained(spark):
    docs = load_table(spark, SF_CORRECT, "documents")
    return train_text_classifier(docs).collect()[0]


def test_learns_above_base_rate(spark, trained):
    """The model must genuinely descend: training accuracy well above
    the majority-class base rate (~80% on this corpus), not just
    replicate it."""
    docs = load_table(spark, SF_CORRECT, "documents")
    from pyspark.sql import functions as F

    n = docs.filter(F.col("text").isNotNull()).count()
    pos = docs.filter(
        F.col("text").isNotNull() & (F.col("n_chars") >= 157)
    ).count()
    base = max(pos, n - pos) / n
    assert trained["n_docs"] == n
    acc = trained["n_correct"] / n
    assert acc >= base + 0.1, (acc, base)
    assert acc >= 0.95


def test_weights_quantized_and_deterministic(spark, trained):
    """Every weight sits exactly on the 1e-6 grid (the trajectory
    quantization), and retraining reproduces bit-identical output —
    the property the unrolled DuckDB twin relies on."""
    for k in ("w1", "w2", "w3", "b"):
        v = trained[k]
        assert v == round(v, 6)
    docs = load_table(spark, SF_CORRECT, "documents")
    again = train_text_classifier(docs).collect()[0]
    assert again == trained


def test_fewer_iterations_changes_trajectory(spark):
    """n_iter is load-bearing (guards against an accidentally constant
    trajectory making the oracle gate vacuous)."""
    docs = load_table(spark, SF_CORRECT, "documents")
    short = train_text_classifier(docs, n_iter=1).collect()[0]
    full = train_text_classifier(docs, n_iter=_N_ITER).collect()[0]
    assert short["w1"] != full["w1"]


def test_algebraic_sigmoid_matches_decision_boundary():
    """σ̃(z) = ½(1 + z/(1+|z|)) keeps the logistic decision boundary:
    σ̃ ≥ ½ ⇔ z ≥ 0, strictly monotone, range (0, 1)."""
    z = np.linspace(-50, 50, 10001)
    p = 0.5 * (1 + z / (1 + np.abs(z)))
    assert ((p >= 0.5) == (z >= 0)).all()
    assert (np.diff(p) > 0).all()
    assert p.min() > 0 and p.max() < 1
