from __future__ import annotations

import pytest

from feature_generation_benchmark_spark.spec import (
    Agg,
    FeatureSpec,
    Grouping,
    reference_spec,
)


def test_reference_spec_feature_count():
    # 5 aggs × (2×13 + 2×13 combos) × 8 windows = 2,080 (docs/index.md:120-151)
    assert reference_spec().n_features == 2080


def test_feature_names_canonical():
    spec = reference_spec()
    names = [f.name for f in spec.features()]
    assert "DC_food-and-household_30d_avg" in names
    assert len(set(names)) == 2080


def test_input_columns_minimal():
    spec = reference_spec()
    assert spec.input_columns() == [
        "card_type",
        "channel",
        "customer_id",
        "t_minus",
        "trx_amnt",
        "trx_type",
    ]


def test_validation():
    g = Grouping(cols=("a",), domains=(("x", "y"),))
    with pytest.raises(ValueError):
        FeatureSpec("k", "t", "m", (), (g,))
    with pytest.raises(ValueError):
        FeatureSpec("k", "t", "m", (14, 7), (g,))
    with pytest.raises(ValueError):
        FeatureSpec("k", "t", "m", (7,), ())
    with pytest.raises(ValueError):
        Grouping(cols=("a", "b"), domains=(("x",),))
    with pytest.raises(ValueError):
        Grouping(cols=("a",), domains=(("x", "x"),))


def test_agg_domain():
    assert [a.value for a in Agg] == ["count", "sum", "avg", "min", "max"]
