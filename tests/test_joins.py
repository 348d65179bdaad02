"""Join-operator tests beyond the oracle-checked workload queries:
the skew-safe salted join must be result-identical to the plain join."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from feature_generation_benchmark_spark.operators.joins import salted_join


@pytest.fixture(scope="module")
def skewed(spark):
    # one pathological key (0) carrying 80% of rows, plus a long tail
    left = spark.range(0, 2000).select(
        F.when(F.col("id") < 1600, F.lit(0))
        .otherwise(F.col("id") % 37)
        .alias("k"),
        F.col("id").alias("lv"),
    )
    right = spark.range(0, 37).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("rv")
    )
    return left, right


def _key_set(df):
    return sorted((r["k"], r["lv"], r["rv"]) for r in df.collect())


def test_salted_inner_equals_plain(spark, skewed):
    left, right = skewed
    plain = left.join(right, on="k", how="inner")
    salted = salted_join(left, right, on="k", how="inner", salt=8)
    assert _key_set(salted) == _key_set(plain)


def test_salted_left_keeps_unmatched(spark, skewed):
    left, right = skewed
    few = right.filter(F.col("k") < 5)
    plain = left.join(few, on="k", how="left")
    salted = salted_join(left, few, on="k", how="left", salt=4)
    rows_p = sorted(map(tuple, plain.collect()))
    rows_s = sorted(map(tuple, salted.collect()))
    assert rows_s == rows_p


def test_salted_rejects_unsupported_how(spark, skewed):
    left, right = skewed
    with pytest.raises(ValueError):
        salted_join(left, right, on="k", how="full")
