"""Data-quality expectations: violations must actually be DETECTED — the
oracle comparison runs on clean testdata where every check passes, so
this fixture injects one violation of each kind and asserts the counts."""

from __future__ import annotations

import datetime as dt

import pytest

from feature_generation_benchmark_spark.workloads.quality import (
    dq_expectations,
)


@pytest.fixture(scope="module")
def dirty_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("dq") / "dir")
    spark.createDataFrame(
        [
            (1, 10, 100.0, "O"),
            (1, 11, 50.0, "F"),     # duplicate o_orderkey
            (2, 12, -5.0, "O"),     # non-positive totalprice
            (3, None, 20.0, "O"),   # null custkey
        ],
        "o_orderkey long, o_custkey long, o_totalprice double, "
        "o_orderstatus string",
    ).write.parquet(f"{d}/orders.parquet")
    spark.createDataFrame(
        [(1, 1, 5.0), (99, 2, 7.0)],  # 99 → orphan (no such order)
        "l_orderkey long, l_linenumber long, l_quantity double",
    ).write.parquet(f"{d}/lineitem.parquet")
    ts = dt.datetime(2024, 1, 5)
    spark.createDataFrame(
        [
            (1, ts, 7, "click", 1.0, "{}"),
            (2, ts, 7, "hover", 2.0, "{}"),   # out-of-domain type
            (3, ts, 8, "view", -1.0, "{}"),   # negative value
            (4, ts, 8, "view", None, "{}"),   # null value
        ],
        "event_id long, ts timestamp_ntz, user_id long, event_type string, "
        "value double, props string",
    ).write.parquet(f"{d}/events.parquet")
    return d


def test_violations_are_detected(spark, dirty_dir):
    rows = {r.check: r for r in dq_expectations(spark, dirty_dir).collect()}
    expect = {
        "orders_key_unique": (4, 1),
        "orders_price_positive": (4, 1),
        "orders_custkey_not_null": (4, 1),
        "lineitem_fk_orders": (2, 1),
        "events_type_in_domain": (4, 1),
        "events_value_in_range": (4, 2),
    }
    assert set(rows) == set(expect)
    for check, (n, v) in expect.items():
        r = rows[check]
        assert (r.n_checked, r.violations, r.passed) == (n, v, False), check


def test_fk_orphan_audit_clean_on_testdata(spark):
    from feature_generation_benchmark_spark.workloads.quality import (
        fk_orphan_audit,
    )
    from tests.conftest import SF_SMOKE

    rows = {r.edge: r for r in fk_orphan_audit(spark, SF_SMOKE).collect()}
    assert len(rows) == 6
    # driver testdata is referentially intact; the audit must prove it
    assert all(r.n_orphans == 0 for r in rows.values())
    assert rows["lineitem->orders"].n_rows == rows["lineitem->part"].n_rows


def test_fk_orphan_audit_detects_planted_orphans(spark, tmp_path):
    import shutil

    from feature_generation_benchmark_spark.workloads.quality import (
        fk_orphan_audit,
    )
    from tests.conftest import SF_SMOKE

    d = str(tmp_path / "broken")
    shutil.copytree(SF_SMOKE, d)
    # re-point 3 orders at a customer key that cannot exist
    orders = spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
    from pyspark.sql import functions as F

    broken = orders.withColumn(
        "o_custkey",
        F.when(F.col("o_orderkey") % 500 == 0, F.lit(10**12)).otherwise(
            F.col("o_custkey")
        ),
    )
    import os

    os.remove(f"{d}/orders.parquet")  # testdata tables are single files
    broken.write.parquet(f"{d}/orders.parquet")
    n_planted = broken.filter(F.col("o_custkey") == 10**12).count()
    rows = {r.edge: r for r in fk_orphan_audit(spark, d).collect()}
    assert rows["orders->customer"].n_orphans == n_planted > 0
    assert rows["customer->nation"].n_orphans == 0


def test_schema_profile_approx_no_expand(spark):
    """The approx profiler's reason to exist: the exact per-column
    distinct plans as an Expand replicating the fact scan once per
    column (~5x rows); the HLL++ variant must plan as ONE plain
    aggregate with NO Expand."""
    from feature_generation_benchmark_spark.workloads.quality import (
        schema_profile, schema_profile_approx,
    )

    sf = "/root/testdata/sf0.001"
    exact_plan = (
        schema_profile(spark, sf)._jdf.queryExecution().executedPlan()
        .toString()
    )
    approx_plan = (
        schema_profile_approx(spark, sf)._jdf.queryExecution()
        .executedPlan().toString()
    )
    assert "Expand" in exact_plan, exact_plan  # the cost being avoided
    assert "Expand" not in approx_plan, approx_plan
    assert approx_plan.count("FileScan parquet") == 1, approx_plan


def test_schema_profile_approx_check_separates_sketch_from_distinct(spark):
    """The bound-gated verification profiler must keep HLL++ sketches in
    their OWN aggregate, crossJoined to the exact side: Spark's
    multi-distinct rewrite groups partials by (gid, value) and allocates
    every non-distinct buffer per group — mixed in one agg, 5 rsd-1%
    sketches x distinct-value groups OOMs a 1 GB driver on 60k rows."""
    from feature_generation_benchmark_spark.workloads.quality import (
        schema_profile_approx_check,
    )

    import re

    df = schema_profile_approx_check(spark, "/root/testdata/sf0.001")
    collected = df.collect()  # finalize AQE before reading the plan
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the 1-row x 1-row crossJoin is the separation seam
    assert "NestedLoopJoin" in plan or "CartesianProduct" in plan, plan
    # the HLL side must not sit under/above the Expand of the exact side:
    # no hyperloglog buffer may appear in an aggregate that also expands.
    # Enforced structurally: walk every Expand's ANCESTOR chain in the
    # tree string (strictly-decreasing indent upwards) — the multi-
    # distinct rewrite that mixes the buffers would place the
    # approx_count_distinct function in an aggregate ABOVE the Expand.
    lines = plan.splitlines()

    def depth(line: str) -> int:
        return len(re.match(r"^[\s:+*-]*", line).group(0))

    expand_idxs = [i for i, l in enumerate(lines) if "Expand" in l]
    assert expand_idxs, plan
    for i in expand_idxs:
        d = depth(lines[i])
        for prev in reversed(lines[:i]):
            dp = depth(prev)
            if dp < d:
                assert "approx_count_distinct" not in prev, (
                    "HLL buffer in an Expand-ancestor aggregate:\n" + prev
                )
                d = dp
    rows = {r.col_name: r for r in collected}
    assert all(r.distinct_within_5pct for r in rows.values()), rows


def test_schema_profile_approx_close_to_exact(spark):
    """HLL++ estimates within 5% of the exact distinct counts, and every
    non-estimated stat (nulls, min/max, n_rows) identical to the exact
    profiler's."""
    from feature_generation_benchmark_spark.workloads.quality import (
        schema_profile, schema_profile_approx,
    )

    sf = "/root/testdata/sf0.001"
    exact = {r.col_name: r for r in schema_profile(spark, sf).collect()}
    approx = {
        r.col_name: r for r in schema_profile_approx(spark, sf).collect()
    }
    assert exact.keys() == approx.keys()
    for c, e in exact.items():
        a = approx[c]
        assert (a.n_rows, a.n_nulls, a.min_str, a.max_str) == (
            e.n_rows, e.n_nulls, e.min_str, e.max_str,
        ), c
        assert abs(a.n_distinct_approx - e.n_distinct) <= max(
            1, 0.05 * e.n_distinct
        ), (c, a.n_distinct_approx, e.n_distinct)
