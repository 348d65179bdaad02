"""Property-based net for the sweep-line interval operator: Hypothesis
generates random order/lineitem interval sets and compares
``open_orders_daily`` against a brute-force per-day recount — every day
in the span, not just emitted endpoint rows (the closed-form unit test
only checks days that appear in the output)."""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from tests._budget import examples

from feature_generation_benchmark_spark.workloads.intervals import (
    open_orders_daily,
)

_SETTINGS = dict(
    max_examples=examples(6),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_BASE = dt.datetime(1995, 1, 1)


@st.composite
def order_sets(draw):
    """(orderkey, priority, open_day, [ship_days >= open_day]) — small
    day range so opens/closes collide; ship days may precede NOTHING
    (every lineitem ships on/after the order date, mirroring TPC-H)."""
    n = draw(st.integers(min_value=1, max_value=10))
    out = []
    for k in range(n):
        pr = draw(st.sampled_from(["1-URGENT", "2-HIGH"]))
        o = draw(st.integers(min_value=0, max_value=8))
        ships = draw(
            st.lists(
                st.integers(min_value=0, max_value=6),
                min_size=1,
                max_size=3,
            )
        )
        out.append((k, pr, o, [o + s for s in ships]))
    return out


@given(orders=order_sets())
@settings(**_SETTINGS)
def test_sweep_line_equals_per_day_recount(
    spark, tmp_path_factory, orders
):
    d = tmp_path_factory.mktemp("prop_sweep")
    spark.createDataFrame(
        [(k, pr, _BASE + dt.timedelta(days=o)) for k, pr, o, _ in orders],
        "o_orderkey long, o_orderpriority string, o_orderdate timestamp_ntz",
    ).coalesce(1).write.mode("overwrite").parquet(str(d / "orders.parquet"))
    spark.createDataFrame(
        [
            (k, _BASE + dt.timedelta(days=s))
            for k, _, _, ships in orders
            for s in ships
        ],
        "l_orderkey long, l_shipdate timestamp_ntz",
    ).coalesce(1).write.mode("overwrite").parquet(
        str(d / "lineitem.parquet")
    )

    rows = open_orders_daily(spark, str(d)).collect()
    epoch_off = (_BASE - dt.datetime(1970, 1, 1)).days
    got = {
        (r["o_orderpriority"], r["day"] - epoch_off): r["open_orders"]
        for r in rows
    }

    # brute force over EVERY day of the span: the sweep output must match
    # on emitted days and be step-constant in between (reconstruct by
    # carrying the last emitted value forward)
    for pr in {p for _, p, _, _ in orders}:
        ivs = [
            (o, max(ships)) for _, p, o, ships in orders if p == pr
        ]
        span_end = max(c for _, c in ivs) + 2
        carried = 0
        for day in range(0, span_end + 1):
            if (pr, day) in got:
                carried = got[(pr, day)]
            expect = sum(1 for o, c in ivs if o <= day <= c)
            assert carried == expect, (pr, day, carried, expect)
