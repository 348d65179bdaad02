"""Tie-permutation nets for the sequential folds (r4 verdict #7).

windowFunnel, CUSUM, and EMA are array folds over per-key sequences
sorted inside the engine; the one axis the per-operator nets don't
randomize is the ORDER the tied rows arrive in (same-timestamp events /
same-date orders). That input order decides ``collect_list`` order, so
any fold whose sort key doesn't totally order its elements (or whose
tied elements aren't interchangeable) diverges from its order-free SQL
twin exactly here — the classic fold-vs-SQL divergence. Each test
generates tie-HEAVY streams (timestamps drawn from ≤3 distinct values),
feeds the engine a hypothesis-chosen permutation of the rows, and
asserts the result still equals the order-independent Python model.

Tie contracts under test (documented in each fold's docstring):
- windowFunnel sorts by (ts, step): equal-ts later steps may chain off
  equal-ts earlier steps (t2 >= t1); elements equal in BOTH fields are
  interchangeable in the DP.
- CUSUM folds the per-(type, day) SUM series — same-day events collapse
  into one integer before the fold ever sees them.
- EMA sorts by (o_orderdate, o_orderkey, cents): the unique orderkey
  totally orders same-date orders, matching the oracle's ORDER BY.

Default 10 examples per net for suite time; the deep 200-example run
(SPARK_GRAFT_NET_EXAMPLES=67 → 67×3 nets) is recorded in COVERAGE.md.
"""

from __future__ import annotations

import datetime as dt
import itertools
import os
from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from tests.test_r4_ops import _write_events

from tests._budget import examples

_SETTINGS = dict(
    max_examples=int(os.environ.get("SPARK_GRAFT_NET_EXAMPLES", "0")) or examples(10),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_US = 10**6
_DAY_US = 86_400 * _US
#: three tied instants on two days — every stream collides heavily
_TIED_TS = (19_723 * _DAY_US, 19_723 * _DAY_US + 5, 19_730 * _DAY_US)


@st.composite
def tied_event_streams(draw):
    """(event_id, us, user_id, type, value) rows where timestamps come
    from only three distinct instants, plus a permutation of row order —
    same-(user, ts) and same-(user, ts, step) duplicates are the norm,
    not the edge case."""
    n = draw(st.integers(min_value=3, max_value=24))
    rows = []
    for eid in range(n):
        us = draw(st.sampled_from(_TIED_TS))
        uid = draw(st.integers(min_value=1, max_value=3))
        typ = draw(st.sampled_from(["view", "click", "purchase"]))
        val = float(draw(st.integers(min_value=1, max_value=500)))
        rows.append((eid, us, uid, typ, val))
    perm = draw(st.permutations(rows))
    return perm


@given(rows=tied_event_streams())
@settings(**_SETTINGS)
def test_window_funnel_tie_invariant(spark, tmp_path_factory, rows):
    from feature_generation_benchmark_spark.workloads.funnel import (
        _WF_WINDOW_US,
        window_funnel_depth,
    )

    d = _write_events(spark, tmp_path_factory, rows, "wfties")
    steps = {"view": 1, "click": 2, "purchase": 3}
    by_user: dict[int, list] = {}
    for _eid, us, uid, typ, _val in rows:
        by_user.setdefault(uid, []).append((us, steps[typ]))

    def brute(evs):
        t1s = [us for us, s in evs if s == 1]
        t2s = [us for us, s in evs if s == 2]
        t3s = [us for us, s in evs if s == 3]
        best = 1 if t1s else 0
        for t1, t2 in itertools.product(t1s, t2s):
            if t2 >= t1 and t2 - t1 <= _WF_WINDOW_US:
                best = max(best, 2)
                if any(
                    t3 >= t2 and t3 - t1 <= _WF_WINDOW_US for t3 in t3s
                ):
                    return 3
        return best

    want = Counter(brute(evs) for evs in by_user.values())
    got = {
        r["depth"]: r["n_users"]
        for r in window_funnel_depth(spark, d).collect()
    }
    assert got == dict(want)


@given(rows=tied_event_streams())
@settings(**_SETTINGS)
def test_cusum_tie_invariant(spark, tmp_path_factory, rows):
    from feature_generation_benchmark_spark.workloads.timeseries import (
        _CUSUM_H_MULT,
        cusum_daily_alarms,
    )

    d = _write_events(spark, tmp_path_factory, rows, "cusumties")
    daily: dict[str, Counter] = {}
    for _eid, us, _uid, typ, val in rows:
        day = us // _DAY_US
        daily.setdefault(typ, Counter())[day] += int(round(val * 100))
    want = {}
    for typ, series in daily.items():
        xs = [series[day] for day in sorted(series)]
        k = sum(xs) // len(xs)
        s = alarms = max_s = 0
        for x in xs:
            s = max(0, s + x - k)
            if s > _CUSUM_H_MULT * k:
                alarms += 1
            max_s = max(max_s, s)
        want[typ] = (len(xs), k, alarms, max_s)
    got = {
        r["event_type"]: (r["n_days"], r["k"], r["n_alarms"], r["max_s"])
        for r in cusum_daily_alarms(spark, d).collect()
    }
    assert got == want


@st.composite
def tied_order_tables(draw):
    """(o_orderkey, o_custkey, o_orderdate, o_totalprice) rows with only
    TWO distinct dates (same-date ties everywhere), permuted."""
    n = draw(st.integers(min_value=2, max_value=16))
    rows = []
    for key in range(n):
        cust = draw(st.integers(min_value=1, max_value=3))
        date = draw(
            st.sampled_from([dt.date(2024, 1, 5), dt.date(2024, 2, 5)])
        )
        price = float(draw(st.integers(min_value=1, max_value=99999)))
        rows.append((key, cust, date, price))
    return draw(st.permutations(rows))


@given(rows=tied_order_tables())
@settings(**_SETTINGS)
def test_ema_tie_invariant(spark, tmp_path_factory, rows):
    from feature_generation_benchmark_spark.workloads.timeseries import (
        ema_customer_spend,
    )

    d = tmp_path_factory.mktemp("ematies")
    spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderdate date, "
        "o_totalprice double",
    ).coalesce(1).write.mode("overwrite").parquet(
        str(d / "orders.parquet")
    )
    want = {}
    by_cust: dict[int, list] = {}
    for key, cust, date, price in rows:
        by_cust.setdefault(cust, []).append((date, key, round(price * 100)))
    for cust, orders in by_cust.items():
        e = -1
        for _date, _key, cents in sorted(orders):
            e = cents if e == -1 else (cents + 3 * e) // 4
        want[cust] = (len(orders), e)
    got = {
        r["o_custkey"]: (r["n_orders"], r["ema_cents"])
        for r in ema_customer_spend(spark, str(d)).collect()
    }
    assert got == want
