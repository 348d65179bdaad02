"""Ground-truth tests for the time-series workload (gap-fill / OHLC /
time-weighted average) on crafted micro-frames, plus plan-shape guards."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from feature_generation_benchmark_spark.workloads import timeseries

SF_SMOKE = "/root/testdata/sf0.001"

_NS_DAY = 86_400 * 10**9
_US_DAY = 86_400 * 10**6


def _events_parquet(spark, tmp_path_factory, rows):
    """rows: (user_id, event_id, day, frac_of_day, value). Writes an
    events-shaped parquet (ts TIMESTAMP_NTZ at µs precision so load_table's
    both paths agree)."""
    import datetime as dt

    recs = []
    for user_id, event_id, day, frac, value in rows:
        us = day * _US_DAY + int(frac * _US_DAY)
        ts = dt.datetime(1970, 1, 1) + dt.timedelta(microseconds=us)
        recs.append((event_id, ts, user_id, "click", value, "{}"))
    path = str(tmp_path_factory.mktemp("ts_events") / "dir")
    spark.createDataFrame(
        recs,
        "event_id long, ts timestamp_ntz, user_id long, event_type string, "
        "value double, props string",
    ).write.parquet(f"{path}/events.parquet")
    return path


@pytest.fixture(scope="module")
def micro_events(spark, tmp_path_factory):
    # user 1: days 100, 103 (a 2-day gap), two events on day 100
    # user 2: single day (no gaps, no ffill rows)
    return _events_parquet(
        spark,
        tmp_path_factory,
        [
            (1, 10, 100, 0.25, 5.00),
            (1, 11, 100, 0.75, 7.00),
            (1, 12, 103, 0.50, 1.00),
            (2, 20, 200, 0.10, 9.00),
        ],
    )


def test_gap_fill_fills_and_carries(spark, micro_events):
    out = {
        (r.user_id, r.day): r
        for r in timeseries.gap_fill_daily(spark, micro_events).collect()
    }
    assert set(out) == {(1, 100), (1, 101), (1, 102), (1, 103), (2, 200)}
    d100 = out[(1, 100)]
    assert (d100.n_events, d100.day_cents, d100.carried_cents, d100.is_gap) == (
        2,
        1200,
        700,  # later event (0.75 of day) wins argmax
        0,
    )
    for gap_day in (101, 102):
        g = out[(1, gap_day)]
        assert (g.n_events, g.day_cents, g.carried_cents, g.is_gap) == (
            0,
            0,
            700,  # carried forward across the gap
            1,
        )
    d103 = out[(1, 103)]
    assert (d103.carried_cents, d103.is_gap) == (100, 0)
    assert out[(2, 200)].is_gap == 0


def test_ohlc_open_close_tie_break(spark, tmp_path_factory):
    # two events at the SAME timestamp: event_id must break the tie for
    # open (lower id) and close (higher id)
    path = _events_parquet(
        spark,
        tmp_path_factory,
        [
            (1, 1, 50, 0.10, 3.00),
            (1, 2, 50, 0.10, 8.00),
            (1, 3, 50, 0.20, 1.00),
        ],
    )
    bars = timeseries.ohlc_bars(spark, path).collect()
    assert len(bars) == 1
    b = bars[0]
    assert (b.open_cents, b.high_cents, b.low_cents, b.close_cents) == (
        300,
        800,
        100,
        100,
    )
    assert (b.n_events, b.volume_cents) == (3, 1200)


def test_time_weighted_avg_exact(spark, tmp_path_factory):
    # user 1: 10.00 held for 1/4 day, then 20.00 for 1/2 day
    # → twa = (1000*0.25 + 2000*0.5) / 0.75 = 1666.666...
    path = _events_parquet(
        spark,
        tmp_path_factory,
        [
            (1, 1, 10, 0.00, 10.00),
            (1, 2, 10, 0.25, 20.00),
            (1, 3, 10, 0.75, 30.00),  # last event: no interval
            (2, 4, 10, 0.00, 1.00),  # single event → excluded entirely
        ],
    )
    rows = {r.user_id: r for r in timeseries.time_weighted_avg(spark, path).collect()}
    assert set(rows) == {1}
    r = rows[1]
    q = _US_DAY // 4
    assert r.n_intervals == 2
    assert r.span_us == 3 * q
    assert r.weighted_sum == 1000 * q + 2000 * 2 * q
    assert r.twa_cents == pytest.approx(5000 / 3, abs=1e-9)


def _physical(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_gap_fill_shuffles_only_on_user_keys(spark):
    """Every exchange in the gap-fill plan is keyed by user_id (alone or
    with day) — nothing reshuffles on an unbounded axis, so the plan
    scales horizontally with the user space."""
    plan = _physical(timeseries.gap_fill_daily(spark, SF_SMOKE))
    import re

    for m in re.finditer(r"Exchange hashpartitioning\(([^)]*)\)", plan):
        assert "user_id" in m.group(1), plan


def test_ohlc_is_single_shuffle(spark):
    plan = _physical(timeseries.ohlc_bars(spark, SF_SMOKE))
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_gap_fill_invariants_on_corpus(spark):
    """On real testdata: per-user calendars are contiguous, activity mass
    is conserved vs the raw events, and the carried value is never null
    (the first calendar day always has events)."""
    out = timeseries.gap_fill_daily(spark, SF_SMOKE).collect()
    by_user = {}
    for r in out:
        by_user.setdefault(r.user_id, []).append(r)
        assert r.carried_cents is not None
        assert (r.n_events == 0) == (r.is_gap == 1)
    ev = timeseries._events(spark, SF_SMOKE)
    from pyspark.sql import functions as F

    want_cents = {
        r.user_id: r.s
        for r in ev.groupBy("user_id").agg(F.sum("cents").alias("s")).collect()
    }
    for user, rows in by_user.items():
        days = sorted(r.day for r in rows)
        assert days == list(range(days[0], days[-1] + 1))
        assert sum(r.day_cents for r in rows) == want_cents[user]


def test_twa_is_single_user_keyed_shuffle(spark):
    """Window + aggregation share the user_id partitioning: ONE exchange."""
    plan = _physical(timeseries.time_weighted_avg(spark, SF_SMOKE))
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "user_id" in plan.split("Exchange hashpartitioning(")[1], plan


def test_pit_shuffles_only_on_user_keys(spark):
    """Point-in-time backfill: labels/history join and the feature agg are
    both user-keyed — no unbounded-axis shuffle, no nested-loop join."""
    from feature_generation_benchmark_spark.workloads import pit

    plan = _physical(pit.point_in_time_features(spark, SF_SMOKE))
    import re

    ex = re.findall(r"Exchange hashpartitioning\(([^)]*)\)", plan)
    assert ex and all("user_id" in e for e in ex), plan
    assert "CartesianProduct" not in plan, plan
