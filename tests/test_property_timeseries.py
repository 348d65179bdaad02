"""Property-based checks for the time-series operators: Hypothesis
generates random event logs and compares the Spark plans against
independent brute-force Python models (gap-fill/LOCF, OHLC bars,
time-weighted average) — the correctness net pointed at the r2c surface."""

from __future__ import annotations

import datetime as dt

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from tests._budget import examples

from feature_generation_benchmark_spark.workloads import timeseries

_SETTINGS = dict(
    max_examples=examples(8),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_US_DAY = 86_400 * 10**6


@st.composite
def event_logs(draw):
    """Random (user, event_id, us_offset, cents) tuples — few users, small
    day ranges so gaps/ties actually occur; event times at µs granularity
    including same-timestamp collisions across events."""
    n = draw(st.integers(min_value=1, max_value=18))
    out = []
    for eid in range(n):
        user = draw(st.integers(min_value=1, max_value=3))
        day = draw(st.integers(min_value=100, max_value=106))
        frac_us = draw(st.integers(min_value=0, max_value=_US_DAY - 1))
        cents = draw(st.integers(min_value=0, max_value=10_000))
        out.append((user, eid, day * _US_DAY + frac_us, cents))
    return out


def _write_events(spark, tmp_path_factory, rows):
    recs = [
        (
            eid,
            dt.datetime(1970, 1, 1) + dt.timedelta(microseconds=us),
            user,
            "click",
            cents / 100.0,
            "{}",
        )
        for (user, eid, us, cents) in rows
    ]
    d = tmp_path_factory.mktemp("prop_ts")
    spark.createDataFrame(
        recs,
        "event_id long, ts timestamp_ntz, user_id long, event_type string, "
        "value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(str(d / "events.parquet"))
    return str(d)


def _model_gap_fill(rows):
    by_user = {}
    for user, eid, us, cents in rows:
        by_user.setdefault(user, []).append((us, eid, cents))
    want = {}
    for user, evs in by_user.items():
        daily = {}
        for us, eid, cents in evs:
            d = us // _US_DAY
            agg = daily.setdefault(d, [0, 0, None])
            agg[0] += 1
            agg[1] += cents
            # latest event (ts, event_id) wins
            if agg[2] is None or (us, eid) > agg[2][:2]:
                agg[2] = (us, eid, cents)
        carried = None
        for d in range(min(daily), max(daily) + 1):
            if d in daily:
                n, s, last = daily[d]
                carried = last[2]
                want[(user, d)] = (n, s, carried, 0)
            else:
                want[(user, d)] = (0, 0, carried, 1)
    return want


@given(rows=event_logs())
@settings(**_SETTINGS)
def test_gap_fill_matches_model(spark, tmp_path_factory, rows):
    path = _write_events(spark, tmp_path_factory, rows)
    got = {
        (r.user_id, r.day): (r.n_events, r.day_cents, r.carried_cents, r.is_gap)
        for r in timeseries.gap_fill_daily(spark, path).collect()
    }
    assert got == _model_gap_fill(rows)


def _model_twa(rows):
    by_user = {}
    for user, eid, us, cents in rows:
        by_user.setdefault(user, []).append((us, eid, cents))
    want = {}
    for user, evs in by_user.items():
        evs.sort(key=lambda t: (t[0], t[1]))
        if len(evs) < 2:
            continue
        num = den = 0
        for (us, _e, cents), (us2, _e2, _c2) in zip(evs, evs[1:]):
            dur = us2 - us
            num += dur * cents
            den += dur
        if den == 0:
            # all events share one timestamp: every duration is 0 — the
            # operator keeps the user (>=2 events always leave >=1
            # interval row) and pins the 0-span average to NULL
            want[user] = (len(evs) - 1, 0, 0, None)
        else:
            want[user] = (len(evs) - 1, den, num, num / den)
    return want


@given(rows=event_logs())
@settings(**_SETTINGS)
def test_time_weighted_avg_matches_model(spark, tmp_path_factory, rows):
    path = _write_events(spark, tmp_path_factory, rows)
    got = {
        r.user_id: (r.n_intervals, r.span_us, r.weighted_sum, r.twa_cents)
        for r in timeseries.time_weighted_avg(spark, path).collect()
    }
    want = _model_twa(rows)
    assert set(got) == set(want)
    for user, (n, den, num, twa) in want.items():
        gn, gden, gnum, gtwa = got[user]
        assert (gn, gden, gnum) == (n, den, num)
        if twa is None:
            # span-0 users are pinned to NULL (deterministic, oracle-equal)
            assert gtwa is None
        else:
            assert gtwa == twa  # single IEEE division both sides


def _model_ohlc(rows):
    _BAR_US = 6 * 3600 * 10**6
    bars = {}
    for user, eid, us, cents in rows:
        bar = (us // _BAR_US) * _BAR_US
        b = bars.setdefault(bar, [])
        b.append((us, eid, cents))
    want = {}
    for bar, evs in bars.items():
        evs.sort(key=lambda t: (t[0], t[1]))
        cs = [c for _, _, c in evs]
        want[bar] = (
            evs[0][2],
            max(cs),
            min(cs),
            evs[-1][2],
            len(evs),
            sum(cs),
        )
    return want


@given(rows=event_logs())
@settings(**_SETTINGS)
def test_ohlc_matches_model(spark, tmp_path_factory, rows):
    path = _write_events(spark, tmp_path_factory, rows)
    got = {
        r.bar_start_us: (
            r.open_cents,
            r.high_cents,
            r.low_cents,
            r.close_cents,
            r.n_events,
            r.volume_cents,
        )
        for r in timeseries.ohlc_bars(spark, path).collect()
    }
    assert got == _model_ohlc(rows)
