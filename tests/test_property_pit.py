"""Hypothesis net for the point-in-time backfill's window formulation.

The r3 rewrite replaced the label×history join with sliding range frames
over a union; this property test replays random event logs (few users,
coarse µs grid so same-timestamp collisions and exact 7d/30d boundary
hits actually occur) against a brute-force python model of the PIT
contract: features from events strictly before the label, within
inclusive trailing windows, label's own co-timestamped events excluded.
"""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from tests._budget import examples

from feature_generation_benchmark_spark.workloads.pit import (
    _WINDOWS_US,
    point_in_time_features,
)

_US_DAY = 86_400 * 10**6
_W7, _W30 = _WINDOWS_US["7d"], _WINDOWS_US["30d"]

_SETTINGS = dict(
    max_examples=examples(8),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@st.composite
def typed_event_logs(draw):
    """(user, eid, us, cents, etype) on a coarse time grid: day spans up
    to 40 (straddling both windows), sub-day offsets from a 4-value set so
    exact-boundary and same-timestamp cases are common."""
    n = draw(st.integers(min_value=1, max_value=16))
    out = []
    for eid in range(n):
        user = draw(st.integers(min_value=1, max_value=2))
        day = draw(st.integers(min_value=100, max_value=140))
        frac = draw(st.sampled_from([0, 1, 2, 3]))
        cents = draw(st.integers(min_value=0, max_value=10_000))
        etype = draw(st.sampled_from(["purchase", "view", "error"]))
        out.append((user, eid, day * _US_DAY + frac, cents, etype))
    return out


def _model_pit(rows):
    want = {}
    for u, eid, us, _c, t in rows:
        if t != "purchase":
            continue
        f = [0, 0, 0, 0, 0, 0]
        for u2, _e2, us2, c2, t2 in rows:
            if u2 != u or not (us - _W30 <= us2 < us):
                continue
            f[3] += 1
            f[4] += c2
            f[5] += t2 == "error"
            if us2 >= us - _W7:
                f[0] += 1
                f[1] += c2
                f[2] += t2 == "error"
        want[eid] = (u, us, *f)
    return want


@given(rows=typed_event_logs())
@settings(**_SETTINGS)
def test_pit_matches_model(spark, tmp_path_factory, rows):
    recs = [
        (
            eid,
            dt.datetime(1970, 1, 1) + dt.timedelta(microseconds=us),
            user,
            etype,
            cents / 100.0,
            "{}",
        )
        for (user, eid, us, cents, etype) in rows
    ]
    d = tmp_path_factory.mktemp("prop_pit")
    spark.createDataFrame(
        recs,
        "event_id long, ts timestamp_ntz, user_id long, event_type string, "
        "value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(str(d / "events.parquet"))

    got = {
        r.label_id: (
            r.user_id,
            r.label_ts_us,
            r.n_events_7d,
            r.sum_cents_7d,
            r.n_errors_7d,
            r.n_events_30d,
            r.sum_cents_30d,
            r.n_errors_30d,
        )
        for r in point_in_time_features(spark, str(d)).collect()
    }
    assert got == _model_pit(rows)
