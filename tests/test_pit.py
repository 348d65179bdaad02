"""Point-in-time feature backfill: leakage-proof ground truth — events at
or after a label's own timestamp must never enter its features."""

from __future__ import annotations

import datetime as dt

import pytest

from feature_generation_benchmark_spark.workloads.pit import (
    point_in_time_features,
)

_US_DAY = 86_400 * 10**6


@pytest.fixture(scope="module")
def pit_events(spark, tmp_path_factory):
    def ts(day, frac):
        return dt.datetime(1970, 1, 1) + dt.timedelta(
            microseconds=day * _US_DAY + int(frac * _US_DAY)
        )

    rows = [
        # user 1: history then a purchase label at day 100.5
        (1, ts(94, 0.5), 1, "view", 1.00, "{}"),      # inside 7d window
        (2, ts(80, 0.5), 1, "error", 2.00, "{}"),     # inside 30d, outside 7d
        (3, ts(60, 0.5), 1, "click", 4.00, "{}"),     # outside 30d: excluded
        (4, ts(100, 0.5), 1, "purchase", 8.00, "{}"),  # THE label
        (5, ts(100, 0.5), 1, "view", 16.00, "{}"),    # same µs: excluded (<)
        (6, ts(100, 0.9), 1, "view", 32.00, "{}"),    # after label: excluded
        # user 2: purchase with no prior history → all-zero features
        (7, ts(50, 0.5), 2, "purchase", 1.00, "{}"),
    ]
    d = str(tmp_path_factory.mktemp("pit") / "dir")
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, event_type string, "
        "value double, props string",
    ).write.parquet(f"{d}/events.parquet")
    return d


def test_pit_single_shuffle_no_join(spark, pit_events):
    """The round-3 plan: labels union events → ONE user-keyed window pass.
    A join in the plan means the quadratic label×history formulation came
    back; a second hashpartitioning Exchange means the 7d/30d frames
    stopped sharing the Window operator."""
    df = point_in_time_features(spark, pit_events)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan, plan
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_pit_hot_user_is_linear(spark, tmp_path_factory):
    """Crafted hot user: 2,000 events, half of them purchases (=1,000
    labels) inside one 30d span. The old join plan materialized ~1M
    label×history rows for this user; the window plan's output is exactly
    n_labels rows and each trailing count matches the closed form."""
    base = dt.datetime(1970, 6, 1)
    rows = [
        (
            i,
            base + dt.timedelta(minutes=i),
            1,
            "purchase" if i % 2 == 0 else "view",
            1.00,
            "{}",
        )
        for i in range(2000)
    ]
    d = str(tmp_path_factory.mktemp("pit_hot") / "dir")
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, event_type string, "
        "value double, props string",
    ).write.parquet(f"{d}/events.parquet")
    out = point_in_time_features(spark, d).collect()
    assert len(out) == 1000
    # all 2,000 events sit inside any 7d window, so label i (event_id
    # 2i... even ids) has exactly `its position in the stream` prior events
    by_id = {r.label_id: r for r in out}
    for label_id in (0, 2, 1000, 1998):
        r = by_id[label_id]
        assert r.n_events_7d == r.n_events_30d == label_id
        assert r.sum_cents_7d == 100 * label_id


def test_pit_null_users_do_not_pool(spark, tmp_path_factory):
    """NULL-user labels must get all-zero features (the oracle's equi-join
    drops NULL keys) — the window partitioner must not pool anonymous
    sessions into one pseudo-user and leak features between them."""
    base = dt.datetime(1970, 6, 1)
    rows = [
        (1, base, None, "view", 5.00, "{}"),
        (2, base + dt.timedelta(hours=1), None, "purchase", 1.00, "{}"),
        (3, base, 7, "view", 2.00, "{}"),
        (4, base + dt.timedelta(hours=1), 7, "purchase", 1.00, "{}"),
    ]
    d = str(tmp_path_factory.mktemp("pit_null") / "dir")
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, event_type string, "
        "value double, props string",
    ).write.parquet(f"{d}/events.parquet")
    out = {r.label_id: r for r in point_in_time_features(spark, d).collect()}
    assert set(out) == {2, 4}
    assert (out[2].n_events_30d, out[2].sum_cents_30d) == (0, 0)  # no leak
    assert (out[4].n_events_30d, out[4].sum_cents_30d) == (1, 200)


def test_pit_no_leakage_and_windows(spark, pit_events):
    out = {r.label_id: r for r in point_in_time_features(spark, pit_events).collect()}
    assert set(out) == {4, 7}
    r = out[4]
    # 7d window: only the day-94 view (100.5 - 7 = 93.5 <= 94.5 < 100.5)
    assert (r.n_events_7d, r.sum_cents_7d, r.n_errors_7d) == (1, 100, 0)
    # 30d window adds the day-80 error; day-60 click and same-/post-label
    # events are excluded
    assert (r.n_events_30d, r.sum_cents_30d, r.n_errors_30d) == (2, 300, 1)
    z = out[7]
    assert (
        z.n_events_7d,
        z.sum_cents_7d,
        z.n_errors_7d,
        z.n_events_30d,
        z.sum_cents_30d,
        z.n_errors_30d,
    ) == (0, 0, 0, 0, 0, 0)
