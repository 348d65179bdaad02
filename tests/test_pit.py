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
