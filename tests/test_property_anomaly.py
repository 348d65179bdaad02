"""Property net for user_daily_anomaly: random (user, day, count) grids
vs an independent Python statistics model — checks the integer-algebra
flag against a float z-score computed the textbook way, and the NULL
paths (m<2, zero variance)."""

from __future__ import annotations

import statistics

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from tests._budget import examples

from feature_generation_benchmark_spark.workloads.timeseries import (
    user_daily_anomaly,
)

_SETTINGS = dict(
    max_examples=examples(6),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

@st.composite
def count_grids(draw):
    """{(user, day): n_events} with small day ranges so windows overlap
    and ties/constant runs occur."""
    n = draw(st.integers(min_value=1, max_value=14))
    grid = {}
    for _ in range(n):
        u = draw(st.integers(min_value=1, max_value=2))
        day = draw(st.integers(min_value=0, max_value=35))
        grid[(u, day)] = draw(st.integers(min_value=1, max_value=6))
    return grid


@given(grid=count_grids())
@settings(**_SETTINGS)
def test_anomaly_matches_python_model(spark, tmp_path_factory, grid):
    from tests.conftest import write_events_dir

    d = write_events_dir(
        spark,
        tmp_path_factory,
        [(u, day, n) for (u, day), n in grid.items()],
        name="prop_anom",
    )

    out = {
        (r["user_id"], r["day"]): r
        for r in user_daily_anomaly(spark, d).collect()
    }
    assert set(out) == set(grid)
    for (u, day), n in grid.items():
        base = [
            grid[(u, dd)]
            for dd in range(day - 28, day)
            if (u, dd) in grid
        ]
        r = out[(u, day)]
        assert r["n_events"] == n
        assert r["baseline_days"] == len(base)
        if not base:
            assert r["baseline_mean"] is None
            assert r["zscore"] is None
            assert r["is_anomaly"] is False
            continue
        mean = sum(base) / len(base)
        assert abs(r["baseline_mean"] - mean) < 1e-12
        if len(base) < 2:
            assert r["zscore"] is None
            assert r["is_anomaly"] is False
        elif len(set(base)) == 1:
            # zero variance: z undefined, any deviation flags
            assert r["zscore"] is None
            assert r["is_anomaly"] is (n != base[0])
        else:
            sd = statistics.stdev(base)
            z = (n - mean) / sd
            assert abs(r["zscore"] - z) < 1e-9
            assert r["is_anomaly"] is (abs(z) > 2.5)
