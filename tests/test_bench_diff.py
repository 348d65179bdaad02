"""Unit tests for the bench regression tripwire (tools/bench_diff.py)."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from tools.bench_diff import diff_benches


def _detail(queries):
    return {"metric": "per_query_wall_clock", "sf": 0.1, "queries": queries}


def test_flags_only_ratio_and_delta_regressions():
    old = _detail({"a": 2.0, "b": 0.3, "c": 4.0, "d": 1.0})
    new = _detail({"a": 3.5, "b": 0.5, "c": 4.2, "d": 1.2})
    rep = diff_benches(old, new)
    # a: 1.75x and +1.5s -> flagged
    assert set(rep["regressed"]) == {"a"}
    # b: 1.67x but only +0.2s (noise floor) -> NOT flagged
    # c: +0.2s and 1.05x -> NOT flagged
    assert rep["n_common"] == 4
    assert rep["common_total_ratio"] > 1


def test_reports_improved_added_removed():
    old = _detail({"a": 3.0, "gone": 1.0})
    new = _detail({"a": 1.0, "fresh": 2.0})
    rep = diff_benches(old, new)
    assert set(rep["improved"]) == {"a"}
    assert rep["added"] == ["fresh"]
    assert rep["removed"] == ["gone"]
    assert not rep["regressed"]


def test_zero_old_timing_is_skipped():
    rep = diff_benches(_detail({"a": 0.0}), _detail({"a": 5.0}))
    assert not rep["regressed"] and not rep["improved"]


def test_noise_flagged_regressions_are_separated():
    """r6 verdict #8: a >threshold swing that bench.py re-measured and
    classified as host noise (rerun back near committed) must land in
    'noise', not 'regressed'; an unflagged or non-noise swing still
    regresses."""
    old = {"queries": {"a": 1.0, "b": 1.0}}
    new = {
        "queries": {"a": 3.0, "b": 3.0},
        "noise_flagged": {
            "a": {"committed": 1.0, "first": 3.0, "rerun": 1.1,
                  "noise": True},
            "b": {"committed": 1.0, "first": 3.0, "rerun": 2.9,
                  "noise": False},
        },
    }
    report = diff_benches(old, new, threshold=1.5, min_delta=0.5)
    assert list(report["noise"]) == ["a"]
    assert report["noise"]["a"]["rerun"] == 1.1
    assert list(report["regressed"]) == ["b"]
