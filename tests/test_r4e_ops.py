"""Model tests for the r4e text additions (skip-gram PMI)."""

from __future__ import annotations

import math
import re
from collections import Counter

import duckdb

from feature_generation_benchmark_spark.workloads.text import (
    _PMI_MIN_COUNT,
    _PMI_TOP_K,
    _PMI_WINDOW,
    skipgram_pmi,
)

from tests.conftest import SF_SMOKE


def _toks(text: str) -> list[str]:
    return [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]


def test_skipgram_pmi_matches_counter_model(spark):
    rows = skipgram_pmi(spark, SF_SMOKE).collect()
    texts = [
        t
        for (t,) in duckdb.sql(
            f"SELECT text FROM read_parquet('{SF_SMOKE}/documents.parquet')"
        ).fetchall()
    ]
    uni: Counter = Counter()
    pairs: Counter = Counter()
    for text in texts:
        toks = _toks(text)
        uni.update(toks)
        for d in range(1, _PMI_WINDOW + 1):
            for a, b in zip(toks, toks[d:]):
                pairs[(min(a, b), max(a, b))] += 1
    kept = {p: c for p, c in pairs.items() if c >= _PMI_MIN_COUNT}
    n_pair = sum(kept.values())
    t_tok = sum(uni.values())
    want_order = sorted(kept.items(), key=lambda kv: (-kv[1], kv[0]))[
        :_PMI_TOP_K
    ]
    assert len(rows) == len(want_order)
    got = {(r.ta, r.tb): r for r in rows}
    for (ta, tb), c_ab in want_order:
        r = got[(ta, tb)]
        assert r.c_ab == c_ab
        assert r.c_a == uni[ta] and r.c_b == uni[tb]
        pmi = math.log(
            (c_ab / n_pair) * (t_tok / uni[ta]) * (t_tok / uni[tb])
        )
        # model multiplies in the same order as the engines; allow 1
        # micro-log unit for the quantization boundary
        assert abs(r.pmi_e6 - round(pmi * 1e6)) <= 1, (ta, tb)


def test_skipgram_pmi_collocations_score_high(spark):
    # a pair that always co-occurs must out-PMI a pair of independent
    # frequent tokens — sanity of sign and ordering on real data
    rows = skipgram_pmi(spark, SF_SMOKE).collect()
    assert any(r.pmi_e6 > 0 for r in rows)


def test_window_funnel_matches_bruteforce_model(spark):
    """The O(steps)-state DP frontier must agree with brute-force chain
    enumeration on the real corpus."""
    import itertools

    from feature_generation_benchmark_spark.workloads.funnel import (
        _WF_WINDOW_US,
        window_funnel_depth,
    )

    rows = duckdb.sql(
        "SELECT user_id, epoch_us(ts) AS us, event_type FROM "
        f"read_parquet('{SF_SMOKE}/events.parquet')"
    ).fetchall()
    steps = {"view": 1, "click": 2, "purchase": 3}
    by_user = {}
    for uid, us, et in rows:
        by_user.setdefault(uid, []).append((us, steps.get(et)))

    def brute_depth(evs):
        evs = sorted((us, s) for us, s in evs if s)
        t1s = [us for us, s in evs if s == 1]
        t2s = [us for us, s in evs if s == 2]
        t3s = [us for us, s in evs if s == 3]
        best = 0
        if t1s:
            best = 1
        for t1, t2 in itertools.product(t1s, t2s):
            if t2 >= t1 and t2 - t1 <= _WF_WINDOW_US:
                best = max(best, 2)
                for t3 in t3s:
                    if t3 >= t2 and t3 - t1 <= _WF_WINDOW_US:
                        return 3
        return best

    want = Counter(brute_depth(evs) for evs in by_user.values())
    got = {
        r["depth"]: r["n_users"]
        for r in window_funnel_depth(spark, SF_SMOKE).collect()
    }
    assert got == dict(want)


def test_cusum_matches_python_model(spark):
    from feature_generation_benchmark_spark.workloads.timeseries import (
        _CUSUM_H_MULT,
        cusum_daily_alarms,
    )

    rows = duckdb.sql(
        "SELECT event_type, epoch_ns(ts) // 86400000000000 AS day, "
        "sum(CAST(round(value*100) AS BIGINT)) AS x FROM "
        f"read_parquet('{SF_SMOKE}/events.parquet') "
        "GROUP BY event_type, day ORDER BY event_type, day"
    ).fetchall()
    series = {}
    for et, day, x in rows:
        series.setdefault(et, []).append(x)
    want = {}
    for et, xs in series.items():
        k = sum(xs) // len(xs)
        s = alarms = max_s = 0
        for x in xs:
            s = max(0, s + x - k)
            if s > _CUSUM_H_MULT * k:
                alarms += 1
            max_s = max(max_s, s)
        want[et] = (len(xs), k, alarms, max_s)
    got = {
        r.event_type: (r.n_days, r.k, r.n_alarms, r.max_s)
        for r in cusum_daily_alarms(spark, SF_SMOKE).collect()
    }
    assert got == want


def test_trend_slope_recovers_planted_line(spark, tmp_path_factory):
    """A user with exactly linear daily spend must recover the planted
    slope; a flat user must get slope 0."""
    import datetime as dt

    from feature_generation_benchmark_spark.workloads.features_eng import (
        user_trend_slope,
    )

    day_ns = 86_400 * 10**9
    base = 1_704_067_200_000_000_000
    rows = []
    eid = 0
    for d in range(10):
        # user 1: cents = 1000 + 250*d  (slope 250 cents/day)
        rows.append((eid, base + d * day_ns, 1, "t", (1000 + 250 * d) / 100))
        eid += 1
        # user 2: flat 500 cents
        rows.append((eid, base + d * day_ns, 2, "t", 5.0))
        eid += 1
    d = tmp_path_factory.mktemp("trend")
    spark.createDataFrame(
        [(e, dt.datetime(1970, 1, 1) + dt.timedelta(
            microseconds=ns // 1000), u, t, v, "{}")
         for e, ns, u, t, v in rows],
        "event_id long, ts timestamp_ntz, user_id long, "
        "event_type string, value double, props string",
    ).write.parquet(str(d / "events.parquet"))
    got = {
        r.user_id: r.slope_e6_cents_per_day
        for r in user_trend_slope(spark, str(d)).collect()
    }
    assert got[1] == 250 * 10**6
    assert got[2] == 0


def test_bootstrap_weights_are_poisson1_and_deterministic(spark):
    """The md5-threshold weights must (a) be reproducible run-to-run and
    (b) draw from Poisson(1): mean weight ~ 1 and the replicate grand
    sum ~ B x the true total."""
    from feature_generation_benchmark_spark.workloads.mlprep import (
        _BOOT_B,
        bootstrap_se_spend,
    )

    a = sorted(tuple(r) for r in bootstrap_se_spend(spark, SF_SMOKE).collect())
    b = sorted(tuple(r) for r in bootstrap_se_spend(spark, SF_SMOKE).collect())
    assert a == b  # hash-seeded: no run-to-run randomness
    totals = dict(
        duckdb.sql(
            "SELECT event_type, sum(CAST(round(value*100) AS BIGINT)) FROM "
            f"read_parquet('{SF_SMOKE}/events.parquet') GROUP BY event_type"
        ).fetchall()
    )
    for et, n_reps, rep_sum, var in a:
        assert n_reps == _BOOT_B
        true_total = totals[et]
        # E[rep_sum] = B * total; Poisson(1) keeps it within a few
        # percent at a couple hundred events per type
        assert abs(rep_sum - _BOOT_B * true_total) < 0.2 * _BOOT_B * true_total
        assert var > 0
