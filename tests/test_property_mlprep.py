"""Property nets for the training-prep operators: random event streams
through psi_feature_drift / histogram_quantile_rollup /
audience_overlap_jaccard and random order tables through
target_encoding_loo, each against an independent Python model."""

from __future__ import annotations

import datetime as dt
import math
from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from tests._budget import examples

from feature_generation_benchmark_spark.workloads.mlprep import (
    _HIST_BIN_CENTS,
    _HIST_BINS,
    _PSI_BIN_CENTS,
    _PSI_BINS,
    _PSI_SPLIT_DAY,
    _TE_SMOOTH_M,
    audience_overlap_jaccard,
    histogram_quantile_rollup,
    psi_feature_drift,
    target_encoding_loo,
)
from tests.test_r4_ops import _write_events

_SETTINGS = dict(
    max_examples=examples(5),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_US = 10**6
#: first microsecond of window A (2024-01-01) / window B (2024-01-16)
_A_US = 19_723 * 86_400 * _US
_B_US = _PSI_SPLIT_DAY * 86_400 * _US


@st.composite
def psi_streams(draw):
    """(event_id, us, user_id, type, value) rows split across the PSI
    windows, values spanning several bins including the clamp bin."""
    n = draw(st.integers(min_value=2, max_value=40))
    rows = []
    for eid in range(n):
        side = draw(st.booleans())
        base = _A_US if side else _B_US
        us = base + draw(st.integers(min_value=0, max_value=13)) * 86_400 * _US
        uid = draw(st.integers(min_value=1, max_value=4))
        typ = draw(st.sampled_from(["x", "y"]))
        val = draw(
            st.sampled_from([0.5, 49.99, 50.0, 123.45, 260.0, 449.0, 9999.0])
        )
        rows.append((eid, us, uid, typ, val))
    return rows


def _psi_model(rows):
    """Independent PSI model: same bins, smoothing, and per-bin e6
    quantization as the engine contract."""
    out = {}
    by_type = {}
    for _eid, us, _uid, typ, val in rows:
        day = us // (86_400 * _US)
        b = min(int(round(val * 100)) // _PSI_BIN_CENTS, _PSI_BINS - 1)
        by_type.setdefault(typ, Counter())[(b, day < _PSI_SPLIT_DAY)] += 1
    for typ, c in by_type.items():
        na = sum(v for (b, a), v in c.items() if a)
        nb = sum(v for (b, a), v in c.items() if not a)
        psi = 0
        for b in range(_PSI_BINS):
            pa = (c[(b, True)] + 1) / (na + _PSI_BINS)
            pb = (c[(b, False)] + 1) / (nb + _PSI_BINS)
            psi += round((pa - pb) * math.log(pa / pb) * 1e6)
        out[typ] = (na, nb, psi)
    return out


@given(rows=psi_streams())
@settings(**_SETTINGS)
def test_psi_matches_python_model(spark, tmp_path_factory, rows):
    d = _write_events(spark, tmp_path_factory, rows, "psiprop")
    want = _psi_model(rows)
    got = {
        r["event_type"]: (r["n_a"], r["n_b"], r["psi_e6"])
        for r in psi_feature_drift(spark, d).collect()
    }
    # model quantizes per-bin like the engine; allow 1 micro-unit per bin
    assert set(got) == set(want)
    for typ in want:
        assert got[typ][:2] == want[typ][:2]
        assert abs(got[typ][2] - want[typ][2]) <= _PSI_BINS


@given(rows=psi_streams())
@settings(**_SETTINGS)
def test_psi_window_swap_symmetry(spark, tmp_path_factory, rows):
    """PSI(A,B) == PSI(B,A): each (pa-pb)·ln(pa/pb) term is symmetric
    under swapping the windows, so mirroring every event to the other
    window must leave psi_e6 unchanged and swap (n_a, n_b)."""
    mirrored = []
    for eid, us, uid, typ, val in rows:
        if us >= _B_US:
            us2 = _A_US + (us - _B_US)
        else:
            us2 = _B_US + (us - _A_US)
        mirrored.append((eid, us2, uid, typ, val))
    d1 = _write_events(spark, tmp_path_factory, rows, "psiswap_a")
    d2 = _write_events(spark, tmp_path_factory, mirrored, "psiswap_b")
    r1 = {
        r["event_type"]: r for r in psi_feature_drift(spark, d1).collect()
    }
    r2 = {
        r["event_type"]: r for r in psi_feature_drift(spark, d2).collect()
    }
    assert set(r1) == set(r2)
    for typ in r1:
        assert r1[typ]["psi_e6"] == r2[typ]["psi_e6"]
        assert (r1[typ]["n_a"], r1[typ]["n_b"]) == (
            r2[typ]["n_b"],
            r2[typ]["n_a"],
        )


@given(rows=psi_streams())
@settings(**_SETTINGS)
def test_histogram_rollup_matches_python_model(
    spark, tmp_path_factory, rows
):
    d = _write_events(spark, tmp_path_factory, rows, "histprop")
    hist = {}
    for _eid, _us, _uid, typ, val in rows:
        b = min(int(round(val * 100)) // _HIST_BIN_CENTS, _HIST_BINS - 1)
        hist.setdefault(typ, Counter())[b] += 1
    for r in histogram_quantile_rollup(spark, d).collect():
        c = hist[r["event_type"]]
        n = sum(c.values())
        assert r["n"] == n

        def lb(q_num, q_den):
            cum = 0
            thresh = -(-n * q_num // q_den)  # ceil
            for b in sorted(c):
                cum += c[b]
                if cum >= thresh:
                    return b
            raise AssertionError("unreachable")

        assert r["p50_bin"] == lb(1, 2)
        assert r["p90_bin"] == lb(9, 10)


@given(rows=psi_streams())
@settings(**_SETTINGS)
def test_audience_overlap_matches_python_model(
    spark, tmp_path_factory, rows
):
    d = _write_events(spark, tmp_path_factory, rows, "audprop")
    sets = {}
    for _eid, _us, uid, typ, _val in rows:
        sets.setdefault(typ, set()).add(uid)
    got = {
        (r["ta"], r["tb"]): r
        for r in audience_overlap_jaccard(spark, d).collect()
    }
    types = sorted(sets)
    expected_pairs = {
        (a, b)
        for i, a in enumerate(types)
        for b in types[i + 1 :]
        if sets[a] & sets[b]
    }
    assert set(got) == expected_pairs
    for (a, b), r in got.items():
        inter = len(sets[a] & sets[b])
        union = len(sets[a] | sets[b])
        assert r["inter"] == inter
        assert r["na"] == len(sets[a]) and r["nb"] == len(sets[b])
        # floor(x+0.5) = Spark/DuckDB half-UP round; Python round() is
        # banker's (a half-integer needs 2^7 | union — unreachable at
        # this generation size, but mirror the engine exactly anyway).
        assert r["jaccard_e6"] == math.floor(inter * 1e6 / union + 0.5)


@st.composite
def order_tables(draw):
    n = draw(st.integers(min_value=2, max_value=40))
    rows = []
    for i in range(n):
        rows.append(
            (
                i,
                draw(st.sampled_from(["P1", "P2", "P3"])),
                draw(st.sampled_from(["F", "O", "P"])),
                float(draw(st.integers(min_value=1, max_value=99999)))
                / 100.0,
            )
        )
    return rows


@given(rows=order_tables())
@settings(**_SETTINGS)
def test_target_encoding_matches_python_model(
    spark, tmp_path_factory, rows
):
    d = tmp_path_factory.mktemp("teprop")
    spark.createDataFrame(
        [
            (k, k % 7, s, t, dt.datetime(2024, 1, 1 + k % 28), p)
            for (k, p, s, t) in rows
        ],
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp_ntz, "
        "o_orderpriority string",
    ).coalesce(1).write.mode("overwrite").parquet(
        str(d / "orders.parquet")
    )
    cat_stats = Counter()
    cat_n = Counter()
    for k, p, s, t in rows:
        cat_stats[p] += 1 if s == "F" else 0
        cat_n[p] += 1
    gmean = sum(cat_stats.values()) / len(rows)
    got = {
        r["o_orderkey"]: r for r in target_encoding_loo(spark, str(d)).collect()
    }
    assert len(got) == len(rows)
    for k, p, s, t in rows:
        label = 1 if s == "F" else 0
        # Half-UP on the double, mirroring Spark/DuckDB round() — Python's
        # round() is banker's and disagrees on exact .5 boundaries (found
        # by hypothesis: enc = 320312.5 → Spark 320313, round() 320312).
        want = math.floor(
            (cat_stats[p] - label + _TE_SMOOTH_M * gmean)
            / (cat_n[p] - 1 + _TE_SMOOTH_M)
            * 1e6
            + 0.5
        )
        assert got[k]["enc_e6"] == want, (k, p, s)
        assert got[k]["label"] == label


# -------------------------------------------------- r4e fold operators ----

@given(rows=psi_streams())
@settings(**_SETTINGS)
def test_window_funnel_matches_bruteforce_on_random_streams(
    spark, tmp_path_factory, rows
):
    """The O(steps)-state DP frontier equals brute-force chain search on
    random streams (types remapped onto the funnel stages so chains of
    every depth occur)."""
    import itertools

    from feature_generation_benchmark_spark.workloads.funnel import (
        _WF_WINDOW_US,
        window_funnel_depth,
    )

    stage = {"x": "view", "y": "click"}
    remapped = [
        (eid, us, uid, stage.get(typ, typ) if eid % 3 else "purchase", val)
        for eid, us, uid, typ, val in rows
    ]
    d = _write_events(spark, tmp_path_factory, remapped, "wfprop")
    steps = {"view": 1, "click": 2, "purchase": 3}
    by_user = {}
    for eid, us, uid, typ, _val in remapped:
        by_user.setdefault(uid, []).append((us, steps.get(typ)))

    def brute(evs):
        t1s = sorted(us for us, s in evs if s == 1)
        t2s = sorted(us for us, s in evs if s == 2)
        t3s = sorted(us for us, s in evs if s == 3)
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


@given(rows=psi_streams())
@settings(**_SETTINGS)
def test_cusum_matches_python_on_random_streams(
    spark, tmp_path_factory, rows
):
    from feature_generation_benchmark_spark.workloads.timeseries import (
        _CUSUM_H_MULT,
        cusum_daily_alarms,
    )

    d = _write_events(spark, tmp_path_factory, rows, "cusumprop")
    daily = {}
    for _eid, us, _uid, typ, val in rows:
        day = us // (86_400 * _US)
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
