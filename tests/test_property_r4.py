"""Property nets for the round-4 operators: random event streams through
scd2_intervals / event_debounce / markov_transitions and random corpora
through char_entropy, each against an independent Python model."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from tests._budget import examples

from feature_generation_benchmark_spark.workloads.funnel import (
    markov_transitions,
)
from feature_generation_benchmark_spark.workloads.intervals import (
    scd2_intervals,
)
from feature_generation_benchmark_spark.workloads.text import char_entropy
from feature_generation_benchmark_spark.workloads.timeseries import (
    event_debounce,
)
from tests.conftest import write_docs_dir
from tests.test_r4_ops import _US, _write_events

_SETTINGS = dict(
    max_examples=examples(6),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@st.composite
def event_streams(draw):
    """Random (event_id, us, user_id, type, value) rows: few users, few
    types, second-granular times in a small range so gaps straddle the
    60 s debounce threshold and types repeat (SCD2 compression)."""
    n = draw(st.integers(min_value=1, max_value=30))
    rows = []
    for eid in range(n):
        us = draw(st.integers(min_value=0, max_value=300)) * _US
        uid = draw(st.integers(min_value=1, max_value=3))
        typ = draw(st.sampled_from(["a", "b", "c"]))
        rows.append((eid, us, uid, typ, 1.0))
    return rows


def _ordered(rows):
    """Per-user streams ordered the operators' way: (us, event_id)."""
    by_user = defaultdict(list)
    for eid, us, uid, typ, _val in rows:
        by_user[uid].append((us, eid, typ))
    for v in by_user.values():
        v.sort()
    return by_user


@given(rows=event_streams())
@settings(**_SETTINGS)
def test_scd2_matches_python_model(spark, tmp_path_factory, rows):
    d = _write_events(spark, tmp_path_factory, rows, "prop_scd2")
    got = {
        r["user_id"]: r.asDict() for r in scd2_intervals(spark, d).collect()
    }
    for uid, stream in _ordered(rows).items():
        starts = []
        prev = None
        for us, eid, typ in stream:
            if prev is None or typ != prev:
                starts.append(us)
            prev = typ
        durs = [b - a for a, b in zip(starts, starts[1:])]
        r = got[uid]
        assert r["n_versions"] == len(starts)
        assert r["n_closed"] == len(durs)
        assert r["total_closed_dur_us"] == sum(durs)
        assert r["max_closed_dur_us"] == (max(durs) if durs else 0)


@given(rows=event_streams())
@settings(**_SETTINGS)
def test_debounce_matches_python_model(spark, tmp_path_factory, rows):
    d = _write_events(spark, tmp_path_factory, rows, "prop_debounce")
    got = {
        r["event_type"]: r.asDict()
        for r in event_debounce(spark, d).collect()
    }
    kept = Counter()
    dropped = Counter()
    streams = defaultdict(list)
    for eid, us, uid, typ, _val in rows:
        streams[(uid, typ)].append((us, eid))
    for (uid, typ), s in streams.items():
        s.sort()
        for i, (us, _eid) in enumerate(s):
            if i == 0 or us - s[i - 1][0] >= 60 * _US:
                kept[typ] += 1
            else:
                dropped[typ] += 1
    for typ in set(kept) | set(dropped):
        assert got[typ]["n_kept"] == kept[typ]
        assert got[typ]["n_dropped"] == dropped[typ]
        assert got[typ]["kept_cents"] == kept[typ] * 100  # value fixed 1.0


@given(rows=event_streams())
@settings(**_SETTINGS)
def test_markov_matches_python_model(spark, tmp_path_factory, rows):
    d = _write_events(spark, tmp_path_factory, rows, "prop_markov")
    got = {
        (r["prev_type"], r["cur_type"]): r.asDict()
        for r in markov_transitions(spark, d).collect()
    }
    steps = Counter()
    for stream in _ordered(rows).values():
        for (_, _, a), (_, _, b) in zip(stream, stream[1:]):
            steps[(a, b)] += 1
    totals = Counter()
    for (a, _b), n in steps.items():
        totals[a] += n
    assert set(got) == set(steps)
    for key, n in steps.items():
        assert got[key]["n_steps"] == n
        assert got[key]["prob"] == n / totals[key[0]]


@given(
    texts=st.lists(
        st.text(alphabet="abc xyz", min_size=0, max_size=40),
        min_size=1,
        max_size=5,
    )
)
@settings(**_SETTINGS)
def test_char_entropy_matches_python_model(spark, tmp_path_factory, texts):
    d = write_docs_dir(
        spark, tmp_path_factory, list(enumerate(texts)), name="prop_entropy"
    )
    got = {r["doc_id"]: r.asDict() for r in char_entropy(spark, d).collect()}
    for i, t in enumerate(texts):
        if not t:
            assert i not in got
            continue
        c = Counter(t)
        n = len(t)
        micro = sum(
            cnt * round(math.log(n / cnt) * 1e6) for cnt in c.values()
        )
        r = got[i]
        assert r["n_chars"] == n
        assert r["n_distinct_chars"] == len(c)
        assert r["entropy_nats"] == micro / n / 1e6
