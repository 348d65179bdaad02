"""Property-based checks for the round-3 curation operators.

Hypothesis generates random corpora/event logs and compares the Spark
operators against independent brute-force Python implementations —
the same net that caught two bucket_pivot defects in round 2, pointed at
the new surface. Examples are few (Spark job per example) but each drives
a full random shape through the real plans.
"""

from __future__ import annotations

import hashlib

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from tests._budget import examples
from pyspark.sql import functions as F

from feature_generation_benchmark_spark.workloads.curation import (
    _DUP_MIN_COUNT,
    _DUP_N,
    _WIN_K,
    _WIN_W,
)

_SETTINGS = dict(
    max_examples=examples(10),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_WORDS = [f"w{i}" for i in range(12)]


def _write_docs(spark, tmp_path_factory, texts: list[str]) -> str:
    rows = [
        (i, t, "en", f"src{i % 3}", len(t)) for i, t in enumerate(texts)
    ]
    df = spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    d = tmp_path_factory.mktemp("prop_docs")
    df.coalesce(1).write.mode("overwrite").parquet(str(d / "documents.parquet"))
    return str(d)


@st.composite
def corpora(draw):
    n_docs = draw(st.integers(min_value=2, max_value=6))
    texts = []
    for _ in range(n_docs):
        n_tok = draw(st.integers(min_value=0, max_value=25))
        texts.append(
            " ".join(
                draw(st.sampled_from(_WORDS)) for _ in range(n_tok)
            )
        )
    return texts


def _brute_dup_coverage(texts: list[str]) -> dict[int, tuple[int, int]]:
    """Independent Python model of dup_ngram_spans: global n-gram counts,
    then per-doc (n_dup_instances, covered-token-count)."""
    toks = [t.split() if t else [] for t in texts]
    from collections import Counter

    counts = Counter()
    for ts in toks:
        for i in range(len(ts) - _DUP_N + 1):
            counts[tuple(ts[i : i + _DUP_N])] += 1
    out = {}
    for d, ts in enumerate(toks):
        if not ts:
            continue
        dup_pos = [
            i
            for i in range(len(ts) - _DUP_N + 1)
            if counts[tuple(ts[i : i + _DUP_N])] >= _DUP_MIN_COUNT
        ]
        covered = set()
        for i in dup_pos:
            covered.update(range(i, i + _DUP_N))
        out[d] = (len(dup_pos), len(covered))
    return out


@settings(**_SETTINGS)
@given(corpora())
def test_dup_ngram_spans_matches_bruteforce(spark, tmp_path_factory, texts):
    from feature_generation_benchmark_spark.workloads.curation import (
        dup_ngram_spans,
    )

    sf_dir = _write_docs(spark, tmp_path_factory, texts)
    got = {
        r["doc_id"]: (r["n_dup_ngrams"], r["n_covered_tokens"])
        for r in dup_ngram_spans(spark, sf_dir).collect()
    }
    assert got == _brute_dup_coverage(texts)


def _brute_winnow(text: str) -> set[str]:
    """Independent winnowing model: md5-prefix hashes of k-grams, union of
    per-window minima over starts {0} ∪ {s : s ≤ nkg − w}."""
    ts = text.split()
    kgrams = [
        " ".join(ts[i : i + _WIN_K]) for i in range(len(ts) - _WIN_K + 1)
    ]
    hs = [hashlib.md5(g.encode()).hexdigest()[:8] for g in kgrams]
    if not hs:
        return set()
    nkg = len(hs)
    starts = {0} | {s for s in range(nkg) if s <= nkg - _WIN_W}
    return {min(hs[s : s + _WIN_W]) for s in starts}


@settings(**_SETTINGS)
@given(corpora())
def test_winnowing_matches_bruteforce(spark, tmp_path_factory, texts):
    from feature_generation_benchmark_spark.workloads.curation import (
        winnowing_fingerprint,
    )

    texts = [t for t in texts if t]  # workload contract: tokenized docs
    if not texts:
        return
    sf_dir = _write_docs(spark, tmp_path_factory, texts)
    got = {
        r["doc_id"]: r["n_fingerprints"]
        for r in winnowing_fingerprint(spark, sf_dir).collect()
    }
    want = {i: len(_brute_winnow(t)) for i, t in enumerate(texts)}
    assert got == want


@st.composite
def event_logs(draw):
    n = draw(st.integers(min_value=1, max_value=30))
    rows = []
    for eid in range(n):
        rows.append(
            (
                eid,
                draw(st.integers(min_value=0, max_value=5)),  # user
                draw(st.sampled_from(["click", "view", "error"])),
                draw(st.integers(min_value=0, max_value=10**6)),  # ts ns
                float(draw(st.integers(min_value=0, max_value=10000))) / 100,
            )
        )
    return rows


@settings(**_SETTINGS)
@given(event_logs())
def test_compaction_matches_bruteforce(spark, tmp_path_factory, rows):
    """latest_state_compaction ≡ per-user argmax(ts, event_id) + totals,
    checked against a direct Python fold (duplicate timestamps included —
    the tie-break path)."""
    from feature_generation_benchmark_spark.workloads.curation import (
        latest_state_compaction,
    )

    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts long, value double"
    ).withColumn("props", F.lit("{}"))
    d = tmp_path_factory.mktemp("prop_events")
    df.coalesce(1).write.mode("overwrite").parquet(str(d / "events.parquet"))

    got = {
        r["user_id"]: (
            r["last_event_id"],
            r["last_ts_us"],
            r["n_events"],
            r["total_value_cents"],
        )
        for r in latest_state_compaction(spark, str(d)).collect()
    }
    want: dict[int, tuple] = {}
    from collections import defaultdict

    per_user = defaultdict(list)
    for eid, uid, _typ, ts, val in rows:
        per_user[uid].append((ts // 1000, eid, round(val * 100)))
    for uid, evs in per_user.items():
        last = max(evs)  # (ts_us, event_id) lexicographic — the contract
        want[uid] = (
            last[1],
            last[0],
            len(evs),
            sum(v for _, _, v in evs),
        )
    assert got == want
