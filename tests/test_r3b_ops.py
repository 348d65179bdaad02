"""Ground-truth tests for the round-3b extension operators: top-n-gram
coverage, corpus-unigram LM scoring, chunk-exact dedup, sweep-line
interval concurrency, and trailing-window anomaly flags — all on crafted
micro-fixtures with closed-form expectations."""

from __future__ import annotations

import datetime as dt
import math

import pytest

from feature_generation_benchmark_spark.workloads.dedup import (
    dedup_chunk_exact,
)
from feature_generation_benchmark_spark.workloads.intervals import (
    open_orders_daily,
)
from feature_generation_benchmark_spark.workloads.text import (
    top_ngram_coverage,
    unigram_logprob,
)
from feature_generation_benchmark_spark.workloads.timeseries import (
    user_daily_anomaly,
)

from tests.conftest import (  # noqa: E402
    write_docs_dir as _docs_dir,
    write_events_dir as _events_dir,
)


# -------------------------------------------------------------------------
# top_ngram_coverage
# -------------------------------------------------------------------------


@pytest.fixture(scope="module")
def ngram_docs(spark, tmp_path_factory):
    return _docs_dir(
        spark,
        tmp_path_factory,
        [
            (1, "a b a b a b"),  # 6 tokens, top bigram "a b" x3
            (2, " ".join(f"w{i}" for i in range(20))),  # 20 distinct tokens
            (3, "p q"),  # bigram only, no trigram
            (4, "solo"),  # <2 tokens: excluded
        ],
        name="ngram_docs",
    )


def test_top_ngram_closed_form(spark, ngram_docs):
    out = {
        r["doc_id"]: r
        for r in top_ngram_coverage(spark, ngram_docs).collect()
    }
    assert set(out) == {1, 2, 3}  # 1-token doc excluded
    # doc 1: bigrams [ab, ba, ab, ba, ab] -> top 3; trigrams [aba, bab,
    # aba, bab] -> top 2
    assert out[1]["n_tokens"] == 6
    assert out[1]["top2gram_frac"] == pytest.approx(2 * 3 / 6)
    assert out[1]["top3gram_frac"] == pytest.approx(3 * 2 / 6)
    assert out[1]["repetitive"] is True
    # doc 2: all n-grams unique -> 2/20 and 3/20, below both thresholds
    assert out[2]["top2gram_frac"] == pytest.approx(0.1)
    assert out[2]["top3gram_frac"] == pytest.approx(0.15)
    assert out[2]["repetitive"] is False
    # doc 3: two tokens -> one bigram covering the doc, trigram undefined
    assert out[3]["top2gram_frac"] == pytest.approx(1.0)
    assert out[3]["top3gram_frac"] is None
    assert out[3]["repetitive"] is True


# -------------------------------------------------------------------------
# unigram_logprob
# -------------------------------------------------------------------------


def test_unigram_logprob_closed_form(spark, tmp_path_factory):
    d = _docs_dir(
        spark,
        tmp_path_factory,
        [(1, "a a b"), (2, "b")],
        name="unigram_docs",
    )
    out = {r["doc_id"]: r for r in unigram_logprob(spark, d).collect()}
    # freqs: a=2, b=2, total=4 -> every token has p=1/2; micro-log
    # quantization: round(ln(1/2)*1e6)/1e6
    lp = round((math.log(2) - math.log(4)) * 1e6) / 1e6
    assert out[1]["n_tokens"] == 3
    assert out[1]["avg_logprob"] == pytest.approx(lp, abs=1e-9)
    assert out[2]["n_tokens"] == 1
    assert out[2]["avg_logprob"] == pytest.approx(lp, abs=1e-9)


# -------------------------------------------------------------------------
# dedup_chunk_exact (chunk width 4, non-overlapping, trailing remainder)
# -------------------------------------------------------------------------


def test_dedup_chunk_exact_crafted(spark, tmp_path_factory):
    shared = "c1 c2 c3 c4"
    d = _docs_dir(
        spark,
        tmp_path_factory,
        [
            (1, f"{shared} u1 u2 u3 u4"),  # one shared, one unique chunk
            (2, f"{shared} x1 x2 x3 x4"),  # shares chunk with doc 1
            (3, "y1 y2 y3 y4 y5"),  # unique chunks incl. trailing "y5"
            (4, f"{shared} {shared}"),  # same chunk twice WITHIN one doc
        ],
        name="chunk_docs",
    )
    out = {r["doc_id"]: r for r in dedup_chunk_exact(spark, d).collect()}
    # chunk "c1 c2 c3 c4" occurs 4x corpus-wide (docs 1, 2, and 4 twice)
    assert (out[1]["n_chunks"], out[1]["dup_chunks"]) == (2, 1)
    assert out[1]["dup_chunk_ratio"] == pytest.approx(0.5)
    assert out[1]["keep"] is True  # ratio <= 0.5 kept
    assert (out[2]["n_chunks"], out[2]["dup_chunks"]) == (2, 1)
    # doc 3: 5 tokens -> one full + one short trailing chunk, all unique
    assert (out[3]["n_chunks"], out[3]["dup_chunks"]) == (2, 0)
    assert out[3]["keep"] is True
    # doc 4: both chunks are the same repeated string -> fully duplicated
    assert (out[4]["n_chunks"], out[4]["dup_chunks"]) == (2, 2)
    assert out[4]["keep"] is False


# -------------------------------------------------------------------------
# open_orders_daily — sweep line vs a brute-force per-day recount
# -------------------------------------------------------------------------


def test_open_orders_sweep_matches_bruteforce(spark, tmp_path_factory):
    base = dt.datetime(1995, 1, 1)
    # (orderkey, priority, open_day_offset, [lineitem ship_day_offsets])
    orders = [
        (1, "1-URGENT", 0, [2, 5]),
        (2, "1-URGENT", 3, [3]),
        (3, "2-HIGH", 0, [10]),
        (4, "1-URGENT", 5, [6, 8]),
    ]
    d = tmp_path_factory.mktemp("sweep")
    spark.createDataFrame(
        [
            (k, pr, base + dt.timedelta(days=o))
            for k, pr, o, _ in orders
        ],
        "o_orderkey long, o_orderpriority string, o_orderdate timestamp_ntz",
    ).coalesce(1).write.parquet(str(d / "orders.parquet"))
    spark.createDataFrame(
        [
            (k, base + dt.timedelta(days=s))
            for k, _, _, ships in orders
            for s in ships
        ],
        "l_orderkey long, l_shipdate timestamp_ntz",
    ).coalesce(1).write.parquet(str(d / "lineitem.parquet"))

    got = {
        (r["o_orderpriority"], r["day"]): (r["net_change"], r["open_orders"])
        for r in open_orders_daily(spark, str(d)).collect()
    }
    epoch_off = (base - dt.datetime(1970, 1, 1)).days

    # brute force: an order is open on day t iff open <= t <= max(ship)
    def open_count(pr, t):
        return sum(
            1
            for _, p, o, ships in orders
            if p == pr and o <= t <= max(ships)
        )

    for (pr, day), (_, open_n) in got.items():
        assert open_n == open_count(pr, day - epoch_off)
    # the curve closes: every priority's last delta row sums back to zero
    for pr in {"1-URGENT", "2-HIGH"}:
        last = max(day for p, day in got if p == pr)
        assert got[(pr, last)][1] == 0


# -------------------------------------------------------------------------
# user_daily_anomaly
# -------------------------------------------------------------------------


def test_anomaly_flags_spike_and_constant_baseline(spark, tmp_path_factory):
    rows = []
    # user 1: constant baseline (1/day for days 0-9) then a 10x spike ->
    # zero variance, z undefined, but the deviation MUST flag
    rows += [(1, day, 1) for day in range(10)]
    rows += [(1, 10, 10)]
    # user 2: alternating 1/3 baseline then a day inside the band
    rows += [(2, day, 1 if day % 2 else 3) for day in range(10)]
    rows += [(2, 10, 2)]
    d = _events_dir(spark, tmp_path_factory, rows, name="anom_events")
    out = {
        (r["user_id"], r["day"]): r
        for r in user_daily_anomaly(spark, d).collect()
    }
    spike = out[(1, 10)]
    assert spike["baseline_days"] == 10
    assert spike["baseline_mean"] == pytest.approx(1.0)
    assert spike["zscore"] is None  # zero-variance: z undefined
    assert spike["is_anomaly"] is True  # ... but the spike is flagged
    # constant-baseline day matching the constant: no flag
    assert out[(1, 9)]["is_anomaly"] is False
    # user 2 day 10: baseline mean 2, sd ~1.05 -> |z| < 2.5, no flag
    mid = out[(2, 10)]
    assert mid["baseline_mean"] == pytest.approx(2.0)
    zs = mid["zscore"]
    assert zs is not None and abs(zs) < 0.1
    assert mid["is_anomaly"] is False
    # first day of history: empty baseline -> NULLs and no flag
    first = out[(1, 0)]
    assert first["baseline_days"] == 0
    assert first["baseline_mean"] is None
    assert first["zscore"] is None
    assert first["is_anomaly"] is False


# -------------------------------------------------------------------------
# plan-shape guards — the scale claims of the r3b operators, asserted
# -------------------------------------------------------------------------


def _physical(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_open_orders_plan_has_no_nested_loop(spark):
    """The whole point of the sweep line: the interval concurrency curve
    must come out of equi-shuffles + a window, never a broadcast
    nested-loop range join."""
    plan = _physical(open_orders_daily(spark, "/root/testdata/sf0.001"))
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "Window" in plan, plan


def test_anomaly_is_single_user_keyed_exchange(spark):
    """One (user, day) agg + one user-keyed window — the baseline must
    not add a self-join or extra exchange."""
    plan = _physical(user_daily_anomaly(spark, "/root/testdata/sf0.001"))
    assert "Join" not in plan, plan
    # count-agg partials + final agg + window may legally share ONE
    # hash-exchange on user_id/(user_id, day): assert the ceiling
    assert plan.count("Exchange hashpartitioning") <= 2, plan


# -------------------------------------------------------------------------
# triangle_counts_parts — crafted graph closed form
# -------------------------------------------------------------------------


def test_triangle_counts_crafted(spark, tmp_path_factory):
    from feature_generation_benchmark_spark.workloads.graph import (
        triangle_counts_parts,
    )

    # orders as cliques of parts: order 1 = {1,2,3} (triangle), order 2 =
    # {3,4,5,6} (K4 = 4 triangles), order 3 = {1,2} (edge only, no new
    # triangle), order 4 duplicates order 1 (edges are distinct -> no
    # double count)
    rows = [
        (1, p) for p in (1, 2, 3)
    ] + [
        (2, p) for p in (3, 4, 5, 6)
    ] + [
        (3, p) for p in (1, 2)
    ] + [
        (4, p) for p in (1, 2, 3)
    ]
    d = tmp_path_factory.mktemp("tri")
    spark.createDataFrame(
        rows, "l_orderkey long, l_partkey long"
    ).coalesce(1).write.parquet(str(d / "lineitem.parquet"))
    got = {
        r["part"]: r["n_triangles"]
        for r in triangle_counts_parts(spark, str(d)).collect()
    }
    # K4 on {3,4,5,6}: each member sits in C(3,2)=3 triangles; part 3
    # additionally closes the {1,2,3} triangle
    assert got == {1: 1, 2: 1, 3: 4, 4: 3, 5: 3, 6: 3}


# -------------------------------------------------------------------------
# cdc_chunking — python-model ground truth + edit stability
# -------------------------------------------------------------------------


def _cdc_model(toks, divisor=16):
    """Reference chunker: token ends a chunk when md5 % divisor == 0."""
    import hashlib

    chunks, cur = [], []
    for t in toks:
        cur.append(t)
        if int(hashlib.md5(t.encode()).hexdigest()[:8], 16) % divisor == 0:
            chunks.append(cur)
            cur = []
    if cur:
        chunks.append(cur)
    return [" ".join(c) for c in chunks]


def test_cdc_chunking_matches_model_and_survives_edits(
    spark, tmp_path_factory
):
    import hashlib

    # find one boundary token so the fixture provably has a mid-doc cut
    bset = [
        w
        for w in (f"tok{i}" for i in range(200))
        if int(hashlib.md5(w.encode()).hexdigest()[:8], 16) % 16 == 0
    ]
    assert bset, "no boundary token in probe vocabulary"
    b = bset[0]
    base = ["alpha", "beta", b, "gamma", "delta", "epsilon"]
    edited = ["zzz"] + base  # one token inserted BEFORE the boundary
    d = _docs_dir(
        spark,
        tmp_path_factory,
        [(1, " ".join(base)), (2, " ".join(edited))],
        name="cdc_docs",
    )
    from feature_generation_benchmark_spark.workloads.sampling import (
        cdc_chunking,
    )

    out = cdc_chunking(spark, d).collect()
    got = {}
    for r in out:
        got.setdefault(r["doc_id"], []).append(
            (r["chunk_idx"], r["n_chunk_tokens"], r["chunk_md5"])
        )
    for doc_id, toks in ((1, base), (2, edited)):
        expect = _cdc_model(toks)
        rows = sorted(got[doc_id])
        assert [n for _, n, _ in rows] == [
            len(c.split()) for c in expect
        ]
        assert [h for _, _, h in rows] == [
            hashlib.md5(c.encode()).hexdigest() for c in expect
        ]
    # the CDC property: the edit before the boundary changed ONLY the
    # first chunk — every chunk after the cut is bit-identical
    tail1 = [h for _, _, h in sorted(got[1])][1:]
    tail2 = [h for _, _, h in sorted(got[2])][1:]
    assert tail1 == tail2 and tail1  # non-empty shared tail


def test_text_and_chunk_ops_have_keyed_exchanges_only(spark):
    """No global sorts, no cartesian products; exchange counts bounded.
    (unigram_logprob's single BroadcastNestedLoopJoin is the intentional
    1-row corpus-total broadcast.)"""
    from feature_generation_benchmark_spark.workloads.text import (
        top_ngram_coverage,
        unigram_logprob,
    )

    sf = "/root/testdata/sf0.001"
    for fn, max_hash, max_bnlj in (
        (top_ngram_coverage, 3, 0),
        (unigram_logprob, 3, 1),
        (dedup_chunk_exact, 3, 0),
    ):
        plan = _physical(fn(spark, sf))
        assert "Exchange rangepartitioning" not in plan, plan
        assert "CartesianProduct" not in plan, plan
        assert plan.count("Exchange hashpartitioning") <= max_hash, plan
        assert plan.count("BroadcastNestedLoopJoin") <= max_bnlj, plan


# -------------------------------------------------------------------------
# cluster_representatives — keep the longest doc per duplicate component
# -------------------------------------------------------------------------


def test_cluster_representatives_keep_longest_tie_smallest_id(
    spark, tmp_path_factory
):
    from feature_generation_benchmark_spark.workloads.dedup import (
        cluster_representatives,
    )

    base = "alpha beta gamma delta epsilon zeta eta theta"
    d = _docs_dir(
        spark,
        tmp_path_factory,
        [
            (1, base),  # exact dup of 2 (tie on n_chars -> smaller id)
            (2, base),
            (3, base + " iota kappa"),  # near-dup of 1/2, longest
            (4, "unrelated words entirely disjoint tokens only here"),
        ],
        name="reps_docs",
    )
    out = {r["doc_id"]: r for r in cluster_representatives(spark, d).collect()}
    assert {i: out[i]["component"] for i in (1, 2, 3)} == {1: 1, 2: 1, 3: 1}
    assert out[3]["keep"] is True  # longest in the component
    assert out[1]["keep"] is False and out[2]["keep"] is False
    assert out[4]["keep"] is True  # singleton keeps itself
    assert out[4]["component"] == 4


# -------------------------------------------------------------------------
# rolling_active_users — DAU/WAU closed form
# -------------------------------------------------------------------------


def test_rolling_active_users_closed_form(spark, tmp_path_factory):
    from feature_generation_benchmark_spark.workloads.timeseries import (
        rolling_active_users,
    )

    # user 1 active days 0 and 8 (outside each other's 7d window);
    # user 2 active day 1; two events same user+day dedupe to one active
    rows = [(1, 0, 2), (2, 1, 1), (1, 8, 1)]
    d = _events_dir(spark, tmp_path_factory, rows, name="rolling_events")
    out = {
        r["day"]: (r["dau"], r["wau7"])
        for r in rolling_active_users(spark, d).collect()
    }
    assert out[0] == (1, 1)  # user 1 only
    assert out[1] == (1, 2)  # user 2 active; user 1 still in window
    assert out[6] == (0, 2)  # both windows still open, nobody active
    assert out[7] == (0, 1)  # user 1's day-0 window closed
    assert out[8] == (1, 1)  # user 1 re-activates
    assert out[14] == (0, 1) and 15 not in out  # window tail ends


# -------------------------------------------------------------------------
# winsorized_stats — closed form with known percentile bounds
# -------------------------------------------------------------------------


def test_winsorized_stats_closed_form(spark, tmp_path_factory):
    from feature_generation_benchmark_spark.workloads.features_eng import (
        winsorized_stats,
    )

    # 11 events, one per day, cents 100..1000 plus one huge outlier.
    # p05 over [100..1000, 99999] at (n-1)*0.05 = 0.5 -> 150.0;
    # p95 at (n-1)*0.95 = 9.5 -> midpoint of 1000 and 99999 = 50499.5
    values = [1.0 * k for k in range(1, 11)] + [999.99]
    rows = []
    d = tmp_path_factory.mktemp("winsor")
    import datetime as dt

    recs = [
        (i, dt.datetime(1970, 1, 1) + dt.timedelta(days=i), 1, "click", v, "{}")
        for i, v in enumerate(values)
    ]
    spark.createDataFrame(
        recs,
        "event_id long, ts timestamp_ntz, user_id long, event_type string, "
        "value double, props string",
    ).coalesce(1).write.parquet(str(d / "events.parquet"))

    out = {r["event_type"]: r for r in winsorized_stats(spark, str(d)).collect()}
    r = out["click"]
    assert r["n"] == 11
    assert r["p05_cents"] == pytest.approx(150.0)
    assert r["p95_cents"] == pytest.approx(50499.5)
    # clipped: cents=100 below p05, 99999 above p95
    assert r["n_clipped"] == 2
    inliers = sum(k * 100 for k in range(2, 11))  # 200..1000
    expect = (inliers + 150.0 + 50499.5) / 11
    assert r["winsorized_mean_cents"] == pytest.approx(expect)
