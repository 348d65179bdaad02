"""Round-4 operators vs hand-computable Python models: SCD2 interval
build, lag-based debounce, char entropy, int8 quantization, basket
pairs. The DuckDB oracle is the cross-engine gate; these tests pin the
SEMANTICS against independent reference models on edge-case fixtures.
"""

from __future__ import annotations

import datetime as dt
import math
from collections import Counter
from itertools import combinations

from pyspark.sql import functions as F

from feature_generation_benchmark_spark.workloads.funnel import itemset_pairs
from feature_generation_benchmark_spark.workloads.intervals import (
    scd2_intervals,
)
from feature_generation_benchmark_spark.workloads.similarity import (
    embedding_quantize_int8,
)
from feature_generation_benchmark_spark.workloads.text import char_entropy
from feature_generation_benchmark_spark.workloads.timeseries import (
    event_debounce,
)
from tests.conftest import write_docs_dir

_US = 10**6


def _write_events(spark, tmp_path_factory, rows, name):
    """rows: (event_id, us, user_id, event_type, value)."""
    recs = [
        (
            eid,
            dt.datetime(1970, 1, 1) + dt.timedelta(microseconds=us),
            uid,
            typ,
            val,
            "{}",
        )
        for eid, us, uid, typ, val in rows
    ]
    d = tmp_path_factory.mktemp(name)
    spark.createDataFrame(
        recs,
        "event_id long, ts timestamp_ntz, user_id long, "
        "event_type string, value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(str(d / "events.parquet"))
    return str(d)


def test_scd2_compresses_consecutive_repeats(spark, tmp_path_factory):
    # user 1: A A B A  -> versions A(0..20), B(20..30), A(30..open)
    # user 2: single event -> one open version, zero closed stats
    rows = [
        (0, 0 * _US, 1, "A", 1.0),
        (1, 10 * _US, 1, "A", 1.0),   # repeat: same version
        (2, 20 * _US, 1, "B", 1.0),
        (3, 30 * _US, 1, "A", 1.0),
        (4, 5 * _US, 2, "Z", 1.0),
    ]
    d = _write_events(spark, tmp_path_factory, rows, "scd2")
    got = {
        r["user_id"]: r.asDict()
        for r in scd2_intervals(spark, d).collect()
    }
    assert got[1]["n_versions"] == 3
    assert got[1]["n_closed"] == 2
    assert got[1]["total_closed_dur_us"] == (20 - 0) * _US + (30 - 20) * _US
    assert got[1]["max_closed_dur_us"] == 20 * _US
    assert got[2] == {
        "user_id": 2,
        "n_versions": 1,
        "n_closed": 0,
        "total_closed_dur_us": 0,
        "max_closed_dur_us": 0,
    }


def test_debounce_is_lag_based_not_kept_based(spark, tmp_path_factory):
    # stream at t=0, 30s, 59s, 120s (same user/type):
    #   t=0 kept; t=30 dropped (30s gap); t=59 dropped vs RAW previous
    #   (29s gap — a previous-KEPT rule would also drop it, 59s from t=0);
    #   t=120 kept (61s after t=59).
    # second type on the same user is an independent stream.
    rows = [
        (0, 0, 1, "click", 2.0),
        (1, 30 * _US, 1, "click", 3.0),
        (2, 59 * _US, 1, "click", 5.0),
        (3, 120 * _US, 1, "click", 7.0),
        (4, 10 * _US, 1, "view", 11.0),
    ]
    d = _write_events(spark, tmp_path_factory, rows, "debounce")
    got = {r["event_type"]: r.asDict() for r in event_debounce(spark, d).collect()}
    assert got["click"]["n_kept"] == 2
    assert got["click"]["n_dropped"] == 2
    assert got["click"]["kept_cents"] == 200 + 700
    assert got["view"] == {
        "event_type": "view", "n_kept": 1, "n_dropped": 0,
        "kept_cents": 1100,
    }


def test_char_entropy_matches_counter_model(spark, tmp_path_factory):
    texts = ["aaaa", "abab", "abcd", "mississippi river"]
    d = write_docs_dir(
        spark, tmp_path_factory, list(enumerate(texts)), "entropy"
    )
    got = {r["doc_id"]: r.asDict() for r in char_entropy(spark, d).collect()}
    for i, t in enumerate(texts):
        c = Counter(t)
        n = len(t)
        micro = sum(
            cnt * round(math.log(n / cnt) * 1e6) for cnt in c.values()
        )
        assert got[i]["n_chars"] == n
        assert got[i]["n_distinct_chars"] == len(c)
        assert got[i]["entropy_nats"] == micro / n / 1e6
    assert got[0]["entropy_nats"] == 0.0  # single-symbol doc


def test_quantize_int8_bounds_and_roundtrip(spark, tmp_path_factory):
    # dim0 spans [-1, 1]; dim1 constant (degenerate: q=0, err=0);
    # dim2 spans [0, 255e-6] so codes are exact integers with zero error
    vecs = [
        (0, [-1.0, 5.0, 0.0]),
        (1, [1.0, 5.0, 255e-6]),
        (2, [0.0, 5.0, 100e-6]),
    ]
    d = tmp_path_factory.mktemp("quant")
    spark.createDataFrame(
        vecs, "vec_id long, embedding array<float>"
    ).withColumn("label", F.lit(0)).coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(d / "embeddings.parquet"))
    got = {
        r["vec_id"]: r.asDict()
        for r in embedding_quantize_int8(spark, str(d)).collect()
    }
    # dim0: -1 -> 0, +1 -> 255, 0 -> round(127.5) = 128
    # dim1 constant -> 0;  dim2: exact micro ints 0/255/100
    assert got[0]["q_sum"] == 0 + 0 + 0
    assert got[1]["q_sum"] == 255 + 0 + 255
    assert got[2]["q_sum"] == 128 + 0 + 100
    # max reconstruction error is bounded by half a quantization step
    # (1e6-unit step = (mx-mn)/255 ≈ 7843 micro) plus the e6 rounding
    for r in got.values():
        assert r["n_dims"] == 3
        assert 0 <= r["max_err_e6"] <= 2_000_000 / 255 / 2 + 1
    assert got[1]["max_err_e6"] == 0  # endpoints reconstruct exactly


def test_itemset_pairs_matches_combinations(spark, tmp_path_factory):
    rows = [
        (0, 0, 1, "a", 1.0),
        (1, 1 * _US, 1, "b", 1.0),
        (2, 2 * _US, 1, "a", 1.0),   # dup type: basket is a set
        (3, 3 * _US, 2, "b", 1.0),
        (4, 4 * _US, 2, "c", 1.0),
        (5, 5 * _US, 3, "a", 1.0),   # singleton basket: no pairs
        (6, 6 * _US, 4, "c", 1.0),
        (7, 7 * _US, 4, "a", 1.0),
        (8, 8 * _US, 4, "b", 1.0),
    ]
    d = _write_events(spark, tmp_path_factory, rows, "itemsets")
    got = {
        (r["type_a"], r["type_b"]): r["n_users"]
        for r in itemset_pairs(spark, d).collect()
    }
    baskets = {1: {"a", "b"}, 2: {"b", "c"}, 3: {"a"}, 4: {"a", "b", "c"}}
    model = Counter(
        p for b in baskets.values() for p in combinations(sorted(b), 2)
    )
    assert got == dict(model)


def test_markov_transitions_model(spark, tmp_path_factory):
    # user 1: a -> b -> a ; user 2: b -> b
    rows = [
        (0, 0, 1, "a", 1.0),
        (1, 1 * _US, 1, "b", 1.0),
        (2, 2 * _US, 1, "a", 1.0),
        (3, 0, 2, "b", 1.0),
        (4, 1 * _US, 2, "b", 1.0),
    ]
    from feature_generation_benchmark_spark.workloads.funnel import (
        markov_transitions,
    )

    d = _write_events(spark, tmp_path_factory, rows, "markov")
    got = {
        (r["prev_type"], r["cur_type"]): (r["n_steps"], r["prob"])
        for r in markov_transitions(spark, d).collect()
    }
    assert got == {
        ("a", "b"): (1, 1.0),
        ("b", "a"): (1, 0.5),
        ("b", "b"): (1, 0.5),
    }


def test_zipf_fit_recovers_exact_power_law(spark, tmp_path_factory):
    # Zipf-ish corpus: counts 8, 4, 2, 1 at ranks 1..4 (distinct counts —
    # no rank ties to worry about)
    words = ["aa"] * 8 + ["bb"] * 4 + ["cc"] * 2 + ["dd"]
    d = write_docs_dir(
        spark, tmp_path_factory, [(0, " ".join(words))], "zipf"
    )
    from feature_generation_benchmark_spark.workloads.text import zipf_fit

    rows = zipf_fit(spark, d).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["n_vocab"] == 4
    # counts 8,4,2,1 at ranks 1,2,3,4 are NOT an exact power law
    # (rank 3 breaks it), so just require a decisively negative slope
    assert -1.6 < r["zipf_slope"] < -0.5


def test_bigram_logprob_model(spark, tmp_path_factory):
    import math

    texts = ["a b a b", "a b b"]
    d = write_docs_dir(
        spark, tmp_path_factory, list(enumerate(texts)), "bigram"
    )
    from feature_generation_benchmark_spark.workloads.text import (
        bigram_logprob,
    )

    got = {
        r["doc_id"]: r.asDict() for r in bigram_logprob(spark, d).collect()
    }
    # corpus bigrams: doc0: ab ba ab ; doc1: ab bb
    # counts: ab=3, ba=1, bb=1 ; contexts: a·=3, b·=2
    c2 = {("a", "b"): 3, ("b", "a"): 1, ("b", "b"): 1}
    c1 = {"a": 3, "b": 2}

    def model(pairs):
        ml = [
            round(math.log(c2[p] / c1[p[0]]) * 1e6) for p in pairs
        ]
        return sum(ml) / len(ml) / 1e6

    assert got[0]["n_bigrams"] == 3
    assert got[0]["avg_bigram_logprob"] == model(
        [("a", "b"), ("b", "a"), ("a", "b")]
    )
    assert got[1]["n_bigrams"] == 2
    assert got[1]["avg_bigram_logprob"] == model([("a", "b"), ("b", "b")])


def test_user_spend_percentile_model(spark, tmp_path_factory):
    rows = [
        (0, 0, 1, "a", 1.0),      # rank 0 of 3 -> pct 0
        (1, 1 * _US, 2, "a", 2.0),  # pct 0.5
        (2, 2 * _US, 2, "a", 3.0),  # pct 1.0
        (3, 3 * _US, 1, "b", 9.0),  # single row partition -> pct 0
    ]
    from feature_generation_benchmark_spark.workloads.features_eng import (
        user_spend_percentile,
    )

    d = _write_events(spark, tmp_path_factory, rows, "pctile")
    got = {
        r["user_id"]: r.asDict()
        for r in user_spend_percentile(spark, d).collect()
    }
    assert got[1] == {
        "user_id": 1, "n_events": 2, "avg_value_pctile": 0.0,
    }
    assert got[2]["n_events"] == 2
    assert got[2]["avg_value_pctile"] == (500000 + 1000000) / 2 / 1e6


def test_journey_paths_top_model(spark, tmp_path_factory):
    # user 1: a b a b -> paths aba, bab ; user 2: a b a -> aba
    rows = [
        (0, 0, 1, "a", 1.0),
        (1, 1 * _US, 1, "b", 1.0),
        (2, 2 * _US, 1, "a", 1.0),
        (3, 3 * _US, 1, "b", 1.0),
        (4, 0, 2, "a", 1.0),
        (5, 1 * _US, 2, "b", 1.0),
        (6, 2 * _US, 2, "a", 1.0),
    ]
    from feature_generation_benchmark_spark.workloads.funnel import (
        journey_paths_top,
    )

    d = _write_events(spark, tmp_path_factory, rows, "journeys")
    got = [
        ((r["step1"], r["step2"], r["step3"]), r["n_paths"], r["rank"])
        for r in journey_paths_top(spark, d)
        .orderBy("rank")
        .collect()
    ]
    assert got == [
        (("a", "b", "a"), 2, 1),
        (("b", "a", "b"), 1, 2),
    ]


def test_price_skyline_is_strictly_decreasing_and_dominant(spark):
    from feature_generation_benchmark_spark.workloads.tpch_extra import (
        price_skyline,
    )
    from tests.conftest import SF_SMOKE

    rows = price_skyline(spark, SF_SMOKE).collect()
    by_seg = {}
    for r in rows:
        by_seg.setdefault(r["segment"], []).append(
            (r["day"], r["day_min_cents"])
        )
    assert by_seg  # non-empty
    for seg, pts in by_seg.items():
        pts.sort()
        days = [d for d, _ in pts]
        mins = [m for _, m in pts]
        assert days == sorted(set(days))       # one point per day
        assert mins == sorted(mins, reverse=True)  # strictly decreasing
        assert len(set(mins)) == len(mins)


def test_gini_extremes(spark, tmp_path_factory):
    """Equal prices -> G ~ 0; one order holding ~all value -> G -> 1."""
    import pyspark.sql.functions as SF
    from feature_generation_benchmark_spark.workloads.tpch_extra import (
        gini_concentration,
    )

    d = tmp_path_factory.mktemp("gini")
    spark.createDataFrame(
        [(i, "SEG_EQ") for i in range(1, 11)]
        + [(i + 100, "SEG_SKEW") for i in range(1, 11)],
        "c_custkey long, c_mktsegment string",
    ).coalesce(1).write.parquet(str(d / "customer.parquet"))
    orders = [
        # SEG_EQ: ten orders, identical price
        *[(i, i, 50.0) for i in range(1, 11)],
        # SEG_SKEW: nine cheap + one huge
        *[(i + 100, i + 100, 0.01) for i in range(1, 10)],
        (110, 110, 10000.0),
    ]
    spark.createDataFrame(
        orders, "o_orderkey long, o_custkey long, o_totalprice double"
    ).coalesce(1).write.parquet(str(d / "orders.parquet"))
    got = {
        r["segment"]: r["gini"]
        for r in gini_concentration(spark, str(d)).collect()
    }
    assert abs(got["SEG_EQ"]) < 1e-9
    assert got["SEG_SKEW"] > 0.85


def test_session_entropy_model(spark, tmp_path_factory):
    # user 1: 4 of one type -> 0 entropy; user 2: 2+2 -> ln 2
    rows = [
        (0, 0, 1, "a", 1.0), (1, _US, 1, "a", 1.0),
        (2, 2 * _US, 1, "a", 1.0), (3, 3 * _US, 1, "a", 1.0),
        (4, 0, 2, "a", 1.0), (5, _US, 2, "a", 1.0),
        (6, 2 * _US, 2, "b", 1.0), (7, 3 * _US, 2, "b", 1.0),
    ]
    from feature_generation_benchmark_spark.workloads.features_eng import (
        session_entropy,
    )

    d = _write_events(spark, tmp_path_factory, rows, "sess_ent")
    got = {
        r["user_id"]: r.asDict()
        for r in session_entropy(spark, d).collect()
    }
    assert got[1] == {
        "user_id": 1, "n_events": 4, "n_types": 1, "behavior_entropy": 0.0,
    }
    assert got[2]["n_types"] == 2
    micro = 2 * round(math.log(2) * 1e6) * 2  # two types, c=2, n=4
    assert got[2]["behavior_entropy"] == micro / 4 / 1e6


def test_sentence_dedup_stats_model(spark, tmp_path_factory):
    texts = [
        "shared one. unique a!",
        "shared one. unique b?",
        "all alone here",
    ]
    from feature_generation_benchmark_spark.workloads.dedup import (
        sentence_dedup_stats,
    )

    d = write_docs_dir(
        spark, tmp_path_factory, list(enumerate(texts)), "sentdedup"
    )
    got = {
        r["doc_id"]: r.asDict()
        for r in sentence_dedup_stats(spark, d).collect()
    }
    assert got[0]["n_sents"] == 2 and got[0]["n_dup_sents"] == 1
    assert got[0]["dup_frac"] == 0.5
    assert got[1]["n_sents"] == 2 and got[1]["n_dup_sents"] == 1
    assert got[2] == {
        "doc_id": 2, "n_sents": 1, "n_dup_sents": 0, "dup_frac": 0.0,
    }


def test_null_user_is_excluded_from_basket_and_funnel_ops(
    spark, tmp_path_factory
):
    """r6 session-3 review: groupBy pools NULL user_ids into one
    pseudo-basket while the SQL oracles' equality joins drop them — both
    ops must exclude NULL users explicitly so the engines agree."""
    from feature_generation_benchmark_spark.workloads.funnel import (
        itemset_pairs,
        window_funnel_depth,
    )

    rows = [
        (0, 0 * _US, 1, "view", 1.0),
        (1, 10 * _US, 1, "click", 1.0),
        (2, 20 * _US, None, "view", 1.0),
        (3, 30 * _US, None, "click", 1.0),
        (4, 40 * _US, None, "purchase", 1.0),
    ]
    d = _write_events(spark, tmp_path_factory, rows, "null_user")
    pairs = {
        (r["type_a"], r["type_b"]): r["n_users"]
        for r in itemset_pairs(spark, d).collect()
    }
    # only user 1's basket counts; the NULL pseudo-basket must not
    assert pairs == {("click", "view"): 1}
    depth = {
        r["depth"]: r["n_users"] for r in window_funnel_depth(spark, d).collect()
    }
    # user 1 reaches depth 2 (view->click); the NULL rows form no user
    assert depth.get(2, 0) == 1
    assert sum(depth.values()) == 1
