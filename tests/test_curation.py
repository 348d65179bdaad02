"""Curation-workload invariants (PII redaction, duplicate n-gram spans,
winnowing, mixture sampling, CDC compaction, SemDeDup) beyond the DuckDB
oracles: algebraic properties on crafted fixtures, determinism under
repartitioning, and the winnowing guarantee."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from feature_generation_benchmark_spark.workloads.curation import (
    _WIN_K,
    _WIN_W,
    EMAIL_RE,
    IPV4_RE,
    MIX_WEIGHTS,
    PHONE_RE,
    dup_ngram_spans,
    latest_state_compaction,
    mixture_sampling,
    pii_redaction,
    winnowing_fingerprint,
)
from feature_generation_benchmark_spark.workloads.similarity import semdedup
from tests.conftest import SF_SMOKE

from tests._budget import examples


@pytest.fixture(scope="module")
def crafted_docs_dir(spark, tmp_path_factory):
    """A tiny documents table with engineered structure: two docs sharing
    a run of ``_WIN_W + _WIN_K - 1`` tokens (winnowing must give them a
    common fingerprint), one isolated doc, and one short doc."""
    shared = " ".join(f"shared{i}" for i in range(_WIN_W + _WIN_K - 1))
    rows = [
        (0, f"alpha beta gamma {shared} delta epsilon zeta", "en", "src0", 0),
        (1, f"one two three four {shared} five six seven", "en", "src1", 0),
        (2, "totally unrelated words nothing in common here at all "
            "more filler tokens beyond the shingle size", "en", "src2", 0),
        (3, "tiny doc", "en", "src3", 0),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    d = tmp_path_factory.mktemp("crafted_docs")
    df.coalesce(1).write.mode("overwrite").parquet(str(d / "documents.parquet"))
    return str(d)


def test_pii_redaction_scrubs_everything(spark):
    out = pii_redaction(spark, SF_SMOKE)
    # counts follow the injection rule exactly
    bad = out.filter(
        (F.col("n_emails") != (F.col("doc_id") % 3 == 0).cast("long"))
        | (F.col("n_phones") != (F.col("doc_id") % 4 == 0).cast("long"))
        | (F.col("n_ips") != (F.col("doc_id") % 5 == 0).cast("long"))
    )
    assert bad.count() == 0


def test_pii_redacted_text_has_no_matches_left(spark):
    # replay the query's own scrub on the injected text and assert the
    # patterns are gone (the query only exposes md5; recheck the invariant)
    from feature_generation_benchmark_spark.sources.testdata import load_table
    from feature_generation_benchmark_spark.workloads.curation import (
        _injected_text,
    )

    docs = load_table(spark, SF_SMOKE, "documents")
    clean = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(_injected_text(), EMAIL_RE, "[EMAIL]"),
            PHONE_RE,
            "[PHONE]",
        ),
        IPV4_RE,
        "[IP]",
    )
    leftovers = docs.select(
        (
            F.regexp_count(clean, F.lit(EMAIL_RE))
            + F.regexp_count(clean, F.lit(PHONE_RE))
            + F.regexp_count(clean, F.lit(IPV4_RE))
        ).alias("n")
    ).agg(F.sum("n").alias("n")).collect()[0]["n"]
    assert leftovers == 0


def test_dup_ngram_spans_invariants(spark):
    out = dup_ngram_spans(spark, SF_SMOKE).collect()
    assert len(out) > 0
    for r in out:
        assert 0 <= r["n_covered_tokens"] <= r["n_tokens"]
        # each duplicated 3-gram instance covers at most 3 tokens
        assert r["n_covered_tokens"] <= 3 * r["n_dup_ngrams"]
        assert 0.0 <= r["dup_token_fraction"] <= 1.0


def test_dup_ngram_detects_crafted_duplicates(spark, crafted_docs_dir):
    rows = {r["doc_id"]: r for r in dup_ngram_spans(spark, crafted_docs_dir).collect()}
    # docs 0 and 1 share a long run -> duplicated 3-grams cover tokens
    assert rows[0]["n_dup_ngrams"] > 0
    assert rows[1]["n_dup_ngrams"] > 0
    # doc 2 shares nothing
    assert rows[2]["n_dup_ngrams"] == 0
    # doc 3 has < 3 tokens: no n-grams at all
    assert rows[3]["n_dup_ngrams"] == 0 and rows[3]["n_tokens"] == 2


def test_winnowing_guarantee_on_shared_run(spark, crafted_docs_dir):
    """Winnowing's core guarantee: a shared token run of length
    ``w + k - 1`` yields at least one common selected fingerprint."""
    from feature_generation_benchmark_spark.functions.textfns import (
        tokens,
        word_ngrams,
    )
    from feature_generation_benchmark_spark.sources.testdata import load_table
    from pyspark.sql import Window

    docs = load_table(spark, crafted_docs_dir, "documents")
    toked = docs.select("doc_id", tokens(F.col("text")).alias("toks"))
    kg = toked.select(
        "doc_id",
        (F.size("toks") - F.lit(_WIN_K - 1)).alias("nkg"),
        F.posexplode(word_ngrams(F.col("toks"), _WIN_K)).alias("pos", "ng"),
    ).select("doc_id", "nkg", "pos", F.substring(F.md5("ng"), 1, 8).alias("h"))
    win = (
        Window.partitionBy("doc_id").orderBy("pos")
        .rowsBetween(Window.currentRow, _WIN_W - 1)
    )
    sel = (
        kg.withColumn("winmin", F.min("h").over(win))
        .filter((F.col("pos") == 0) | (F.col("pos") <= F.col("nkg") - _WIN_W))
        .select("doc_id", "winmin")
        .distinct()
        .collect()
    )
    fps = {}
    for r in sel:
        fps.setdefault(r["doc_id"], set()).add(r["winmin"])
    assert fps[0] & fps[1], "shared run must contribute a common fingerprint"
    assert not (fps[0] & fps.get(2, set()))


def test_winnowing_output_shape(spark):
    out = winnowing_fingerprint(spark, SF_SMOKE)
    rows = out.collect()
    assert all(r["n_fingerprints"] >= 1 for r in rows)  # all docs are long
    # fingerprints are far fewer than tokens (that's the point)
    assert all(r["n_fingerprints"] <= r["n_tokens"] for r in rows)


def test_mixture_sampling_deterministic_and_clamped(spark):
    a = mixture_sampling(spark, SF_SMOKE)
    b = mixture_sampling(spark, SF_SMOKE)
    assert sorted(r["doc_id"] for r in a.collect()) == sorted(
        r["doc_id"] for r in b.collect()
    )
    # boosted sources at rate >= 1 keep every document
    from feature_generation_benchmark_spark.sources.testdata import load_table

    docs = load_table(spark, SF_SMOKE, "documents")
    kept = a.groupBy("source").agg(
        F.count(F.lit(1)).alias("kept"), F.min("rate").alias("rate")
    )
    totals = docs.groupBy("source").agg(F.count(F.lit(1)).alias("total"))
    j = {r["source"]: r for r in kept.join(totals, "source").collect()}
    for s in MIX_WEIGHTS:
        if s in j and j[s]["rate"] >= 1.0:
            assert j[s]["kept"] == j[s]["total"]
    # non-boosted sources are genuinely subsampled overall
    non_boosted = [r for s, r in j.items() if s not in MIX_WEIGHTS]
    assert sum(r["kept"] for r in non_boosted) < sum(
        r["total"] for r in non_boosted
    )


def test_latest_state_compaction_one_row_per_user(spark):
    from feature_generation_benchmark_spark.sources.testdata import load_table

    out = latest_state_compaction(spark, SF_SMOKE)
    ev = load_table(spark, SF_SMOKE, "events")
    n_users = ev.select("user_id").distinct().count()
    rows = out.collect()
    assert len(rows) == n_users
    # last_ts is the max ts per user (µs truncation of the nanos max)
    truth = {
        r["user_id"]: r["m"]
        for r in ev.groupBy("user_id")
        .agg(F.max(F.expr("ts div 1000")).alias("m"))
        .collect()
    }
    for r in rows:
        assert r["last_ts_us"] == truth[r["user_id"]]
        assert r["n_events"] >= 1


def test_semdedup_keep_rule(spark):
    rows = semdedup(spark, SF_SMOKE).collect()
    assert len(rows) == 500
    for r in rows:
        if r["kept"]:
            assert r["dup_of"] is None and r["max_cos"] is None
        else:
            assert r["dup_of"] is not None and r["dup_of"] < r["vec_id"]
            assert r["max_cos"] >= 0.35
    # the witness of a dropped vector must itself be in the same cell
    cell = {r["vec_id"]: r["cell"] for r in rows}
    for r in rows:
        if not r["kept"]:
            assert cell[r["dup_of"]] == r["cell"]


def test_quality_stratified_keep_rates(spark):
    """Quartiles are ~equal-frequency per source, the best quartile is
    kept whole, and lower-quartile keep fractions track the planted
    1/2, 1/4, 1/8 md5-threshold rates."""
    from feature_generation_benchmark_spark.workloads.curation import (
        quality_stratified_mixture,
    )
    from tests.conftest import SF_SMOKE

    rows = quality_stratified_mixture(spark, SF_SMOKE).collect()
    by_src = {}
    for r in rows:
        by_src.setdefault(r.source, {})[r.qbin] = r
    want_rate = {0: 1 / 8, 1: 1 / 4, 2: 1 / 2, 3: 1.0}
    for src, bins in by_src.items():
        n = sum(r.n_docs for r in bins.values())
        for q, r in bins.items():
            assert abs(r.n_docs - n / 4) <= max(3, 0.25 * n), (src, q)
            if q == 3:
                assert r.n_kept == r.n_docs
            else:
                # binomial slack around the planted rate
                import math

                exp = want_rate[q] * r.n_docs
                slack = 4 * math.sqrt(max(exp, 1)) + 2
                assert abs(r.n_kept - exp) <= slack, (src, q, r)


# --- doc_repetition (r5) ----------------------------------------------------


@pytest.fixture(scope="module")
def repetition_docs_dir(spark, tmp_path_factory):
    """Docs with hand-computable within-doc repetition:
    - doc 0 ("a b a b a b"): bigrams [ab, ba, ab, ba, ab] -> all 5
      occurrences duplicated; tokens 6, types 2.
    - doc 1 ("x y z w"): bigrams [xy, yz, zw] all unique -> 0 duplicated;
      tokens 4, types 4.
    - doc 2 ("solo"): no bigrams; tokens 1, types 1."""
    rows = [
        (0, "a b a b a b", "en", "srcA", 0),
        (1, "x y z w", "en", "srcB", 0),
        (2, "solo", "en", "srcB", 0),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    d = tmp_path_factory.mktemp("repetition_docs")
    df.coalesce(1).write.mode("overwrite").parquet(str(d / "documents.parquet"))
    return str(d)


def test_doc_repetition_hand_computed(spark, repetition_docs_dir):
    from feature_generation_benchmark_spark.workloads.curation import (
        doc_repetition,
    )

    rows = {r["source"]: r for r in doc_repetition(spark, repetition_docs_dir).collect()}
    a = rows["srcA"]
    # all 5 bigram occurrences duplicated -> fraction exactly 1
    assert a["dup_bigram_frac_e6"] == 1_000_000
    assert a["max_doc_dup_frac_e6"] == 1_000_000
    # 2 types over 6 tokens
    assert a["ttr_e6"] == 333_333
    b = rows["srcB"]
    # srcB: doc1 has 3 unique bigrams, doc2 none -> 0 duplicated
    assert b["dup_bigram_frac_e6"] == 0
    assert b["max_doc_dup_frac_e6"] == 0
    # 5 types over 5 tokens
    assert b["ttr_e6"] == 1_000_000
    assert b["n_docs"] == 2


def test_doc_repetition_zero_shuffle_before_source_agg(spark):
    """The dup counting must stay row-local: the plan's only exchange is
    the final per-source aggregate (plus AQE bookkeeping) — no joins, no
    explode-keyed doc shuffles."""
    from feature_generation_benchmark_spark.workloads.curation import (
        doc_repetition,
    )

    plan = doc_repetition(spark, SF_SMOKE)._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    # one hash-partitioned exchange for groupBy(source) + the orderBy's
    # range exchange; anything more means the row-local claim regressed
    assert plan.count("Exchange hashpartitioning") == 1


def test_doc_repetition_property_net(spark):
    """Hypothesis net: random small-vocab docs vs a brute-force Python
    model of the duplicate-bigram occurrence count and TTR (the sorted-
    neighbor trick must equal naive per-bigram counting on any input,
    including all-same-token and single-token docs)."""
    import os
    from collections import Counter

    from hypothesis import given, settings, strategies as st

    from feature_generation_benchmark_spark.workloads.curation import (
        doc_repetition,
    )

    vocab = ["a", "b", "c", "dd"]
    docs_strategy = st.lists(
        st.lists(st.sampled_from(vocab), min_size=1, max_size=12),
        min_size=1,
        max_size=6,
    )

    @settings(
        max_examples=int(os.environ.get("SPARK_GRAFT_NET_EXAMPLES", "0")) or examples(25),
        deadline=None,
    )
    @given(docs=docs_strategy)
    def net(docs):
        rows = [
            (i, " ".join(toks), "en", "srcN", 0)
            for i, toks in enumerate(docs)
        ]
        df = spark.createDataFrame(
            rows,
            "doc_id long, text string, lang string, source string, n_chars long",
        )
        import tempfile

        d = tempfile.mkdtemp(prefix="fgb_repnet_")
        try:
            df.coalesce(1).write.mode("overwrite").parquet(
                f"{d}/documents.parquet"
            )
            got = doc_repetition(spark, d).collect()[0]
        finally:
            import shutil

            shutil.rmtree(d, ignore_errors=True)
        sum_bi = sum_dup = sum_toks = sum_types = 0
        max_dup = None
        for toks in docs:
            bigrams = [
                f"{toks[i]} {toks[i+1]}" for i in range(len(toks) - 1)
            ]
            c = Counter(bigrams)
            dup = sum(v for v in c.values() if v >= 2)
            sum_bi += len(bigrams)
            sum_dup += dup
            sum_toks += len(toks)
            sum_types += len(set(toks))
            if bigrams:
                frac = (1_000_000 * dup) // len(bigrams)
                max_dup = frac if max_dup is None else max(max_dup, frac)
        assert got["n_docs"] == len(docs)
        if sum_bi > 0:
            assert got["dup_bigram_frac_e6"] == (1_000_000 * sum_dup) // sum_bi
        else:  # no bigrams anywhere: NULL, not a crash (net regression)
            assert got["dup_bigram_frac_e6"] is None
        assert got["ttr_e6"] == (1_000_000 * sum_types) // sum_toks
        assert got["max_doc_dup_frac_e6"] == max_dup

    net()


# ---------------------------------------------------------------------------
# r6 session-3 review regressions: ANSI divide-by-zero hardening and the
# degenerate trailing chunk.
# ---------------------------------------------------------------------------


def _docs_dir(spark, tmp_path_factory, rows, name):
    d = tmp_path_factory.mktemp(name)
    spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.mode("overwrite").parquet(str(d / "documents.parquet"))
    return str(d)


def test_curation_pipeline_survives_zero_token_docs(spark, tmp_path_factory):
    """Repro from the review: a punctuation-only doc aborted the whole
    query with DIVIDE_BY_ZERO under Spark 4's default ANSI mode."""
    from feature_generation_benchmark_spark.workloads.curation import (
        curation_pipeline,
    )

    words = " ".join(["the", "a", "of", "to", "and"] * 10)
    rows = [
        (0, "!!! ??? ...", "en", "s0", 11),     # zero tokens
        (1, "", "en", "s0", 0),                  # empty text
        (2, words, "en", "s0", len(words)),
    ]
    d = _docs_dir(spark, tmp_path_factory, rows, "zt_pipeline")
    out = curation_pipeline(spark, d).collect()  # must not raise
    assert sum(r["n_docs"] for r in out) <= 1    # only doc 2 can survive


def test_mixture_sampling_drops_zero_token_sources(spark, tmp_path_factory):
    """A source whose docs all tokenize empty previously crashed Spark
    (ANSI) while the oracle silently dropped it — both now drop it."""
    from feature_generation_benchmark_spark.workloads.curation import (
        mixture_sampling,
    )

    rows = [
        (0, "alpha beta gamma delta", "src0", None),
        (1, "epsilon zeta eta theta", "src1", None),
        (2, "...", "srcEMPTY", None),
        (3, "???", "srcEMPTY", None),
    ]
    rows = [(i, t, "en", s, len(t)) for i, t, s, _ in rows]
    d = _docs_dir(spark, tmp_path_factory, rows, "zt_mixture")
    out = mixture_sampling(spark, d).collect()  # must not raise
    assert {r["source"] for r in out} <= {"src0", "src1"}


def test_doc_chunking_emits_no_fully_contained_trailing_chunk(
    spark, tmp_path_factory
):
    """width 64 / stride 48: a 100-token doc must yield chunks at 0 and
    48 only — the pre-fix third chunk (start 96, tokens 96..99) was
    fully contained in chunk 1: duplicated training text."""
    from feature_generation_benchmark_spark.workloads.sampling import (
        doc_chunking,
    )

    text100 = " ".join(f"w{i}" for i in range(100))
    text64 = " ".join(f"w{i}" for i in range(64))
    text65 = " ".join(f"w{i}" for i in range(65))
    rows = [
        (0, text100, "en", "s0", len(text100)),
        (1, text64, "en", "s0", len(text64)),   # exactly one window
        (2, text65, "en", "s0", len(text65)),   # 65th token needs chunk 2
    ]
    d = _docs_dir(spark, tmp_path_factory, rows, "chunk_tail")
    got = {}
    for r in doc_chunking(spark, d).collect():
        got.setdefault(r["doc_id"], []).append(
            (r["chunk_idx"], r["n_chunk_tokens"])
        )
    assert sorted(got[0]) == [(0, 64), (1, 52)]   # 48..99: 52 tokens, no 3rd
    assert sorted(got[1]) == [(0, 64)]
    assert sorted(got[2]) == [(0, 64), (1, 17)]   # 48..64 adds token 64
    # full coverage: every token index appears in some chunk
    covered = 48 + 52
    assert covered >= 100
