"""Scale-stability probe for the relational join queries and the
event/document operators (r2c).

Synthesizes an N× fact-side scale-up of the sf0.1 testdata (orderkeys
shifted per copy so order cardinality actually grows; dimension tables
unchanged — the realistic shape: facts grow, dims don't) into /tmp, then
times a set of join-heavy queries at 1× and N× and reports the runtime
ratio and whether the physical plan shape changed (fact-fact join
strategy, broadcast count). Linear-ish ratios + stable shapes are the
evidence that these plans survive a real scale-up; a superlinear ratio or
a broadcast flipping to a shuffle join is a red flag to investigate.

Usage: python tools/scale_stability.py [factor] [query ...]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import pandas as pd  # noqa: E402  module-level: pandas_udf type-hint resolution

from pyspark.sql import functions as F  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
QUERIES = ("q7_nation_volume", "q13_order_histogram", "q18_large_orders",
           "q21_blamed_suppliers",
           # r3b: sweep-line interval concurrency and rolling actives —
           # outputs are calendar-bounded, so they collect directly and
           # MUST stay flat-sized while the fact side grows
           "open_orders_daily", "rolling_active_users",
           # r4: the two iterative programs (per-iteration cost — broadcast
           # state + bounded exchanges must hold while the fact/corpus side
           # grows; outputs are k-cell / supplier-dim sized → collect)
           "kmeans_embeddings", "pagerank_suppliers",
           # r4 wave operators with domain-bounded outputs → collect
           "markov_transitions", "journey_paths_top", "itemset_pairs",
           "event_debounce", "zipf_fit", "price_skyline",
           # r4c: BFS (supplier-dim output; per-level broadcast joins must
           # hold as the edge side grows), one-pass corr matrix (6 rows),
           # label MI (1 row, contingency table is domain-bounded)
           "supplier_bfs_hops", "lineitem_corr_matrix", "lang_source_mi",
           # r4d: Gram matrix (d²-bounded output; the one exchange must
           # stay partial-agg-bounded as the corpus grows), per-customer
           # EMA (customer-dim output; per-key sequences grow 10× — the
           # axis the sequential fold must be linear on), BM25 (k rows)
           "embedding_gram_matrix", "ema_customer_spend",
           "bm25_doc_ranking",
           # r4d (2): RRF fusion (k rows; both sources must top-k before
           # fusing), GROUPING SETS (|domains|-bounded), HLL rollup
           # (type-dim output; the sketch table is the only exchange)
           "hybrid_search_rrf", "grouping_sets_lineitem",
           # _raw = the PRODUCTION sketch plans (r6 repointed the plain
           # names to bound-gated _check twins that also run the exact
           # aggregates — probing those would time the verification cost,
           # not the sketch plan this list exists to watch)
           "hll_users_sketch_rollup_raw",
           # r4e: PSI drift + histogram rollup (type-dim outputs; the one
           # combining groupBy(type,bin) / (type,day,bin) exchange must
           # stay partial-agg-bounded as the event side grows)
           "psi_feature_drift", "histogram_quantile_rollup",
           # r4e (2): audience overlap (pair-domain output; per-user pair
           # explosion is ≤C(5,2)-bounded), MAD robust stats (type-dim),
           # label centroids (label²-bounded; per-dim sums must stay
           # partial-agg-bounded as the corpus grows)
           "audience_overlap_jaccard", "mad_robust_outliers",
           "label_centroid_distances",
           # r4e (3): skip-gram PMI (top-K-bounded output; the pair-count
           # agg must stay vocab²-bounded as the doc side grows)
           "skipgram_pmi",
           # r4e (4): DataSketches siblings (type-dim outputs; sketch
           # state is k-bounded per (type,day) / per type regardless of
           # the event side)
           "kll_value_sketch_rollup_raw", "theta_audience_overlap_raw",
           "approx_users_per_type_raw", "schema_profile_approx_raw",
           # r4e (5): purged temporal CV folds (folds×roles-bounded
           # output; the broadcast fold spec + one combining agg must
           # hold as the event side grows)
           "purged_time_folds",
           # r4e (6): quantile discretizer (type×4-bounded output; the
           # percentile fit + broadcast-apply must hold at scale)
           "quantile_bin_transform",
           # r4e (7): windowFunnel DP fold (4-row output; one user-keyed
           # exchange, O(steps) state per user regardless of event count)
           "window_funnel_depth",
           # r4e (8): CUSUM alarms (type-dim output; the (type,day)
           # combining agg is the only corpus-sized exchange, the fold
           # state is calendar-bounded)
           "cusum_daily_alarms",
           # r4e (9): Poisson bootstrap (type-dim output; the ×B fan-out
           # combines map-side into (type, replicate) partials)
           "bootstrap_se_spend",
           # r4e (10): data-ops queries (edge-count / col-count bounded
           # outputs; anti-join key builds and the one wide agg must
           # hold as facts grow)
           "fk_orphan_audit", "schema_profile",
           # r4e (11): lead-lag corr (8-row output; one (type,day)
           # combining agg, lag alignment on the 30-row day frame)
           "leadlag_click_purchase",
           # r4e (12): quality-stratified mixture (source×4-bounded
           # output; percentile fit + broadcast-apply + one agg)
           "quality_stratified_mixture",
           # r4e (13): GNN feature smoothing (supplier-dim output; the
           # 2-hop edge⋈edge fan-out is the co-purchase density bound
           # that must not flip plans as facts grow)
           "graph_feature_propagation",
           # r4e (14): SGNS noise table (top-500-bounded output; the
           # vocab agg + TakeOrdered must hold as docs grow)
           "negative_sampling_table",
           # r4e (15): experimentation pair (1-row outputs; one
           # conditional agg / one distinct-user agg over the scan)
           "diff_in_diff_arms", "srm_check",
           # r4e (16): weekly seasonal strength (type-dim output; one
           # (type,day) combining agg, rest ≤ types×7 rows)
           "weekday_seasonality",
           # r4e (17): RFM segmentation (≤64-code output; per-user agg
           # + broadcast 1-row boundary model + code agg)
           "rfm_segments",
           # r4e (18): ship-lag SLA percentiles (priority-dim output;
           # the fact-fact join must hold as both sides grow)
           "ship_lag_percentiles",
           # r5: hard negatives (Q×k-bounded output; the label-masked
           # partial-top-k state must stay bounded as the corpus grows),
           # repetition rollup (|sources|-bounded; dup counting is
           # row-local — the one agg must stay partial-agg-bounded),
           # calibration bins (10-row output; one conditional agg)
           "hard_negative_mining", "doc_repetition", "calibration_bins",
           # r5 (2): PCA power iteration (d-row output; the ONE exploded
           # map-combined stats pass must stay P×d²-bounded as the
           # corpus grows; the 100-step iteration is driver model math)
           "pca_power_iteration",
           # r5 (3): approximate ANN paths (Q×k-bounded outputs; the
           # bucket/cell candidate joins must stay candidate-bounded —
           # never all-pairs — as the corpus grows)
           "ann_lsh_topk", "ann_ivf_topk",
           # r6 (3): PQ ADC (QxK-bounded output; the coded scan keeps
           # O(QxL) state per partition and the rerank touches only QxL
           # raw rows — both must stay flat as the corpus grows)
           "ann_pq_topk", "ann_ivfpq_topk",
           # r5 (4): real-codec roundtrip (|sources|-bounded output;
           # encode/decode is a narrow map — blobs never shuffle)
           "multimodal_real_pixel_stats",
           # r6 session 3: LM-data ops with model-bounded outputs —
           # CCNet tertiles (3 rows; histogram + 1-row boundary frame),
           # DSIR top-K (50 rows; 256-bucket broadcast model),
           # BPE trainer (K rules; corpus aperture is ONE word count,
           # every iteration is top-M-vocab-bounded),
           # snapshot diff (4 rows; one full-outer key join)
           "ccnet_perplexity_buckets", "dsir_importance_weights",
           "bpe_train_merges", "snapshot_diff")

#: event/document operators probed through a wrapping CHECKSUM aggregate:
#: their full outputs grow with the scale factor, so collect() would ship
#: millions of rows. The checksum (sum of xxhash64 over EVERY output
#: column) forces all columns to be produced, so Catalyst cannot prune
#: cardinality-preserving stages — a bare count(1) wrapper let it
#: eliminate gap_fill_daily's LOCF window AND its calendar left join
#: (key-unique unreferenced right side), timing a reduced plan. Because
#: the WRAPPED frame is what runs, its AQE plan finalizes for inspection;
#: the one extra global agg appears identically at 1x and Nx, so shape
#: comparison stays valid. (A wrapper on the ORIGINAL frame plans a
#: separate query and leaves it unfinalized.) Events scale on BOTH event
#: and user cardinality — the axis gap-fill/funnel/cohort plans must
#: scale on.
NOOP_QUERIES = ("gap_fill_daily", "heavy_hitters", "funnel_conversions",
                 "cohort_retention", "tfidf_top_terms", "ohlc_bars",
                 # r3b operators whose outputs grow with the corpus
                 "user_daily_anomaly", "cdc_chunking", "dedup_chunk_exact",
                 "top_ngram_coverage", "unigram_logprob",
                 # r4 wave operators whose outputs grow with docs/users
                 "char_entropy", "bigram_logprob", "scd2_intervals",
                 "user_spend_percentile", "embedding_quantize_int8",
                 # r4e: per-row outputs (orders / embeddings sized)
                 "target_encoding_loo", "random_projection_embeddings",
                 # r4e (8): user-dim output grows with the user axis
                 "user_trend_slope",
                 # r5: near-dup pair output grows with the corpus; the
                 # prefix-filtered candidate join must stay subquadratic
                 "dedup_ngram_jaccard_prefix",
                 # r5 (3): resize output is corpus-sized (one row per
                 # blob); the mapInPandas batch plumbing must stay
                 # shuffle-free as the blob side grows
                 "multimodal_resize",
                 # r5 (4): dedup outputs grow with the corpus (per-doc
                 # keep flags / duplicate pairs) — collecting them at
                 # 100x breaches driver.maxResultSize; checksum-wrap
                 "dedup_exact", "dedup_minhash_md5", "dedup_simhash_md5",
                 "dedup_minhash_lsh", "dedup_simhash",
                 "dedup_ngram_jaccard", "dedup_embedding_cosine",
                 "decontamination", "semdedup", "duplicate_clusters",
                 # r6: raw LSH pair output grows with the corpus; the
                 # discovered-domain feature store is user-dim (grows on
                 # the scaled user axis)
                 "dedup_minhash_lsh_raw", "feat_discovered_domain",
                 # r6 (2): corpus-sized outputs — incremental/naive pair
                 # sets, per-doc bloom flags, per-doc BPE symbol counts
                 "dedup_jaccard_incremental", "dedup_ngram_jaccard_naive",
                 "decontamination_bloom", "bpe_apply_merges")


def build_scaled(spark, factor: int) -> str:
    """N× copies of lineitem/orders with disjoint orderkey ranges; other
    tables symlink-copied unchanged."""
    out = tempfile.mkdtemp(prefix=f"fgb_scale{factor}x_")
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    shift = (orders.agg(F.max("o_orderkey")).collect()[0][0] or 0) + 1

    def copies(df, key):
        parts = [
            df.withColumn(key, F.col(key) + F.lit(i * shift))
            for i in range(factor)
        ]
        u = parts[0]
        for p in parts[1:]:
            u = u.unionByName(p)
        return u

    li_scaled = copies(li, "l_orderkey")
    if os.environ.get("SPARK_GRAFT_HOTKEY"):
        # viral-hub fixture (r4 verdict #4): attach EVERY supplier to one
        # existing order, so that order's customer gets degree ≈
        # |supplier| while typical customers have single-digit degree.
        # Graph queries whose cost is super-linear in per-key degree
        # (the old edge⋈edge 2-hop) go quadratic on this key; the
        # chained-agg plan must stay flat.
        hub_key = orders.agg(F.min("o_orderkey")).collect()[0][0]
        supp_keys = spark.read.parquet(
            f"{SF_DIR}/supplier.parquet"
        ).select("s_suppkey")
        template = li.limit(1).drop("l_suppkey", "l_orderkey")
        hub_rows = (
            supp_keys.crossJoin(F.broadcast(template))
            .withColumn("l_orderkey", F.lit(hub_key))
            .withColumnRenamed("s_suppkey", "l_suppkey")
            .select(*li.columns)
        )
        li_scaled = li_scaled.unionByName(hub_rows)
        print(f"# hotkey fixture: order {hub_key} spans all suppliers")
    li_scaled.write.mode("overwrite").parquet(
        f"{out}/lineitem.parquet"
    )
    copies(orders, "o_orderkey").write.mode("overwrite").parquet(
        f"{out}/orders.parquet"
    )
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    ev_shift = (ev.agg(F.max("event_id")).collect()[0][0] or 0) + 1
    u_shift = (ev.agg(F.max("user_id")).collect()[0][0] or 0) + 1
    ev_parts = [
        ev.withColumn("event_id", F.col("event_id") + F.lit(i * ev_shift))
        .withColumn("user_id", F.col("user_id") + F.lit(i * u_shift))
        for i in range(factor)
    ]
    ev_u = ev_parts[0]
    for part in ev_parts[1:]:
        ev_u = ev_u.unionByName(part)
    ev_u.write.mode("overwrite").parquet(f"{out}/events.parquet")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    d_shift = (docs.agg(F.max("doc_id")).collect()[0][0] or 0) + 1
    # copies get a per-copy word suffix: shingle sets stay bijective
    # WITHIN a copy (near-dup structure preserved) but diverge ACROSS
    # copies — without this every doc is a near-dup of its N-1 shifted
    # twins and the dedup OUTPUT itself is O(N²) by construction (the
    # fixture, not the plan, goes quadratic).
    # The suffix must FUSE with the word under the engine's tokenizer
    # ([^a-z0-9]+ splits): the former "_{i}" suffix tokenized into a
    # SEPARATE number token, interleaving every doc's token stream
    # (word, i, word, i, ...) — 3-gram shingles collapsed to
    # bigram-arity patterns and the per-copy shingle-frequency skew
    # exploded ~170× (sf0.1: 1.06M post-bound prefix matches on the
    # real corpus vs 181M per suffixed copy). Probes on that fixture
    # measured a hotter DISTRIBUTION, not the plan's scaling (r7).
    # "qq{i}" stays inside the token (base vocab contains no 'qq'), so
    # each copy is the 1× corpus under a bijective word rename —
    # identical shingle arity, identical frequency structure.
    d_parts = [
        docs.withColumn("doc_id", F.col("doc_id") + F.lit(i * d_shift))
        .withColumn(
            "text",
            F.array_join(
                F.transform(
                    F.split(F.col("text"), " "),
                    lambda w: F.concat(w, F.lit(f"qq{i}")),
                ),
                " ",
            ),
        )
        for i in range(factor)
    ]
    d_u = d_parts[0]
    for part in d_parts[1:]:
        d_u = d_u.unionByName(part)
    d_u.write.mode("overwrite").parquet(f"{out}/documents.parquet")
    # embeddings scale on corpus cardinality (vec_id shifted per copy) —
    # the axis the iterative kmeans assignment/update must be linear on
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    e_shift = (emb.agg(F.max("vec_id")).collect()[0][0] or 0) + 1
    e_parts = [
        emb.withColumn("vec_id", F.col("vec_id") + F.lit(i * e_shift))
        for i in range(factor)
    ]
    e_u = e_parts[0]
    for part in e_parts[1:]:
        e_u = e_u.unionByName(part)
    e_u.write.mode("overwrite").parquet(f"{out}/embeddings.parquet")
    for t in ("region", "nation", "customer", "supplier", "part"):
        src = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(src):
            os.symlink(src, f"{out}/{t}.parquet")
    return out


def run_and_final_plan(build, action="collect") -> tuple[float, tuple[int, int, int]]:
    """Build AND execute the frame (collect — probe queries all return
    small results) and read the plan AFTER the action so AQE's FINAL plan
    is inspected: reading executedPlan before execution shows only the
    initial plan (isFinalPlan=false), which would hide exactly the
    runtime join-strategy flips this tool exists to catch.

    ``build`` is a thunk: plan CONSTRUCTION is inside the timed region
    because the iterative programs do real work at build time (pagerank's
    per-iteration ``localCheckpoint(eager=True)`` materializes every
    iteration before the final frame exists; model-collecting operators
    run small jobs) — timing only the final collect would probe a stub."""
    t0 = time.time()
    df = build()
    if action != "collect":
        # checksum referencing every output column — keeps all joins/
        # windows/aggregates in the executed plan (count(1) lets Catalyst
        # prune cardinality-preserving stages entirely)
        # bit_xor, not sum: ANSI mode raises on long-sum overflow and
        # hash values cover the full int64 range
        df = df.select(
            F.xxhash64(*df.columns).alias("__h")
        ).agg(F.bit_xor("__h"))
    df.collect()
    dt = time.time() - t0
    p = df._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=false" not in p, "plan not finalized"
    return dt, (
        p.count("BroadcastHashJoin"),
        p.count("SortMergeJoin") + p.count("ShuffledHashJoin"),
        p.count("Exchange hashpartitioning"),
    )


def main() -> int:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    only = sys.argv[2:] or QUERIES

    from feature_generation_benchmark_spark.session import get_spark
    from feature_generation_benchmark_spark.workloads import registry

    # The probe JVM hosts driver + 32 executor threads + the Nx dataset
    # build + query caches in ONE heap; at 100x the default 8g makes
    # AQE-chosen broadcasts die on driver memory — an artifact of the
    # single-JVM harness, not of the plan (each real executor has its
    # own heap). Give the probe a bigger heap unless the caller pinned
    # one.
    os.environ.setdefault("SPARK_DRIVER_MEMORY", "24g")
    spark = get_spark("scale-stability")
    reg = registry()
    # warm the JVM + Python worker pool once (same block as bench.py) so
    # the 1x leg doesn't absorb session-startup costs and deflate ratios
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _warm(v: pd.Series) -> pd.Series:
        return v

    spark.range(64).select(_warm(F.col("id").cast("double"))).count()
    scaled = build_scaled(spark, factor)
    print(f"# scaled dataset ({factor}x facts): {scaled}")
    try:
        for name in only:
            fn = reg[name].fn
            action = "noop" if name in NOOP_QUERIES else "collect"
            t_base, base_shape = run_and_final_plan(
                lambda: fn(spark, SF_DIR), action
            )
            t_big, big_shape = run_and_final_plan(
                lambda: fn(spark, scaled), action
            )
            ratio = t_big / max(t_base, 1e-9)
            flag = "" if ratio < factor * 1.5 else "  <-- SUPERLINEAR"
            shape_note = (
                "stable"
                if base_shape == big_shape
                else f"CHANGED {base_shape}->{big_shape}"
            )
            print(
                f"{name}: 1x {t_base:.2f}s  {factor}x {t_big:.2f}s  "
                f"ratio {ratio:.1f} (linear would be <={factor})  "
                f"plan {shape_note}{flag}"
            )
    finally:
        shutil.rmtree(scaled, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
