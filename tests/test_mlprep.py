"""Semantic + plan-shape tests for the training-prep workload (PSI drift,
LOO target encoding, histogram-quantile rollup, random projection).

Oracle parity is covered by test_oracle_parity; these pin the *semantics*
(non-negativity, leakage exclusion, quantile bracketing, linearity) and
the plan shapes that make each op viable at 100 TB.
"""

from __future__ import annotations

import math

import duckdb
import numpy as np
import pytest

from feature_generation_benchmark_spark.workloads.mlprep import (
    _HIST_BIN_CENTS,
    _RP_MATRIX,
    _TE_SMOOTH_M,
    audience_overlap_jaccard,
    histogram_quantile_rollup,
    kll_value_sketch_rollup,
    label_centroid_distances,
    mad_robust_outliers,
    psi_feature_drift,
    purged_time_folds,
    quantile_bin_transform,
    random_projection_embeddings,
    target_encoding_loo,
    theta_audience_overlap,
)

from tests.conftest import SF_SMOKE


def _physical(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


# ---------------------------------------------------------------- PSI ----

def test_psi_nonnegative_and_totals(spark):
    rows = psi_feature_drift(spark, SF_SMOKE).collect()
    assert rows
    per_type = duckdb.sql(
        "SELECT event_type, count(*) AS n FROM "
        f"read_parquet('{SF_SMOKE}/events.parquet') GROUP BY event_type"
    ).fetchall()
    raw = dict(per_type)
    for r in rows:
        # every (pa-pb)*ln(pa/pb) term is >= 0, so the quantized sum can
        # dip below zero only by accumulated half-ulp rounding (10 bins).
        assert r.psi_e6 >= -10, r
        assert r.n_a + r.n_b == raw[r.event_type], r


def test_psi_identical_windows_is_zero(spark):
    # A distribution compared against itself must score PSI == 0: feed
    # the same counts into both windows by checking bins where ca == cb
    # contribute nothing — verified end-to-end on a symmetric fixture.
    df = spark.createDataFrame(
        [
            # same value pattern in both halves of the month → ca == cb
            (i, 1_704_067_200_000_000_000 + d * 86_400 * 10**9, i % 7,
             "t", float(v))
            for i, (d, v) in enumerate(
                (d, v) for v in (10.0, 60.0, 110.0, 260.0)
                for d in (2, 20)  # one row each side of the Jan-16 split
            )
        ],
        "event_id long, ts long, user_id long, event_type string, "
        "value double",
    )
    path = "/tmp/psi_sym_fixture"
    df.write.mode("overwrite").parquet(f"{path}/events.parquet")
    out = psi_feature_drift(spark, path).collect()
    assert len(out) == 1
    assert out[0].psi_e6 == 0
    assert out[0].n_a == out[0].n_b == 4


# ------------------------------------------------- target encoding ----

def test_target_encoding_excludes_own_label(spark):
    pdf = target_encoding_loo(spark, SF_SMOKE).toPandas()
    con = duckdb.sql(
        "SELECT o_orderpriority AS cat, "
        "sum(CASE WHEN o_orderstatus='F' THEN 1 ELSE 0 END) AS s, "
        "count(*) AS n FROM "
        f"read_parquet('{SF_SMOKE}/orders.parquet') GROUP BY cat"
    ).fetchall()
    gsum = sum(s for _, s, _ in con)
    gn = sum(n for _, _, n in con)
    gmean = gsum / gn
    stats = {c: (s, n) for c, s, n in con}
    for _, row in pdf.iterrows():
        s, n = stats[row["cat"]]
        # floor(x+0.5): Spark/DuckDB half-UP; Python round() is banker's
        # and disagrees on exact .5 (see test_property_mlprep).
        want = math.floor(
            (s - row["label"] + _TE_SMOOTH_M * gmean)
            / (n - 1 + _TE_SMOOTH_M)
            * 1e6
            + 0.5
        )
        assert row["enc_e6"] == want, (row, want)


def test_target_encoding_is_broadcast_only(spark):
    plan = _physical(target_encoding_loo(spark, SF_SMOKE))
    assert "SortMergeJoin" not in plan, plan
    assert plan.count("BroadcastHashJoin") + plan.count(
        "BroadcastNestedLoopJoin"
    ) == 2, plan


# ------------------------------------------- histogram quantile rollup ----

def test_histogram_quantiles_bracket_exact(spark):
    rows = histogram_quantile_rollup(spark, SF_SMOKE).collect()
    exact = dict(
        duckdb.sql(
            "SELECT event_type, "
            "quantile_disc(CAST(round(value*100) AS BIGINT), 0.5) FROM "
            f"read_parquet('{SF_SMOKE}/events.parquet') GROUP BY event_type"
        ).fetchall()
    )
    for r in rows:
        med = exact[r.event_type]
        assert r.p50_lb_cents <= med < r.p50_lb_cents + _HIST_BIN_CENTS, (
            r,
            med,
        )
        assert r.p90_bin >= r.p50_bin


# ------------------------------------------------- random projection ----

def test_random_projection_matches_numpy(spark):
    pdf = random_projection_embeddings(spark, SF_SMOKE).toPandas()
    raw = duckdb.sql(
        f"SELECT vec_id, embedding FROM "
        f"read_parquet('{SF_SMOKE}/embeddings.parquet')"
    ).fetchall()
    R = np.array(_RP_MATRIX, dtype=np.int64)
    want = {}
    for vid, emb in raw:
        q = np.round(np.array(emb, dtype=np.float64) * 1e6).astype(np.int64)
        want[vid] = R @ q
    for _, row in pdf.iterrows():
        got = np.array([row[f"p{i}"] for i in range(8)], dtype=np.int64)
        assert (got == want[row["vec_id"]]).all(), row["vec_id"]


def test_random_projection_is_shuffle_free(spark):
    plan = _physical(random_projection_embeddings(spark, SF_SMOKE))
    assert "Exchange" not in plan, plan


def test_rp_matrix_is_balanced():
    # a JL sign matrix should be near-balanced; guards against a seed
    # change silently degenerating the projection
    flat = [s for row in _RP_MATRIX for s in row]
    assert abs(sum(flat)) < len(flat) * 0.25
    assert {1, -1} == set(flat)


# ------------------------------------------------- audience overlap ----

def test_audience_overlap_invariants(spark):
    rows = audience_overlap_jaccard(spark, SF_SMOKE).collect()
    assert 0 < len(rows) <= 10  # C(5,2) event-type pairs max
    for r in rows:
        assert r.ta < r.tb
        assert 0 < r.inter <= min(r.na, r.nb)
        assert 0 < r.jaccard_e6 <= 1_000_000


def test_audience_overlap_no_self_join_shuffle(spark):
    plan = _physical(audience_overlap_jaccard(spark, SF_SMOKE))
    assert "SortMergeJoin" not in plan, plan


# ------------------------------------------------------ MAD robust ----

def test_mad_resists_outlier_injection(spark, tmp_path):
    base = [(i, 1_704_067_200_000_000_000 + i, i, "t", 100.0 + (i % 9))
            for i in range(99)]
    spike = [(999, 1_704_067_200_000_000_000, 999, "t", 9_999_999.0)]
    schema = (
        "event_id long, ts long, user_id long, event_type string, "
        "value double"
    )
    p1 = str(tmp_path / "clean")
    p2 = str(tmp_path / "spiked")
    spark.createDataFrame(base, schema).write.parquet(f"{p1}/events.parquet")
    spark.createDataFrame(base + spike, schema).write.parquet(
        f"{p2}/events.parquet"
    )
    clean = mad_robust_outliers(spark, p1).collect()[0]
    spiked = mad_robust_outliers(spark, p2).collect()[0]
    # median and MAD barely move under a 100000x spike; the spike is
    # counted as the (single) outlier
    assert abs(spiked.med_cents - clean.med_cents) <= 100
    assert abs(spiked.mad_cents - clean.mad_cents) <= 100
    assert spiked.n_outliers == 1
    assert clean.n_outliers == 0


# ------------------------------------------------- label centroids ----

def test_label_centroids_match_numpy(spark):
    rows = label_centroid_distances(spark, SF_SMOKE).collect()
    raw = duckdb.sql(
        f"SELECT label, embedding FROM "
        f"read_parquet('{SF_SMOKE}/embeddings.parquet')"
    ).fetchall()
    def half_away(x):
        # Spark/DuckDB ROUND is half-away-from-zero; np.round is half-even
        return (np.sign(x) * np.floor(np.abs(x) + 0.5)).astype(np.int64)

    by_label = {}
    for lab, emb in raw:
        q = half_away(np.array(emb, dtype=np.float64) * 1e6)
        by_label.setdefault(lab, []).append(q)
    cents = {
        lab: half_away(np.sum(vs, axis=0).astype(np.float64) / len(vs))
        for lab, vs in by_label.items()
    }
    n_labels = len(cents)
    assert len(rows) == n_labels * (n_labels - 1) // 2
    for r in rows:
        d = cents[r.label_a] - cents[r.label_b]
        assert r.dist2 == int(np.dot(d, d)), (r.label_a, r.label_b)


# --------------------------------------------------- sketch siblings ----

def test_kll_rollup_quantiles_within_rank_error(spark):
    rows = kll_value_sketch_rollup(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        cents = [
            c
            for (c,) in duckdb.sql(
                "SELECT CAST(round(value*100) AS BIGINT) FROM "
                f"read_parquet('{SF_SMOKE}/events.parquet') "
                f"WHERE event_type = '{r.event_type}'"
            ).fetchall()
        ]
        cents.sort()
        assert r.n == len(cents)
        for est, q in ((r.p50_cents, 0.5), (r.p90_cents, 0.9)):
            # the returned value's true rank must sit within KLL's
            # default-k normalized rank error (~1.7%) of the target,
            # plus discreteness slack on a few hundred samples
            import bisect

            rank = bisect.bisect_right(cents, est) / len(cents)
            assert abs(rank - q) <= 0.05, (r.event_type, q, rank)


def test_theta_overlap_exact_below_sampling_threshold(spark):
    r = theta_audience_overlap(spark, SF_SMOKE).collect()[0]
    exact = duckdb.sql(
        "WITH p AS (SELECT DISTINCT user_id FROM "
        f"read_parquet('{SF_SMOKE}/events.parquet') "
        "WHERE event_type='purchase'), "
        "e AS (SELECT DISTINCT user_id FROM "
        f"read_parquet('{SF_SMOKE}/events.parquet') "
        "WHERE event_type='error') "
        "SELECT (SELECT count(*) FROM p), (SELECT count(*) FROM e), "
        "(SELECT count(*) FROM (SELECT * FROM p UNION SELECT * FROM e)), "
        "(SELECT count(*) FROM (SELECT * FROM p INTERSECT SELECT * FROM e)), "
        "(SELECT count(*) FROM (SELECT * FROM p EXCEPT SELECT * FROM e))"
    ).fetchall()[0]
    # theta sketches are exact below their sampling threshold, and the
    # smoke corpus has far fewer distinct users than that
    assert (r.est_a, r.est_b, r.est_union, r.est_intersect, r.est_a_only) \
        == exact


# --------------------------------------------------- purged time folds ----

def test_purged_folds_partition_and_embargo(spark):
    rows = purged_time_folds(spark, SF_SMOKE).collect()
    total = duckdb.sql(
        f"SELECT count(*) FROM read_parquet('{SF_SMOKE}/events.parquet')"
    ).fetchall()[0][0]
    by_fold = {}
    for r in rows:
        by_fold.setdefault(r.fold, {})[r.role] = r.n
    assert set(by_fold) == {0, 1, 2}
    # fold 0's test window starts at day 0: nothing can be train/purged
    assert set(by_fold[0]) == {"test"}
    for k in (1, 2):
        assert set(by_fold[k]) == {"train", "purged", "test"}
        # the purge gap sits between train and test; all roles + the
        # excluded future rows partition the corpus
        future = total - sum(by_fold[k].values())
        assert future >= 0
    # later folds train on strictly more history
    assert by_fold[2]["train"] > by_fold[1]["train"]


# ---------------------------------------------- quantile discretizer ----

def test_quantile_bins_are_equal_frequency(spark):
    rows = quantile_bin_transform(spark, SF_SMOKE).collect()
    by_type = {}
    for r in rows:
        by_type.setdefault(r.event_type, {})[r.qbin] = r
    for etype, bins in by_type.items():
        assert set(bins) == {0, 1, 2, 3}
        n = sum(r.n for r in bins.values())
        for q, r in bins.items():
            # equal-frequency within interpolation/tie slack
            assert abs(r.n - n / 4) <= max(2, 0.1 * n), (etype, q, r.n, n)
        # bins tile the value range in order without overlap
        for q in (0, 1, 2):
            assert bins[q].hi_cents <= bins[q + 1].lo_cents


# --- calibration_bins (r5) --------------------------------------------------


def test_calibration_bins_partition_of_events(spark):
    """Bins partition the event set: counts sum to |events|, every bin id
    is in [0, 10), positives never exceed counts."""
    from feature_generation_benchmark_spark.sources.testdata import load_table
    from feature_generation_benchmark_spark.workloads.mlprep import (
        calibration_bins,
    )

    out = calibration_bins(spark, SF_SMOKE).collect()
    total = load_table(spark, SF_SMOKE, "events").count()
    assert sum(r["n"] for r in out) == total
    assert all(0 <= r["bin"] < 10 for r in out)
    assert all(0 <= r["n_pos"] <= r["n"] for r in out)


def test_calibration_bins_score_consistent_with_bin(spark):
    """Mean predicted score must fall inside its bin's value range
    (equal-width bins over [0, 1e6) at e6 scale), and the gap column is
    |avg_score - obs_rate| exactly."""
    from feature_generation_benchmark_spark.workloads.mlprep import (
        calibration_bins,
    )

    for r in calibration_bins(spark, SF_SMOKE).collect():
        lo, hi = r["bin"] * 100_000, (r["bin"] + 1) * 100_000
        assert lo <= r["avg_score_e6"] < hi
        assert r["gap_e6"] == abs(r["avg_score_e6"] - r["obs_rate_e6"])


def test_calibration_bins_single_agg_plan(spark):
    """One conditional aggregate over the scan: no joins, exactly one
    hash exchange (the <=10-key bin agg) + the orderBy range exchange."""
    from feature_generation_benchmark_spark.workloads.mlprep import (
        calibration_bins,
    )

    plan = (
        calibration_bins(spark, SF_SMOKE)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Join" not in plan
    assert plan.count("Exchange hashpartitioning") == 1


# --- pca_power_iteration (r5) ------------------------------------------------


def test_pca_power_iteration_finds_planted_direction(spark, tmp_path):
    """Corpus with variance planted along one axis: the dominant loading
    must be that axis at full scale (1e6), everything else near zero."""
    import numpy as np

    from feature_generation_benchmark_spark.workloads.mlprep import (
        pca_power_iteration,
    )

    rng = np.random.default_rng(7)
    d = 6
    rows = []
    for i in range(200):
        v = rng.normal(0, 0.01, d)
        v[2] += rng.choice([-1.0, 1.0]) * 1.0  # variance lives on axis 2
        rows.append((i, [float(x) for x in v], 0))
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "embeddings.parquet")
    )
    out = {r["dim"]: r["loading_e6"] for r in
           pca_power_iteration(spark, str(tmp_path)).collect()}
    assert abs(out[2]) == 1_000_000  # max-norm puts the dominant axis at 1e6
    for dim, v in out.items():
        if dim != 2:
            assert abs(v) < 100_000


def test_pca_power_iteration_matches_numpy_eigenvector(spark):
    """On the real corpus the integer trajectory must align with numpy's
    top covariance eigenvector (|cosine| > 0.999 after 8 iterations —
    the quantization error is ~1e-6, convergence error dominated by the
    corpus' strong cluster eigengap)."""
    import numpy as np

    from feature_generation_benchmark_spark.sources.testdata import load_table
    from feature_generation_benchmark_spark.workloads.mlprep import (
        pca_power_iteration,
    )

    out = pca_power_iteration(spark, SF_SMOKE).collect()
    x = np.array(
        [r["loading_e6"] for r in sorted(out, key=lambda r: r["dim"])],
        dtype=np.float64,
    )
    V = np.stack([
        np.asarray(r["embedding"], dtype=np.float64)
        for r in load_table(spark, SF_SMOKE, "embeddings").collect()
    ])
    cov = np.cov(V, rowvar=False, bias=True)
    w, vecs = np.linalg.eigh(cov)
    top = vecs[:, int(np.argmax(w))]
    cos = abs(x @ top) / (np.linalg.norm(x) * np.linalg.norm(top))
    assert cos > 0.999
