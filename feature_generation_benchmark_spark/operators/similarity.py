"""Similarity search over embedding columns (``array<float>``).

Brute-force cosine top-k is the exact baseline (and the oracle-checkable
path); random-hyperplane LSH bucketing and an IVF-style coarse quantizer are
the scale paths — at 100 TB, candidate generation must be a key-equality
join on bucket ids, never a cross join.

Pairwise vector math (dots, norms) is built-in higher-order functions
(``zip_with`` + ``aggregate``) over doubles. Dense batch math (centroid
assignment, blocked all-pairs matmuls) goes through Arrow-vectorized
pandas UDFs — numpy matmul per batch beats interpreted per-row folds by
orders of magnitude there, and the models (centroid matrices) are tiny
broadcast closures.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def as_double_array(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ — left-to-right fold (deterministic order)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x)
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def unit_normalize(a: Column) -> Column:
    """Scale to unit L2 norm in O(d) per evaluation.

    The reciprocal norm rides in via ``array_repeat`` + ``zip_with``, whose
    argument expressions are each evaluated ONCE per call. The naive
    ``transform(a, x -> x / l2_norm(a))`` re-evaluates the norm fold per
    element — O(d²) interpreted work per row, since higher-order functions
    are codegen-fallback with no subexpression elimination."""
    inv = F.lit(1.0) / l2_norm(a)
    return F.zip_with(a, F.array_repeat(inv, F.size(a)), lambda x, s: x * s)


def _valid_vector(a: Column) -> Column:
    """NULL or zero-norm vectors have no defined cosine; both top-k forms
    exclude them up front (NaN-vs-NULL ranking of undefined similarities
    is engine-dependent — Spark sorts NaN above +inf — so admitting them
    would make results formulation-dependent)."""
    return a.isNotNull() & (l2_norm(a) > 0)


def _rank_topk(
    scored: DataFrame, k: int, round_decimals: int | None
) -> DataFrame:
    """Shared top-k ranking tail for every ANN form: rank on the QUANTIZED
    sim with an id tie-break — top-k membership is decided on a value
    every formulation/engine agrees on (see brute_force_topk_partial's
    determinism note) — and emit the rounded sim. Extracted (r6 session-3
    review): the block was copy-pasted four times and a determinism fix
    in one could silently miss the others."""
    rank_sim = (
        F.round(F.col("cos_sim"), round_decimals)
        if round_decimals is not None
        else F.col("cos_sim")
    )
    w = Window.partitionBy("query_id").orderBy(
        rank_sim.desc(), F.col("neighbor_id")
    )
    ranked = scored.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= k
    )
    return ranked.select("query_id", "neighbor_id", rank_sim.alias("cos_sim"))


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 5,
    round_decimals: int | None = 6,
) -> DataFrame:
    """Exact cosine top-k: corpus × queries nested-loop (broadcast the
    queries — the small side), rank per query, keep k.

    Output: (query_id, neighbor_id, cos_sim). Self-matches excluded;
    NULL/zero-norm vectors excluded on both sides (``_valid_vector``).
    """
    q = queries.filter(_valid_vector(as_double_array(vec_col))).select(
        F.col(id_col).alias("query_id"),
        unit_normalize(as_double_array(vec_col)).alias("qv"),
    )
    c = corpus.filter(_valid_vector(as_double_array(vec_col))).select(
        F.col(id_col).alias("neighbor_id"),
        unit_normalize(as_double_array(vec_col)).alias("cv"),
    )
    scored = c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id")).select(
        "query_id",
        "neighbor_id",
        dot(F.col("qv"), F.col("cv")).alias("cos_sim"),
    )
    return _rank_topk(scored, k, round_decimals)


def brute_force_topk_partial(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 5,
    round_decimals: int | None = 6,
    exclude_label_col: str | None = None,
) -> DataFrame:
    """EXACT cosine top-k that survives a 100× corpus — same results as
    :func:`brute_force_topk`, different physical shape.

    The plain form scores N×Q pairs with an interpreted fold and then
    SHUFFLES all N×Q scored rows into the per-query ranking window — the
    shuffle is what dies at scale. Here the query set (the small side by
    contract — a serving/eval batch) is collected into a tiny Q×d model
    matrix (the IVF-centroid broadcast-literal precedent), each corpus
    partition scores its rows with one numpy GEMM per Arrow batch and
    keeps a bounded per-query top-k across batches (``mapInPandas``,
    O(Q×k) state), and only those P×Q×k candidate rows reach the global
    merge window. Shuffle volume: P×Q×k, independent of corpus size.

    Tie-breaking (cos_sim desc, neighbor_id asc) and the round-6 output
    contract match the plain form and the DuckDB oracle; NULL/zero-norm
    vectors are excluded on both sides (``_valid_vector``), same as the
    plain form.

    Determinism: top-k MEMBERSHIP is decided on the QUANTIZED sim
    (``round(sim, round_decimals)``, id tie-break) at every level —
    the per-partition running top-k here, the global merge window, the
    plain form's ranking window, and the DuckDB oracle's ORDER BY. The
    numpy GEMM, the JVM fold, and DuckDB reassociate float sums
    differently (~1e-15 relative drift), so ranking raw doubles let two
    k-boundary candidates within 1e-6 of each other select different
    neighbor sets per formulation — observed on the 30-vector test
    fixture. Quantizing collapses such near-ties to an exact id
    tie-break. Residual risk shrinks to raw sims that sit within the
    cross-engine drift of a rounding HALFWAY point (compounded by
    banker's-vs-HALF_UP mode differences exactly there) — a
    boundary-measure event, same accepted class as ``unigram_logprob``'s
    ln() last-ulp note.

    ``id_col`` must be an integral type: the bounded running state is a
    fixed-dtype int64 matrix (strings/decimals would crash or silently
    miscast in the numpy id array, and the output schema is pinned to
    ``long``). Validated up front with a clear error. The int64-max fill
    value in the id matrix is NOT an id sentinel — validity of a slot is
    decided solely by its sim being finite (unfilled slots stay -inf,
    and no real normalized-cosine sim is ever non-finite), so a genuine
    corpus id equal to int64 max cannot collide with it.

    NOTE: the query side MATERIALIZES at plan-build time (it is the
    model, like the IVF centroid collect) — building this plan runs a
    small Spark job over ``queries``.

    ``exclude_label_col``: when set (hard-negative mining), both sides
    must carry that integral column and a candidate is ranked for a
    query only if its label DIFFERS from the query's — same-label pairs
    are masked to -inf inside the batch scorer, so the bounded state and
    the shuffle volume are unchanged (still P×Q×k).
    """
    import pyspark.sql.types as T

    integral = (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
    for side, df in (("queries", queries), ("corpus", corpus)):
        dt = df.schema[id_col].dataType
        if not isinstance(dt, integral):
            raise TypeError(
                f"brute_force_topk_partial requires an integral {id_col!r} "
                f"({side} side has {dt.simpleString()}); use "
                f"brute_force_topk for non-integral ids"
            )
    q_cols = [
        F.col(id_col).alias("qid"),
        as_double_array(vec_col).alias("qv"),
    ]
    if exclude_label_col is not None:
        q_cols.append(F.col(exclude_label_col).cast("long").alias("qlabel"))
    q_rows = (
        queries.filter(_valid_vector(as_double_array(vec_col)))
        .select(*q_cols)
        .collect()
    )
    if not q_rows:
        return corpus.sparkSession.createDataFrame(
            [], "query_id long, neighbor_id long, cos_sim double"
        )
    qlabels = (
        np.array([r["qlabel"] for r in q_rows], dtype=np.int64)
        if exclude_label_col is not None
        else None
    )
    qids = np.array([r["qid"] for r in q_rows], dtype=np.int64)
    Q = np.stack([np.asarray(r["qv"], dtype=np.float64) for r in q_rows])
    qn = np.linalg.norm(Q, axis=1, keepdims=True)
    Q = Q / np.where(qn == 0.0, 1.0, qn)

    def partition_topk(batches):
        # bounded running state: per query, at most k (sim, nid) pairs
        best_sims = np.full((len(qids), k), -np.inf)
        best_nids = np.full((len(qids), k), np.iinfo(np.int64).max)
        seen = False
        for pdf in batches:
            if len(pdf) == 0:
                continue
            seen = True
            nids = pdf["neighbor_id"].to_numpy(dtype=np.int64)
            V = np.stack(pdf["cv"].to_numpy())
            vn = np.linalg.norm(V, axis=1, keepdims=True)
            V = V / np.where(vn == 0.0, 1.0, vn)
            sims = Q @ V.T  # (Q, batch)
            if round_decimals is not None:
                # quantize BEFORE ranking (see determinism note)
                np.round(sims, round_decimals, out=sims)
            sims[qids[:, None] == nids[None, :]] = -np.inf  # self-match
            if qlabels is not None:  # hard negatives: same label is out
                nlabels = pdf["nlabel"].to_numpy(dtype=np.int64)
                sims[qlabels[:, None] == nlabels[None, :]] = -np.inf
            cand_sims = np.concatenate([best_sims, sims], axis=1)
            cand_nids = np.concatenate(
                [best_nids, np.broadcast_to(nids, (len(qids), len(nids)))],
                axis=1,
            )
            # top-k per query by (sim desc, nid asc): lexsort is stable,
            # last key dominates
            order = np.lexsort((cand_nids, -cand_sims), axis=1)[:, :k]
            rows = np.arange(len(qids))[:, None]
            best_sims = cand_sims[rows, order]
            best_nids = cand_nids[rows, order]
        if not seen:
            return
        qcol = np.repeat(qids, k)
        scol = best_sims.ravel()
        ncol = best_nids.ravel()
        keep = np.isfinite(scol)
        yield pd.DataFrame(
            {
                "query_id": qcol[keep],
                "neighbor_id": ncol[keep],
                "cos_sim": scol[keep],
            }
        )

    c_cols = [
        F.col(id_col).alias("neighbor_id"),
        as_double_array(vec_col).alias("cv"),
    ]
    if exclude_label_col is not None:
        c_cols.append(F.col(exclude_label_col).cast("long").alias("nlabel"))
    candidates = corpus.filter(
        _valid_vector(as_double_array(vec_col))
    ).select(*c_cols).mapInPandas(
        partition_topk, "query_id long, neighbor_id long, cos_sim double"
    )
    # candidates arrive pre-quantized from the scorer, so the shared
    # tail's round-before-rank is a no-op repeat — same ordering.
    return _rank_topk(candidates, k, round_decimals)


def random_hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic unit-free hyperplanes (seeded NumPy) compiled into the
    plan as literals — no discovery job, identical across runs."""
    import numpy as np

    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim)).tolist()


def lsh_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-pattern bucket id from ``len(planes)`` hyperplane dot-product
    signs, packed into a long."""
    acc = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        plane = F.array(*[F.lit(float(x)) for x in p])
        bit = F.when(dot(vec, plane) >= 0, F.lit(1)).otherwise(F.lit(0))
        acc = acc + bit.cast("long") * F.lit(1 << i)
    return acc


def lsh_topk(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 5,
    dim: int = 64,
    n_planes: int = 8,
    seed: int = 42,
    round_decimals: int | None = 6,
) -> DataFrame:
    """Approximate top-k: candidates share an LSH sign-bucket with the
    query (key-equality join on bucket id — THE scale path), exact cosine
    rerank within candidates. NULL/zero-norm vectors are excluded on both
    sides (``_valid_vector`` — r6 session-3 review: an admitted zero-norm
    vector normalizes to NaN, lands in bucket 0 via all-zero sign bits,
    and its NaN sim ranks ABOVE every real similarity)."""
    planes = random_hyperplanes(dim, n_planes, seed)
    q = queries.filter(_valid_vector(as_double_array(vec_col))).select(
        F.col(id_col).alias("query_id"),
        unit_normalize(as_double_array(vec_col)).alias("qv"),
    ).withColumn("bucket", lsh_bucket(F.col("qv"), planes))
    c = corpus.filter(_valid_vector(as_double_array(vec_col))).select(
        F.col(id_col).alias("neighbor_id"),
        unit_normalize(as_double_array(vec_col)).alias("cv"),
    ).withColumn("bucket", lsh_bucket(F.col("cv"), planes))
    scored = (
        c.join(F.broadcast(q), on="bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            dot(F.col("qv"), F.col("cv")).alias("cos_sim"),
        )
    )
    return _rank_topk(scored, k, round_decimals)


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    centroids: list[list[float]],
    k: int = 5,
    n_probe: int = 2,
    round_decimals: int | None = 6,
) -> DataFrame:
    """IVF-style ANN: assign corpus vectors to their nearest centroid
    (coarse quantizer), probe the ``n_probe`` nearest centroid cells per
    query, exact rerank within probed cells.

    ``centroids`` are plan literals (train offline / sample — at scale this
    is a tiny broadcast model, not a job). NULL/zero-norm vectors are
    excluded on both sides (``_valid_vector`` — r6 session-3 review: a
    NULL embedding crashed ``np.stack`` inside the assignment UDF and a
    zero-norm vector's NaN sim out-ranked every real neighbor)."""
    from pyspark.sql.functions import pandas_udf

    # unit-normalize centroids driver-side; vector norms never change the
    # argmax over unit centroids, so cell assignment needs no row norms
    C = np.asarray(centroids, dtype=np.float64)
    nrm = np.linalg.norm(C, axis=1, keepdims=True)
    C = C / np.where(nrm == 0.0, 1.0, nrm)
    n = min(n_probe, len(centroids))

    # Arrow-vectorized assignment: one numpy matmul per batch against the
    # tiny broadcast centroid matrix — orders of magnitude cheaper than a
    # per-centroid interpreted fold expression per row
    @pandas_udf("array<int>")
    def nearest_cells(v: pd.Series) -> pd.Series:
        V = np.stack(v.to_numpy())
        sims = V @ C.T
        # argsort of (-sim, cell): ties break toward the LOWER cell id
        order = np.argsort(-sims, axis=1, kind="stable")[:, :n]
        return pd.Series(list(order.astype(np.int32)))

    c = corpus.filter(_valid_vector(as_double_array(vec_col))).select(
        F.col(id_col).alias("neighbor_id"),
        unit_normalize(as_double_array(vec_col)).alias("cv"),
    ).withColumn("cell", nearest_cells(F.col("cv"))[0])
    q = queries.filter(_valid_vector(as_double_array(vec_col))).select(
        F.col(id_col).alias("query_id"),
        unit_normalize(as_double_array(vec_col)).alias("qv"),
    ).withColumn("cell", F.explode(nearest_cells(F.col("qv"))))
    scored = (
        c.join(F.broadcast(q), on="cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            dot(F.col("qv"), F.col("cv")).alias("cos_sim"),
        )
    )
    deduped = scored.groupBy("query_id", "neighbor_id").agg(
        F.first("cos_sim").alias("cos_sim")
    )
    return _rank_topk(deduped, k, round_decimals)


def cosine_dup_pairs_blocked(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float,
    n_blocks: int = 8,
    round_decimals: int | None = 6,
) -> DataFrame:
    """Exact all-pairs cosine ≥ threshold via BLOCKED matrix products.

    The scalable exact form: vectors are hashed into ``n_blocks`` blocks;
    each of the ``B(B+1)/2`` unordered block pairs becomes one group whose
    members are shipped (Arrow) to a worker that computes the block-pair's
    similarity matrix with one vectorized matmul. Work is O(n²·d) either
    way, but each pair costs a fused numpy flop instead of a codegen'd
    array fold, and parallelism = block pairs. Output ≡
    :func:`cosine_dup_pairs` (both forms exclude NULL/zero-norm vectors
    via ``_valid_vector`` — without the shared filter the two diverge:
    Spark's ``NaN >= t`` predicate is TRUE while numpy's is False).
    """
    from pyspark.sql import types as T

    spark = df.sparkSession
    # raw vectors cross the Arrow boundary; normalization is one vectorized
    # numpy op inside the worker (cheaper than any Catalyst-side form).
    # pmod, not %: Spark % keeps the dividend's sign, so a negative id
    # would get a block with no membership row and silently drop.
    normed = df.filter(_valid_vector(as_double_array(vec_col))).select(
        F.col(id_col).alias("__id"),
        as_double_array(vec_col).alias("__v"),
        F.pmod(F.col(id_col), F.lit(n_blocks)).cast("int").alias("__b"),
    )
    members = []
    for pid, (i, j) in enumerate(
        (i, j) for i in range(n_blocks) for j in range(i, n_blocks)
    ):
        members.append((i, pid, i, j))
        if j != i:
            members.append((j, pid, i, j))
    mdf = spark.createDataFrame(
        members, "__b int, pair_id int, bi int, bj int"
    )
    grouped = normed.join(F.broadcast(mdf), on="__b")

    out_schema = T.StructType(
        [
            T.StructField("id_a", T.LongType()),
            T.StructField("id_b", T.LongType()),
            T.StructField("cos_sim", T.DoubleType()),
        ]
    )

    def block_pair(pdf: pd.DataFrame) -> pd.DataFrame:
        bi, bj = int(pdf["bi"].iloc[0]), int(pdf["bj"].iloc[0])
        ids = pdf["__id"].to_numpy()
        blocks = pdf["__b"].to_numpy()
        V = np.stack(pdf["__v"].to_numpy())
        nrm = np.linalg.norm(V, axis=1, keepdims=True)
        V = V / np.where(nrm == 0.0, 1.0, nrm)
        S = V @ V.T
        # mask-then-gather (r7): filter ON the similarity matrix and only
        # gather the qualifying pairs. The former triu_indices form built
        # two n²/2 int64 index arrays plus full-size id/swap/sims
        # temporaries (~10 n²-scale allocations — 5 GB at n=8k blocks)
        # before dropping ~all pairs; the boolean mask costs n² bytes and
        # everything after it is |survivors|-sized. Survivor order is
        # row-major either way, so output is byte-identical.
        M = S >= threshold
        if bi != bj:  # cross-block group: within-block pairs belong to the
            M &= blocks[:, None] != blocks[None, :]  # (i,i)/(j,j) groups
        ia, ib = np.triu(M, k=1).nonzero()
        id_a, id_b = ids[ia], ids[ib]
        swap = id_a > id_b
        id_a2 = np.where(swap, id_b, id_a)
        id_b2 = np.where(swap, id_a, id_b)
        return pd.DataFrame(
            {"id_a": id_a2, "id_b": id_b2, "cos_sim": S[ia, ib]}
        )

    pairs = grouped.groupBy("pair_id").applyInPandas(block_pair, out_schema)
    if round_decimals is not None:
        pairs = pairs.select(
            "id_a", "id_b", F.round("cos_sim", round_decimals).alias("cos_sim")
        )
    return pairs


def cosine_dup_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float,
    round_decimals: int | None = 6,
) -> DataFrame:
    """Embedding near-duplicate pairs: all (a<b) with cosine ≥ threshold.
    Exact pairwise form (small-scale / oracle-checkable); swap candidate
    generation for :func:`lsh_bucket` equality at scale. NULL/zero-norm
    vectors are excluded (``_valid_vector``) — their NaN sims would pass
    Spark's ``>= t`` predicate (NaN sorts above +inf) while every other
    formulation rejects them."""
    normed = df.filter(_valid_vector(as_double_array(vec_col))).select(
        F.col(id_col).alias("__id"),
        unit_normalize(as_double_array(vec_col)).alias("__v"),
    )
    a = normed.select(F.col("__id").alias("id_a"), F.col("__v").alias("va"))
    b = normed.select(F.col("__id").alias("id_b"), F.col("__v").alias("vb"))
    pairs = a.join(b, F.col("id_a") < F.col("id_b")).select(
        "id_a", "id_b", dot(F.col("va"), F.col("vb")).alias("cos_sim")
    )
    out = pairs.filter(F.col("cos_sim") >= F.lit(threshold))
    if round_decimals is not None:
        out = out.select(
            "id_a", "id_b", F.round("cos_sim", round_decimals).alias("cos_sim")
        )
    return out


def semdedup_flags(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    centroids: list[list[float]],
    threshold: float,
    round_decimals: int | None = 6,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic dedup by
    clustering embeddings with a coarse quantizer and dropping, inside each
    cluster, every vector that has a lower-id cluster-mate above the cosine
    threshold. Returns one row per input: ``(id, cell, kept, dup_of,
    max_cos)`` — ``dup_of`` is the smallest-id duplicate witness.

    Scale posture: pairwise comparison happens only WITHIN a cluster —
    each cell ships once (Arrow) to a worker that computes the cluster's
    similarity matrix with one vectorized matmul AND reduces it to
    per-victim (dup_of, max_cos) rows in place, so nothing pair-shaped is
    ever shuffled. That is the published algorithm's cost model; the
    centroid model is a tiny broadcast literal. Ties in the assignment
    argmax break toward the lower cell id, matching the SQL oracle twin.
    For pathologically large single cells, sub-shard with the block
    pattern of :func:`cosine_dup_pairs_blocked`."""
    from pyspark.sql import types as T
    from pyspark.sql.functions import pandas_udf

    C = np.asarray(centroids, dtype=np.float64)
    nrm = np.linalg.norm(C, axis=1, keepdims=True)
    C = C / np.where(nrm == 0.0, 1.0, nrm)

    @pandas_udf("int")
    def nearest_cell(v: pd.Series) -> pd.Series:
        V = np.stack(v.to_numpy())
        # np.argmax returns the FIRST maximum: lower cell id wins ties
        return pd.Series(np.argmax(V @ C.T, axis=1).astype(np.int32))

    assigned = df.select(
        F.col(id_col).alias("__id"),
        unit_normalize(as_double_array(vec_col)).alias("__v"),
    ).withColumn("cell", nearest_cell(F.col("__v")))

    drops_schema = T.StructType(
        [
            T.StructField("id_b", T.LongType()),
            T.StructField("dup_of", T.LongType()),
            T.StructField("max_cos", T.DoubleType()),
        ]
    )

    def cell_drops(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) < 2:
            return pd.DataFrame(
                {"id_b": [], "dup_of": [], "max_cos": []}
            ).astype({"id_b": "int64", "dup_of": "int64", "max_cos": "float64"})
        order = np.argsort(pdf["__id"].to_numpy())
        ids = pdf["__id"].to_numpy()[order]
        V = np.stack(pdf["__v"].to_numpy())[order]
        S = V @ V.T
        hit = np.triu(S >= threshold, k=1)  # row i < col j in id order
        victims = np.where(hit.any(axis=0))[0]
        # first True down each victim column = the smallest-id witness
        dup_of = ids[hit[:, victims].argmax(axis=0)]
        max_cos = np.where(hit, S, -np.inf)[:, victims].max(axis=0)
        return pd.DataFrame(
            {"id_b": ids[victims], "dup_of": dup_of, "max_cos": max_cos}
        )

    drops = assigned.groupBy("cell").applyInPandas(cell_drops, drops_schema)
    out = assigned.select("__id", "cell").join(
        drops, assigned["__id"] == drops["id_b"], "left"
    )
    max_cos = (
        F.round("max_cos", round_decimals)
        if round_decimals is not None
        else F.col("max_cos")
    )
    return out.select(
        F.col("__id").alias("vec_id"),
        F.col("cell").cast("int").alias("cell"),
        F.col("dup_of").isNull().alias("kept"),
        "dup_of",
        max_cos.alias("max_cos"),
    )


# ---------------------------------------------------------------------------
# Product quantization (PQ, Jégou/Douze/Schmid 2011, "Product
# Quantization for Nearest Neighbor Search") — the compression half of
# IVF-PQ. Each vector
# is coded as M subvector centroid ids (here 8 × 4-bit ≈ 8 bytes for
# d=64 float32 ≈ 32× compression): the regime where a 100 TB raw corpus
# becomes a few TB of codes that fit cluster RAM. Query scoring is ADC
# (asymmetric distance computation): per query, a LUT of
# squared-L2(query subvector, centroid) per (subvector, centroid); a
# coded vector's approximate distance is the sum of M table lookups —
# no float math against the corpus at all.
# ---------------------------------------------------------------------------

def sq_l2_cols(a: Column, b: Column) -> Column:
    """Σ (aᵢ−bᵢ)² — left-to-right fold (deterministic order, replayed
    identically by DuckDB ``list_reduce`` in the oracle)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def sq_l2(sub: Column, centroid: list[float]) -> Column:
    return sq_l2_cols(sub, F.array(*[F.lit(float(c)) for c in centroid]))


def pq_codebooks(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    m: int = 8,
    ksub: int = 16,
    sample_mod: int = 29,
) -> list[list[list[float]]]:
    """Deterministic PQ codebook: centroid *k* of subquantizer *mm* is the
    *mm*-th subvector of the *k*-th sampled corpus row (``id % sample_mod
    == 0``, ordered, first ``ksub``) — the k-means random-sample init. A
    real deployment trains the codebooks offline; either way the model is
    a ksub×d broadcast literal the SQL twin can replay from the table
    (same contract as ``_ivf_centroids``). Returns
    ``codebooks[mm][k] = list[d/m floats]``."""
    rows = (
        corpus.filter(F.col(id_col) % sample_mod == 0)
        .orderBy(id_col)
        .limit(ksub)
        .select(as_double_array(vec_col).alias("v"))
        .collect()
    )
    if len(rows) < ksub:
        raise ValueError(
            f"PQ sample too small: {len(rows)} rows < ksub={ksub}"
        )
    d = len(rows[0]["v"])
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    dsub = d // m
    return [
        [[float(x) for x in r["v"][mm * dsub : (mm + 1) * dsub]] for r in rows]
        for mm in range(m)
    ]


def pq_encode(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    codebooks: list[list[list[float]]],
) -> DataFrame:
    """(id, codes: array<int> of length M) — the stored representation.
    Two narrow projections over the scan (distances, then argmin — the
    split keeps each distance array evaluated ONCE; ``array_min`` +
    ``array_position`` over an inline array would compute it twice); the
    raw vectors never shuffle. Ties → lowest centroid id via
    ``array_position`` first-match; the oracle's ``ORDER BY d, cid``
    breaks identically."""
    dsub = len(codebooks[0][0])
    vd = as_double_array(vec_col)
    dist_stage = df.filter(vd.isNotNull()).select(
        F.col(id_col),
        *[
            F.array(
                *[sq_l2(F.slice(vd, mm * dsub + 1, dsub), c) for c in cents]
            ).alias(f"__d{mm}")
            for mm, cents in enumerate(codebooks)
        ],
    )
    codes = [
        (
            F.array_position(
                F.col(f"__d{mm}"), F.array_min(F.col(f"__d{mm}"))
            )
            - 1
        ).cast("int")
        for mm in range(len(codebooks))
    ]
    return dist_stage.select(F.col(id_col), F.array(*codes).alias("codes"))


def pq_adc_topk(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    codebooks: list[list[list[float]]],
    k: int = 5,
    shortlist: int | None = None,
) -> DataFrame:
    """ADC top-k over PQ codes, optionally with exact rerank. The query
    side carries per-subquantizer LUTs quantized to integer micro-units
    (``round(d·1e6)``) so the ADC score is an exact integer sum —
    order-independent and bit-identical cross-engine. The corpus side is
    its coded form only: scoring a vector is M array lookups + integer
    adds, no float ops against raw vectors.

    ``shortlist=L`` enables the production FAISS-style refine stage: ADC
    ranks an L-candidate shortlist per query, then EXACT squared-L2 over
    raw vectors reranks only those Q×L rows to the final top-k (the raw
    corpus is touched via an id semi-join, never scanned against every
    query). On isotropic/no-structure embeddings the pure ADC ordering
    is noisy (quantization error ~ signal); the rerank recovers
    high recall at Q×L exact-scoring cost — see tests for the pinned
    recall floor.

    Scale posture: queries (serving batch) broadcast with their LUTs;
    the code table streams through one projection + per-query top-k. At
    corpus scales where the Q×N scored set matters, compose with IVF
    routing (``ivf_topk``'s cell assignment) so ADC scans only probed
    cells — the standard IVF-PQ layout — or apply the
    ``brute_force_topk_partial`` bounded-state pattern to the code scan.
    Output: (query_id, neighbor_id, adc_e6) ascending, or with
    ``shortlist`` (query_id, neighbor_id, l2_e6) — exact integer
    micro-unit squared L2."""
    coded = pq_encode(corpus, id_col, vec_col, codebooks).select(
        F.col(id_col).alias("neighbor_id"), "codes"
    )
    qd = as_double_array(vec_col)
    dsub = len(codebooks[0][0])
    luts = [
        F.array(
            *[
                F.round(sq_l2(F.slice(qd, mm * dsub + 1, dsub), c) * 1e6)
                .cast("long")
                for c in cents
            ]
        ).alias(f"lut_{mm}")
        for mm, cents in enumerate(codebooks)
    ]
    q = queries.filter(qd.isNotNull()).select(
        F.col(id_col).alias("query_id"), *luts
    )
    adc = None
    for mm in range(len(codebooks)):
        term = F.element_at(
            F.col(f"lut_{mm}"), F.element_at(F.col("codes"), mm + 1) + 1
        )
        adc = term if adc is None else adc + term
    scored = (
        coded.crossJoin(F.broadcast(q))
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", adc.alias("adc_e6"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc_e6").asc(), F.col("neighbor_id")
    )
    if shortlist is None:
        return (
            scored.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= k)
            .select("query_id", "neighbor_id", "adc_e6")
        )
    short = (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= shortlist)
        .select("query_id", "neighbor_id")
    )
    return _pq_exact_rerank(short, queries, corpus, id_col, vec_col, k)


def _pq_exact_rerank(
    short: DataFrame,
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    k: int,
) -> DataFrame:
    """FAISS-style refine: exact squared-L2 (Catalyst fold — bit-identical
    to the oracle's ``list_reduce``) over ONLY the (query_id, neighbor_id)
    shortlist rows, micro-unit-quantized to an exact integer, final
    per-query top-k."""
    cvecs = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        as_double_array(vec_col).alias("cv"),
    )
    qvecs = queries.select(
        F.col(id_col).alias("query_id"), as_double_array(vec_col).alias("qv")
    )
    rer = (
        short.join(cvecs, "neighbor_id")
        .join(F.broadcast(qvecs), "query_id")
        .select(
            "query_id",
            "neighbor_id",
            F.round(sq_l2_cols(F.col("qv"), F.col("cv")) * 1e6)
            .cast("long")
            .alias("l2_e6"),
        )
    )
    w2 = Window.partitionBy("query_id").orderBy(
        F.col("l2_e6").asc(), F.col("neighbor_id")
    )
    return (
        rer.withColumn("rn", F.row_number().over(w2))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "l2_e6")
    )


def pq_adc_topk_partial(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    codebooks: list[list[list[float]]],
    k: int = 5,
    shortlist: int = 100,
    coarse_centroids: list[list[float]] | None = None,
    n_probe: int = 2,
) -> DataFrame:
    """The at-scale PQ serving plan — same results as
    ``pq_adc_topk(..., shortlist=L)``, different physical shape (the
    ``brute_force_topk_partial`` pattern applied to the ADC scan).

    The Catalyst formulation evaluates M×K fold expressions per corpus
    row interpreted (higher-order functions are codegen fallback, and the
    unrolled form overflows janino's 64 KB method limit) and shuffles the
    Q×N ADC-scored rows into the shortlist window. Here the query batch
    collects into an integer LUT model (Q×M×K micro-unit distances,
    HALF_UP-quantized with ``decimal`` to match Spark/DuckDB ``round``
    exactly), each corpus partition encodes + ADC-scores its rows with
    vectorized numpy and keeps a bounded per-query top-L (O(Q×L) state),
    and only P×Q×L candidate rows reach the global shortlist window. The
    exact rerank then touches only Q×L raw-vector rows.

    Every membership decision is integer-based (ADC sums, micro-unit
    rerank), and the underlying doubles are bit-identical to the
    oracle's: subvector distances sum with an explicit left-associated
    loop (never ``np.sum``, whose pairwise reassociation above 8
    elements would drift the last ulp), and IEEE
    ``0.0 + t == t`` makes the oracle's fold-from-zero equal to the
    left-associated sum. argmin ties break to the lowest centroid id on
    both sides (numpy first-min / ``ORDER BY d, cid``).

    ``coarse_centroids`` turns the scan into full IVF-PQ (the standard
    FAISS inverted-list layout): every corpus row is assigned to its
    nearest coarse cell (squared L2 — metric-consistent with the PQ
    refine, unlike the cosine router of ``ivf_topk``), each query probes
    its ``n_probe`` nearest cells, and ADC scores only rows whose cell
    is probed — the bounded state and shuffle volume are unchanged, the
    scan just skips (1 − n_probe/|cells|) of the corpus per query. On
    structureless data the routing loses recall in proportion to the
    unprobed mass (the brief's isotropic corpus is the worst case); on
    clustered corpora the router captures the structure.
    """
    import decimal

    import pyspark.sql.types as T

    integral = (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
    for side, df in (("queries", queries), ("corpus", corpus)):
        dt = df.schema[id_col].dataType
        if not isinstance(dt, integral):
            raise TypeError(
                f"pq_adc_topk_partial requires an integral {id_col!r} "
                f"({side} side has {dt.simpleString()})"
            )
    mM = len(codebooks)
    dsub = len(codebooks[0][0])
    ksub = len(codebooks[0])
    CB = np.array(codebooks, dtype=np.float64)  # (M, K, dsub)

    def _left_sum(t: np.ndarray) -> np.ndarray:
        acc = t[..., 0]
        for j in range(1, t.shape[-1]):
            acc = acc + t[..., j]
        return acc

    q_rows = (
        queries.filter(as_double_array(vec_col).isNotNull())
        .select(
            F.col(id_col).alias("qid"), as_double_array(vec_col).alias("qv")
        )
        .collect()
    )
    if not q_rows:
        return corpus.sparkSession.createDataFrame(
            [], "query_id long, neighbor_id long, l2_e6 long"
        )
    qids = np.array([r["qid"] for r in q_rows], dtype=np.int64)
    Qv = np.stack([np.asarray(r["qv"], dtype=np.float64) for r in q_rows])
    lut = np.empty((len(qids), mM, ksub), dtype=np.int64)
    one = decimal.Decimal(1)
    for m in range(mM):
        d = _left_sum(
            (Qv[:, None, m * dsub : (m + 1) * dsub] - CB[m][None]) ** 2
        )
        for qi in range(d.shape[0]):
            for ki in range(d.shape[1]):
                # d*1e6 in double FIRST (what Spark's round(col*1e6) sees),
                # then decimal HALF_UP on that exact binary value
                lut[qi, m, ki] = int(
                    decimal.Decimal(float(d[qi, ki]) * 1e6).quantize(
                        one, rounding=decimal.ROUND_HALF_UP
                    )
                )
    sentinel = np.iinfo(np.int64).max  # adc ≤ M × max(lut) ≪ 2^63
    if coarse_centroids is not None:
        CC = np.array(coarse_centroids, dtype=np.float64)  # (cells, d)
        # per-query probe cells: n_probe nearest by squared L2; stable
        # argsort → ties to the lowest cell id (oracle: ORDER BY d, cell)
        qcd = _left_sum((Qv[:, None, :] - CC[None]) ** 2)
        probes = np.argsort(qcd, axis=1, kind="stable")[:, :n_probe]
    else:
        CC = probes = None

    def partition_scan(batches):
        best_adc = np.full((len(qids), shortlist), sentinel, dtype=np.int64)
        best_nids = np.full((len(qids), shortlist), sentinel, dtype=np.int64)
        seen = False
        for pdf in batches:
            if len(pdf) == 0:
                continue
            seen = True
            nids = pdf["neighbor_id"].to_numpy(dtype=np.int64)
            V = np.stack(pdf["cv"].to_numpy())
            adc = np.zeros((len(qids), len(nids)), dtype=np.int64)
            for m in range(mM):
                d = _left_sum(
                    (V[:, None, m * dsub : (m + 1) * dsub] - CB[m][None]) ** 2
                )
                codes_m = d.argmin(axis=1)  # first min → lowest cid
                adc += lut[:, m, :][:, codes_m]
            if CC is not None:
                # IVF routing: mask rows whose cell no query probed is
                # handled per query — (Q, batch) probe-membership mask
                cells = _left_sum((V[:, None, :] - CC[None]) ** 2).argmin(
                    axis=1
                )
                probed = (
                    cells[None, :, None] == probes[:, None, :]
                ).any(axis=2)
                adc[~probed] = sentinel
            adc[qids[:, None] == nids[None, :]] = sentinel  # self-match
            cand_adc = np.concatenate([best_adc, adc], axis=1)
            cand_nids = np.concatenate(
                [best_nids, np.broadcast_to(nids, (len(qids), len(nids)))],
                axis=1,
            )
            order = np.lexsort((cand_nids, cand_adc), axis=1)[:, :shortlist]
            rows = np.arange(len(qids))[:, None]
            best_adc = cand_adc[rows, order]
            best_nids = cand_nids[rows, order]
        if not seen:
            return
        qcol = np.repeat(qids, shortlist)
        acol = best_adc.ravel()
        ncol = best_nids.ravel()
        keep = acol != sentinel
        yield pd.DataFrame(
            {
                "query_id": qcol[keep],
                "neighbor_id": ncol[keep],
                "adc_e6": acol[keep],
            }
        )

    candidates = (
        corpus.filter(as_double_array(vec_col).isNotNull())
        .select(
            F.col(id_col).alias("neighbor_id"),
            as_double_array(vec_col).alias("cv"),
        )
        .mapInPandas(
            partition_scan, "query_id long, neighbor_id long, adc_e6 long"
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc_e6").asc(), F.col("neighbor_id")
    )
    short = (
        candidates.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= shortlist)
        .select("query_id", "neighbor_id")
    )
    return _pq_exact_rerank(short, queries, corpus, id_col, vec_col, k)
