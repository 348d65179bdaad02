"""Dataset-assembly workload on ``documents`` (extension operators:
deterministic stratified sampling, token-budget sequence packing).

Training-data pipelines need reproducible subsampling (re-balance
languages/sources across pipeline re-runs without coordinating random
state) and sequence assembly (group documents into fixed token budgets).
Both are pure Catalyst plans with exact DuckDB twins.

Determinism strategy for sampling: no ``rand()`` anywhere — the keep
decision is ``md5(doc_id)`` hex-prefix compared against a per-stratum
threshold string. md5 is bit-identical across engines, so the oracle
reproduces the exact sample; at cluster scale the filter is embarrassingly
parallel, shuffle-free, and stable under repartitioning (unlike
``F.rand``, whose stream depends on partition layout).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from feature_generation_benchmark_spark.functions.textfns import (
    md5_prefix_long,
    token_count,
    token_windows,
)
from feature_generation_benchmark_spark.sources.testdata import load_table
from feature_generation_benchmark_spark.workloads import QueryDef

#: Per-language sampling rates (16ths — exactly representable as a 4-hex-digit
#: threshold on the md5 key space, so Spark and the oracle agree bit-for-bit).
SAMPLE_RATES: dict[str, float] = {
    "en": 0.5,
    "de": 0.25,
    "es": 0.25,
    "fr": 0.25,
    "zh": 0.125,
}


def _hex_threshold(rate: float) -> str:
    """Rate → 4-hex-digit cutoff: keep iff md5[:4] < cutoff (lexicographic
    compare is correct: fixed-width lowercase hex)."""
    return format(int(rate * 0x10000), "04x")


def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    key = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4)
    cutoff = F.lit(None).cast("string")
    for lang, rate in SAMPLE_RATES.items():
        cutoff = F.when(F.col("lang") == lang, F.lit(_hex_threshold(rate))).otherwise(
            cutoff
        )
    return (
        docs.select("doc_id", "lang", "source", key.alias("sample_key"))
        .where(key < cutoff)
    )


def _sample_oracle() -> str:
    cases = " ".join(
        f"WHEN lang = '{lang}' THEN '{_hex_threshold(rate)}'"
        for lang, rate in SAMPLE_RATES.items()
    )
    return f"""
WITH k AS (
  SELECT doc_id, lang, source,
         substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) AS sample_key,
         CASE {cases} END AS cutoff
  FROM documents
)
SELECT doc_id, lang, source, sample_key FROM k WHERE sample_key < cutoff
"""


#: Token budget per packed sequence (2^11: division by it is exact in
#: double arithmetic, keeping floor() engine-portable).
SEQ_BUDGET = 2048


def sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Assign documents to fixed-token-budget bins per source (greedy
    cumulative chunking in deterministic ``doc_id`` order), then summarize
    each packed sequence. The per-source window is one shuffle + sort; at
    100 TB you would sub-shard the partition key (source, doc_id bucket) so
    no single source serializes through one task — the bin ids stay
    deterministic because the running sum is order-defined either way."""
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select(
        "source", "doc_id", token_count("text").cast("long").alias("n_tokens")
    )
    w = Window.partitionBy("source").orderBy("doc_id")
    cum = F.sum("n_tokens").over(w)
    seq = F.floor((cum - F.col("n_tokens")) / F.lit(SEQ_BUDGET))
    return (
        t.select("source", "doc_id", "n_tokens", seq.alias("seq_id"))
        .groupBy("source", "seq_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("seq_tokens"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
    )


_PACKING_ORACLE = f"""
WITH t AS (
  SELECT source, doc_id,
    CAST(len(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                         x -> x <> '')) AS BIGINT) AS n_tokens
  FROM documents
),
b AS (
  SELECT source, doc_id, n_tokens,
    CAST(floor((SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id)
                - n_tokens) / {SEQ_BUDGET}.0) AS BIGINT) AS seq_id
  FROM t
)
SELECT source, seq_id, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS seq_tokens,
       min(doc_id) AS first_doc, max(doc_id) AS last_doc
FROM b GROUP BY source, seq_id
"""


# --------------------------------------------------------------------------
# doc_chunking — overlapping token-window chunks (LLM training-data prep)
# --------------------------------------------------------------------------

_CHUNK_TOKENS = 64
_CHUNK_OVERLAP = 16
_CHUNK_STEP = _CHUNK_TOKENS - _CHUNK_OVERLAP


def doc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split each document into overlapping ``_CHUNK_TOKENS``-token windows
    with stride ``_CHUNK_STEP`` — the standard sliding-window chunking step
    of an LLM pretraining pipeline.

    Entirely JVM-side: tokenize once, then ``sequence`` (chunk starts) →
    ``transform``+``slice`` (windows) → ``explode``. No shuffle at all —
    a pure per-row flatMap that scales embarrassingly; the token array is
    materialized in its own projection BEFORE the lambda so the HOF does
    not re-tokenize per chunk (interpreted HOFs have no subexpression
    elimination)."""
    from feature_generation_benchmark_spark.functions.textfns import tokens

    docs = load_table(spark, sf_dir, "documents")
    toked = docs.select(
        "doc_id", tokens(F.col("text")).alias("__toks")
    ).filter(F.size("__toks") > 0)
    chunked = toked.select(
        "doc_id",
        F.explode(
            token_windows(F.col("__toks"), _CHUNK_TOKENS, _CHUNK_STEP)
        ).alias("c"),
    )
    return chunked.select(
        "doc_id",
        F.col("c.chunk_idx").alias("chunk_idx"),
        F.size("c.window").cast("long").alias("n_chunk_tokens"),
        F.array_join("c.window", " ").alias("chunk_text"),
    )


_CHUNK_ORACLE = f"""
WITH toked AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                     x -> x <> '') AS toks
  FROM documents
), nz AS (
  SELECT doc_id, toks, len(toks) AS n FROM toked WHERE len(toks) > 0
), starts AS (
  -- emit a window only while it ADDS uncovered tokens (the
  -- token_windows bound): start <= min(n-1, n - (width - step + 1))
  SELECT doc_id, toks,
         unnest(generate_series(
           0,
           greatest(0, least(n - 1,
                             n - {_CHUNK_TOKENS - _CHUNK_STEP + 1})),
           {_CHUNK_STEP})) AS s
  FROM nz
)
SELECT doc_id,
  CAST(s / {_CHUNK_STEP} AS BIGINT) AS chunk_idx,
  CAST(len(toks[s + 1 : s + {_CHUNK_TOKENS}]) AS BIGINT) AS n_chunk_tokens,
  array_to_string(toks[s + 1 : s + {_CHUNK_TOKENS}], ' ') AS chunk_text
FROM starts
"""


# ---------------------------------------------------------------------------
# train/val/test split — deterministic hash assignment (r2)
# ---------------------------------------------------------------------------

#: Split boundaries in 16ths of the md5 key space: train 14/16 (87.5%),
#: val 1/16 (6.25%), test 1/16 — exactly representable as hex cutoffs.
_SPLIT_TRAIN_END = "e000"
_SPLIT_VAL_END = "f000"


def dataset_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Assign every document to train/val/test by md5 hash range —
    the reproducible split every training pipeline needs: stable under
    repartitioning, re-runs, and corpus growth (a doc's split never
    changes when other docs are added), shuffle-free, and exactly
    reproduced by any engine that has md5."""
    docs = load_table(spark, sf_dir, "documents")
    key = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4)
    split = (
        F.when(key < _SPLIT_TRAIN_END, F.lit("train"))
        .when(key < _SPLIT_VAL_END, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return docs.select(
        "doc_id", "lang", key.alias("split_key"), split.alias("split")
    )


_SPLIT_ORACLE = f"""
SELECT doc_id, lang,
  substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) AS split_key,
  CASE
    WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < '{_SPLIT_TRAIN_END}'
      THEN 'train'
    WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < '{_SPLIT_VAL_END}'
      THEN 'val'
    ELSE 'test'
  END AS split
FROM documents
"""


QUERIES = [
    QueryDef("doc_chunking", doc_chunking, _CHUNK_ORACLE,
             "overlapping token-window chunking (shuffle-free flatMap)"),
    QueryDef("sample_stratified", sample_stratified, _sample_oracle(),
             "deterministic md5-keyed stratified sampling by language"),
    QueryDef("sequence_packing", sequence_packing, _PACKING_ORACLE,
             "token-budget sequence packing per source (window cumsum)"),
    QueryDef("dataset_split", dataset_split, _SPLIT_ORACLE,
             "deterministic train/val/test hash split"),
]


# --------------------------------------------------------------------------
# content-defined chunking (r3b) — rolling-boundary chunking (the FastCDC/
# rsync primitive): a token ENDS a chunk when its content hash hits the
# divisor, so boundaries depend only on LOCAL content and an edit shifts
# only its own chunk — unlike fixed-stride chunking, where one inserted
# token re-keys every downstream chunk. The property that makes
# chunk-level dedup robust to document edits.
# --------------------------------------------------------------------------

#: Boundary divisor — a token closes a chunk when md5(token) % 16 == 0,
#: giving ~16-token expected chunks.
_CDC_DIVISOR = 16


def cdc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined chunks per document: (doc_id, chunk_idx,
    n_chunk_tokens, chunk_md5).

    Plan: posexplode tokens (shuffle-free flatMap) → boundary flag from
    the token's own md5 → chunk id as an exclusive prefix sum over ONE
    doc-keyed window → per-(doc, chunk) fold. Both shuffles are keyed by
    doc_id (high cardinality, bounded per-doc row counts), and the chunk
    id needs no iterative pass — the prefix sum IS the assignment."""
    from feature_generation_benchmark_spark.functions.textfns import tokens

    # chunk assignment is strictly PER-DOCUMENT state (an exclusive
    # prefix sum over the doc's own boundary flags), so the whole
    # program runs as array expressions inside the scan with a final
    # shuffle-free explode of the finished chunks (r7, guide §2.4): the
    # previous form posexploded every token, paid a doc-keyed window
    # shuffle for the prefix sum and a second doc-keyed groupBy shuffle
    # (collect_list + re-sort) to fold the chunks back together — two
    # exchanges of the exploded corpus for zero cross-document state.
    # Equivalence: a boundary token at position p starts a new chunk at
    # p+1 (the old [unboundedPreceding, -1] frame), so chunk starts are
    # 0 plus every p+1 <= n-1 with flag(p)=1; each chunk's tokens are
    # the slice [start, next_start) and the md5 joins them with ' '
    # exactly as the old pos-sorted collect_list did. Empty-token docs
    # emitted no rows before and are filtered the same way here.
    docs = load_table(spark, sf_dir, "documents")
    toked = docs.select(
        "doc_id", tokens("text").alias("__toks")
    ).filter(F.size("__toks") > 0)
    # same hash-to-integer idiom as md5_prefix_long, inlined as SQL text
    # for the array lambda
    flag = (
        "CAST(conv(substring(md5(element_at(__toks, p + 1)), 1, 8), "
        f"16, 10) AS BIGINT) % {_CDC_DIVISOR} = 0"
    )
    started = toked.select(
        "doc_id",
        "__toks",
        # CASE guard: sequence(0, -1) would descend for 1-token docs
        F.expr(
            "CASE WHEN size(__toks) >= 2 THEN "
            "concat(array(0), transform("
            f"filter(sequence(0, size(__toks) - 2), p -> {flag}), "
            "p -> p + 1)) "
            "ELSE array(0) END"
        ).alias("__starts"),
    )
    chunks = started.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(__starts, (s, i) -> named_struct("
                "'chunk_idx', CAST(i AS BIGINT), "
                "'n_chunk_tokens', "
                "CAST(coalesce(get(__starts, i + 1), size(__toks)) - s"
                " AS BIGINT), "
                "'chunk_md5', md5(array_join(slice(__toks, s + 1, "
                "coalesce(get(__starts, i + 1), size(__toks)) - s), ' '))"
                "))"
            )
        ).alias("c"),
    )
    return chunks.select(
        "doc_id", "c.chunk_idx", "c.n_chunk_tokens", "c.chunk_md5"
    )


_CDC_ORACLE = f"""
WITH toked AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                     x -> x <> '') AS toks
  FROM documents
),
tok AS (
  SELECT doc_id,
         generate_subscripts(toks, 1) - 1 AS pos,
         unnest(toks) AS token
  FROM toked
),
flagged AS (
  SELECT doc_id, pos, token,
         CASE WHEN CAST(('0x' || substr(md5(token), 1, 8)) AS BIGINT)
                   % {_CDC_DIVISOR} = 0 THEN 1 ELSE 0 END AS b
  FROM tok
),
chunked AS (
  SELECT doc_id, pos, token,
         CAST(coalesce(sum(b) OVER (
           PARTITION BY doc_id ORDER BY pos
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         AS BIGINT) AS chunk_idx
  FROM flagged
)
SELECT doc_id, chunk_idx,
  CAST(count(*) AS BIGINT) AS n_chunk_tokens,
  md5(string_agg(token, ' ' ORDER BY pos)) AS chunk_md5
FROM chunked GROUP BY doc_id, chunk_idx
"""

QUERIES.append(
    QueryDef(
        "cdc_chunking",
        cdc_chunking,
        _CDC_ORACLE,
        "content-defined (rolling-boundary) chunking — edit-stable chunk "
        "identities for chunk-level dedup",
    )
)


# --------------------------------------------------------------------------
# weighted sampling without replacement (r4c) — Efraimidis & Spirakis'
# exponential-race scheme ("Weighted random sampling with a reservoir",
# IPL 2006) made deterministic: the uniform comes from the md5 key space
# (the module's no-rand() convention), so the "random" sample is
# reproducible on any engine and stable under repartitioning. Used for
# weighted corpus subsampling (pick k docs/users per stratum
# proportionally to a quality/size weight).
# --------------------------------------------------------------------------

_WS_K = 10  # customers kept per market segment
_WS_SALT = 16  # first-level top-k fan-out (skew control)


def weighted_sample_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-segment weighted sample of ``_WS_K`` customers, weight =
    lifetime order revenue (A-ES: keep the k largest ``u^(1/w)``, i.e.
    the k largest ``ln(u)/w``).

    Determinism: u = (md5_32(custkey) + 0.5) / 2^32 — exact dyadic
    doubles; ln(u) is micro-quantized to an exact int (the micro-log
    convention, same accepted rounding-boundary class), and the rank key
    ``lmicro / w`` is ONE IEEE division of exact ints — bit-portable.

    Scale shape: revenue agg is one custkey-combining shuffle; the
    per-segment top-k is TWO-LEVEL — first a (segment, md5-salt) window
    keeps k per salt bucket (|segments|x16 keys, skew-proof), then the
    global per-segment window ranks only |segments|x16xk candidate rows.
    A single 5-partition segment window over every customer (the naive
    plan) would funnel the whole dim table through 5 tasks on engines
    without map-side window pruning; Spark 4 additionally inserts a
    Partial WindowGroupLimit before BOTH exchanges here (plan-guarded),
    so even the shuffled rows are capped at k per (key x map task). The
    oracle collapses to ONE window: per-salt top-k provably preserves
    the per-segment top-k (any global winner wins its own salt bucket
    too).
    """
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("cents"),
    )
    rev = orders.groupBy("o_custkey").agg(F.sum("cents").alias("w"))
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    h = md5_prefix_long(F.col("c_custkey").cast("string"))
    keyed = (
        cust.join(rev, cust.c_custkey == rev.o_custkey)
        .select(
            "c_mktsegment",
            "c_custkey",
            "w",
            F.round(
                F.log((h.cast("double") + F.lit(0.5)) / F.lit(4294967296.0))
                * F.lit(1e6),
                0,
            )
            .cast("long")
            .alias("lmicro"),
            (h % F.lit(_WS_SALT)).alias("salt"),
        )
        .withColumn("es_key", F.col("lmicro") / F.col("w"))
    )
    w1 = Window.partitionBy("c_mktsegment", "salt").orderBy(
        F.col("es_key").desc(), F.col("c_custkey")
    )
    cand = keyed.withColumn("rn1", F.row_number().over(w1)).filter(
        F.col("rn1") <= _WS_K
    )
    w2 = Window.partitionBy("c_mktsegment").orderBy(
        F.col("es_key").desc(), F.col("c_custkey")
    )
    return (
        cand.withColumn("rn", F.row_number().over(w2))
        .filter(F.col("rn") <= _WS_K)
        .select(
            "c_mktsegment",
            "c_custkey",
            F.col("w").alias("revenue_cents"),
            "rn",
        )
    )


_WS_ORACLE = f"""
WITH rev AS (
  SELECT o_custkey, CAST(sum(round(o_totalprice * 100, 0)) AS BIGINT) AS w
  FROM orders GROUP BY o_custkey
),
keyed AS (
  SELECT c_mktsegment, c_custkey, w,
    CAST(round(ln((CAST(('0x' || substr(md5(CAST(c_custkey AS VARCHAR)), 1, 8))
                        AS BIGINT) + 0.5) / 4294967296.0) * 1e6)
         AS BIGINT) AS lmicro
  FROM customer JOIN rev ON c_custkey = o_custkey
),
ranked AS (
  SELECT c_mktsegment, c_custkey, w,
    row_number() OVER (PARTITION BY c_mktsegment
                       ORDER BY lmicro / w DESC, c_custkey) AS rn
  FROM keyed
)
SELECT c_mktsegment, c_custkey, w AS revenue_cents, CAST(rn AS INTEGER) AS rn
FROM ranked WHERE rn <= {_WS_K}
"""

QUERIES.append(
    QueryDef(
        "weighted_sample_segments",
        weighted_sample_segments,
        _WS_ORACLE,
        "deterministic Efraimidis-Spirakis weighted sampling per segment "
        "(md5 exponential race, salted two-level top-k)",
    )
)
