"""Multimodal workload — binary-column pipeline on synthesized blobs.

No binary testdata table exists, so the query synthesizes blobs from
``documents.text`` (encode → binary) and runs the full decode-stub →
feature-extraction plumbing. Because the deterministic fake decoder derives
every output from sha256 of the blob, and DuckDB's ``sha256(VARCHAR)``
hashes the same UTF-8 bytes, BOTH queries carry full value-hash oracles —
the decode-stub pipeline is oracle-checked end-to-end. Driver-facing
outputs project the ``feature_vec`` array to scalars (dim count); the
array stays available on the operator API (``extract_media_features``).
Ground-truth tests live in tests/test_multimodal.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from feature_generation_benchmark_spark.operators.multimodal import (
    attach_media_meta,
    extract_media_features,
    frame_sample_plan,
    resize_media,
)
from feature_generation_benchmark_spark.sources.testdata import load_table
from feature_generation_benchmark_spark.workloads import QueryDef


def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    blobs = docs.select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("blob")
    )
    blobs = attach_media_meta(blobs, "blob", "image", "raw")
    feats = extract_media_features(blobs, "doc_id", "blob")
    # driver-facing projection: arrays don't survive the driver's pandas
    # canonicalizer (sort_values on list cells) — expose the vector's dim
    # and keep the array itself on the operator API
    return feats.select(
        "doc_id",
        "media_type",
        "n_bytes",
        "content_sha256",
        "width",
        "height",
        "n_frames",
        F.size("feature_vec").alias("feature_dim"),
    )


def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    blobs = docs.select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("blob")
    )
    resized = resize_media(blobs, "doc_id", "blob", target_w=32, target_h=32)
    # project blob length, not the blob: value-hash comparability + the
    # "only small features flow onward" shape
    return resized.select(
        "doc_id",
        "width",
        "height",
        F.length("resized").cast("long").alias("resized_bytes"),
    )


# The fake decoder (operators/multimodal.py:_decode_stub) derives width/
# height/n_frames from the first sha256 bytes; DuckDB reproduces the byte
# values from the hex digest via nibble lookup → full value-hash oracle.
_HEXB = (
    "(strpos('0123456789abcdef', substr(hex, {hi}, 1)) - 1) * 16"
    " + (strpos('0123456789abcdef', substr(hex, {lo}, 1)) - 1)"
)

_FEATURES_ORACLE = f"""
WITH h AS (
  SELECT doc_id,
         octet_length(encode(text)) AS n_bytes,
         sha256(text) AS hex
  FROM documents
), b AS (
  SELECT *,
         {_HEXB.format(hi=1, lo=2)} AS b0,
         {_HEXB.format(hi=3, lo=4)} AS b1
  FROM h
)
SELECT doc_id,
  'image' AS media_type,
  CAST(n_bytes AS BIGINT) AS n_bytes,
  hex AS content_sha256,
  CAST(16 + b0 % 240 AS INT) AS width,
  CAST(16 + b1 % 240 AS INT) AS height,
  CAST(1 AS INT) AS n_frames,
  CAST(8 AS INT) AS feature_dim
FROM b
"""

def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    blobs = docs.select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("blob")
    )
    sampled = frame_sample_plan(blobs, "doc_id", "blob", every_n=10)
    # driver-facing projection: scalar digest instead of the feature array
    return sampled.select(
        "doc_id",
        "content_sha256",
        F.col("frame_idx").cast("int").alias("frame_idx"),
    )


# video n_frames = 1 + digest[2] % 64 (operators/multimodal.py::_decode_stub);
# hex chars 5-6 are byte 2 of the sha256 digest; sampled indices are
# 0, 10, 20 … < n_frames, exactly DuckDB's range(0, n, 10)
_FRAME_SAMPLE_ORACLE = f"""
WITH h AS (
  SELECT doc_id, sha256(text) AS hex FROM documents
), b AS (
  SELECT doc_id, hex,
         1 + ({_HEXB.format(hi=5, lo=6)}) % 64 AS n_frames
  FROM h
)
SELECT doc_id, hex AS content_sha256,
       CAST(unnest(range(0, n_frames, 10)) AS INT) AS frame_idx
FROM b
"""


_RESIZE_ORACLE = """
SELECT doc_id,
  CAST(32 AS INT) AS width,
  CAST(32 AS INT) AS height,
  CAST(32 * 32 AS BIGINT) AS resized_bytes
FROM documents
"""

QUERIES = [
    QueryDef(
        "multimodal_features",
        multimodal_features,
        _FEATURES_ORACLE,
        "binary-column decode-stub + feature extraction via mapInPandas",
    ),
    QueryDef(
        "multimodal_resize",
        multimodal_resize,
        _RESIZE_ORACLE,
        "binary-column resize plumbing (decode stub) via mapInPandas",
    ),
    QueryDef(
        "multimodal_frame_sample",
        multimodal_frame_sample,
        _FRAME_SAMPLE_ORACLE,
        "video frame sampling: decode once, explode per-frame indices",
    ),
]
