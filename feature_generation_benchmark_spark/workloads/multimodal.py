"""Multimodal workload — binary-column pipeline on synthesized blobs.

No binary testdata table exists, so the query synthesizes blobs from
``documents.text`` (encode → binary) and runs the full decode-stub →
feature-extraction plumbing. Rows-only driver check (the decode stage is a
deterministic fake — see operators/multimodal.py); ground-truth tests live
in tests/test_multimodal.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from feature_generation_benchmark_spark.operators.multimodal import (
    attach_media_meta,
    extract_media_features,
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
    return extract_media_features(blobs, "doc_id", "blob")


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


QUERIES = [
    QueryDef(
        "multimodal_features",
        multimodal_features,
        None,
        "binary-column decode-stub + feature extraction via mapInPandas",
    ),
    QueryDef(
        "multimodal_resize",
        multimodal_resize,
        None,
        "binary-column resize plumbing (decode stub) via mapInPandas",
    ),
]
