"""Multimodal plumbing tests — the decode step is a deterministic stub
(no codec libs in this environment); schema, Arrow batching, explode shape
and determinism are the real thing under test."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from feature_generation_benchmark_spark.operators.multimodal import (
    attach_media_meta,
    extract_media_features,
    frame_sample_plan,
    resize_media,
)


@pytest.fixture(scope="module")
def blobs(spark):
    rows = [(i, bytes([i % 251]) * (100 + i * 13)) for i in range(20)]
    return spark.createDataFrame(rows, "doc_id long, blob binary")


def test_attach_meta(spark, blobs):
    df = attach_media_meta(blobs, "blob", "image", "png")
    r = df.filter(F.col("doc_id") == 3).first()
    assert r["blob_meta"]["media_type"] == "image"
    assert r["blob_meta"]["n_bytes"] == 100 + 3 * 13


def test_extract_features_schema_and_determinism(spark, blobs):
    out = extract_media_features(blobs, "doc_id", "blob", batch_limit=7)
    rows = {r["doc_id"]: r for r in out.collect()}
    assert len(rows) == 20
    r = rows[5]
    assert len(r["content_sha256"]) == 64
    assert len(r["feature_vec"]) == 8
    assert 16 <= r["width"] <= 255 and 16 <= r["height"] <= 255
    assert r["n_frames"] == 1  # images are single-frame
    # re-run → identical (derived from content hash only)
    rows2 = {r["doc_id"]: r for r in
             extract_media_features(blobs, "doc_id", "blob").collect()}
    assert rows2[5] == r


def test_real_decoder_unimplemented_for_codec_formats(spark, blobs):
    """decoder="real" decodes the library-free formats (BMP/PPM, see
    test_multimodal_real_codec.py); arbitrary non-image bytes must still
    raise the documented NotImplementedError at the plug-PIL point."""
    out = extract_media_features(blobs, "doc_id", "blob", decoder="real")
    with pytest.raises(Exception) as e:
        out.collect()
    assert "NotImplementedError" in str(e.value) or "codec" in str(e.value)


def test_resize_shapes_and_determinism(spark, blobs):
    out = resize_media(blobs, "doc_id", "blob", target_w=8, target_h=4)
    rows = {r["doc_id"]: r for r in out.collect()}
    assert len(rows) == 20
    for r in rows.values():
        assert (r["width"], r["height"]) == (8, 4)
        assert len(r["resized"]) == 8 * 4
    rows2 = {r["doc_id"]: r for r in
             resize_media(blobs, "doc_id", "blob", 8, 4).collect()}
    assert rows2[7]["resized"] == rows[7]["resized"]


def test_resize_real_decoder_unimplemented_for_codec_formats(spark, blobs):
    out = resize_media(blobs, "doc_id", "blob", 8, 4, decoder="real")
    with pytest.raises(Exception) as e:
        out.collect()
    assert "NotImplementedError" in str(e.value) or "codec" in str(e.value)


def test_frame_sampling_explode(spark, blobs):
    frames = frame_sample_plan(blobs, "doc_id", "blob", every_n=10)
    pdf = frames.groupBy("doc_id").count().collect()
    feats = {r["doc_id"]: r["n_frames"]
             for r in extract_media_features(
                 blobs, "doc_id", "blob", media_type="video").collect()}
    for r in pdf:
        expected = (feats[r["doc_id"]] - 1) // 10 + 1
        assert r["count"] == expected


def test_real_pixel_stats_rejects_non_ascii_corpus(spark, tmp_path):
    """The oracle twin indexes codepoints while Spark sums UTF-8 bytes —
    identical only on ASCII. A non-ASCII doc must raise a NAMED error,
    not surface as a confusing hash mismatch (advisor finding, r5)."""
    import pytest as _pytest

    from feature_generation_benchmark_spark.workloads.multimodal import (
        multimodal_real_pixel_stats,
    )

    sf = str(tmp_path / "sf")
    docs = spark.createDataFrame(
        [(1, "plain ascii text", "web"), (2, "café au lait", "web")],
        "doc_id long, text string, source string",
    )
    docs.write.parquet(f"{sf}/documents.parquet")
    with _pytest.raises(Exception) as e:
        multimodal_real_pixel_stats(spark, sf).collect()
    assert "ASCII" in str(e.value)


def test_null_blobs_are_excluded_not_fatal(spark):
    """A NULL binary column (ingest-failure row) must be skipped — the
    pre-fix worker died on bytes(None), aborting the whole stage."""
    rows = [(0, b"\x01" * 64), (1, None), (2, b"\x02" * 64)]
    df = spark.createDataFrame(rows, "doc_id long, blob binary")
    feats = extract_media_features(df, "doc_id", "blob").collect()
    assert {r["doc_id"] for r in feats} == {0, 2}
    resized = resize_media(df, "doc_id", "blob", 4, 4).collect()
    assert {r["doc_id"] for r in resized} == {0, 2}
