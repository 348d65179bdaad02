"""Multimodal column plumbing — images/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched ``mapInPandas``.

The decode step runs in three modes: ``decoder="fake"`` produces
deterministic pseudo-features derived from the bytes (the whole pipeline
is testable with any blob); ``decoder="real"`` GENUINELY decodes the
library-free image formats — uncompressed 24-bit BMP, binary PPM, and
8-bit truecolor PNG (RFC 2083; DEFLATE comes from the stdlib zlib) —
via the pure-numpy codec (``operators/imagecodec.py``: decode, nearest-
neighbor resize, re-encode, channel-stat features, all vectorized); and
for formats that require codec libraries absent in this container
(JPEG/compressed audio/video), ``decoder="real"`` raises
``NotImplementedError`` at the exact point a real deployment plugs
PIL/torchaudio/pyav.
Everything around decode — schema, batch iteration, partitioning, UDF
signature — is the real Spark plumbing a production pipeline would keep.

Scale posture: ``mapInPandas`` streams Arrow batches (no per-row Python
dispatch); blobs never pass through a shuffle — feature extraction is a
narrow map, and only the (small) extracted features flow onward.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Typed metadata carried next to every blob column.
MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("media_type", T.StringType()),   # image|audio|video
        T.StructField("format", T.StringType()),       # png|wav|mp4|...
        T.StructField("n_bytes", T.LongType()),
    ]
)

MEDIA_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("content_sha256", T.StringType()),
        # decode-stage outputs (decoder-dependent):
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("feature_vec", T.ArrayType(T.FloatType())),
    ]
)


def attach_media_meta(
    df: DataFrame, blob_col: str, media_type: str, fmt: str
) -> DataFrame:
    """Add the typed metadata struct for an opaque binary column."""
    return df.withColumn(
        f"{blob_col}_meta",
        F.struct(
            F.lit(media_type).alias("media_type"),
            F.lit(fmt).alias("format"),
            F.length(F.col(blob_col)).cast("long").alias("n_bytes"),
        ),
    )


def _decode_stub(
    blob: bytes, media_type: str, decoder: str, digest: bytes | None = None
):
    """The decode stage. ``decoder="real"`` genuinely decodes the
    library-free formats (uncompressed 24-bit BMP, binary PPM, 8-bit
    truecolor PNG, baseline JPEG — pure-numpy codecs,
    ``operators/imagecodec.py`` + ``operators/jpegcodec.py``) and
    raises the documented ``NotImplementedError`` for formats that
    require codec libraries absent here (compressed video, MP3/AAC —
    plug PIL / torchaudio / pyav at this exact point). The deterministic fake derives plausible
    shapes and an 8-dim feature vector from the content hash so the
    downstream plumbing is exercisable with ANY bytes. ``digest`` lets
    callers that already hashed the blob (for content addressing) avoid a
    second pass."""
    if decoder == "real":
        from feature_generation_benchmark_spark.operators.imagecodec import (
            audio_features,
            decode_image,
            decode_wav,
            image_features,
            sniff_wav,
        )

        if sniff_wav(blob):
            samples, rate = decode_wav(blob)
            # audio mapping of the shared schema: width=n_channels,
            # height=sample_rate, n_frames=sample frames (audio term)
            return (
                samples.shape[1],
                rate,
                len(samples),
                audio_features(samples, rate),
            )
        from feature_generation_benchmark_spark.operators.avicodec import (
            decode_avi,
            sniff_avi,
        )

        if sniff_avi(blob):
            frames, _fps = decode_avi(blob)
            n, fh, fw = frames.shape[:3]
            # video: real frame count; features from frame 0 (stable
            # under frame-count changes, unlike a mean over frames)
            return fw, fh, n, image_features(frames[0])
        img, _fmt = decode_image(blob)  # NotImplementedError for mp4 etc.
        h, w = img.shape[:2]
        return w, h, 1, image_features(img)
    if digest is None:
        digest = hashlib.sha256(blob).digest()
    width = 16 + digest[0] % 240
    height = 16 + digest[1] % 240
    n_frames = 1 if media_type == "image" else 1 + digest[2] % 64
    vec = [round(b / 255.0, 6) for b in digest[:8]]
    return width, height, n_frames, vec


def extract_media_features(
    df: DataFrame,
    id_col: str,
    blob_col: str,
    media_type: str = "image",
    decoder: str = "fake",
    batch_limit: int = 256,
) -> DataFrame:
    """Decode/feature-extract blobs via ``mapInPandas`` (Arrow batches).

    ``batch_limit`` caps rows per emitted pandas frame so very large blobs
    don't balloon a single Arrow batch (the knob a real pipeline tunes
    against executor memory).

    NULL blobs (ingest-failure rows, common in real media tables) are
    excluded up front — ``bytes(None)`` inside the worker would abort the
    whole stage (r6 session-3 review).
    """
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for start in range(0, len(pdf), batch_limit):
                chunk = pdf.iloc[start : start + batch_limit]
                rows = []
                for doc_id, blob in zip(chunk[id_col], chunk[blob_col]):
                    data = bytes(blob)
                    digest = hashlib.sha256(data).digest()
                    w, h, nf, vec = _decode_stub(
                        data, media_type, decoder, digest=digest
                    )
                    rows.append(
                        {
                            "doc_id": int(doc_id),
                            "media_type": media_type,
                            "n_bytes": len(data),
                            "content_sha256": digest.hex(),
                            "width": w,
                            "height": h,
                            "n_frames": nf,
                            "feature_vec": vec,
                        }
                    )
                yield pd.DataFrame(rows)

    narrow = df.filter(F.col(blob_col).isNotNull()).select(
        F.col(id_col), F.col(blob_col)
    )
    return narrow.mapInPandas(run, MEDIA_FEATURES_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("resized", T.BinaryType()),
    ]
)


def resize_media(
    df: DataFrame,
    id_col: str,
    blob_col: str,
    target_w: int,
    target_h: int,
    decoder: str = "fake",
    batch_limit: int = 256,
) -> DataFrame:
    """Resize plumbing: decode → scale to (target_w, target_h) → re-encode,
    one blob per row, as a narrow ``mapInPandas`` (blobs never shuffle).

    ``decoder="real"`` actually resizes BMP/PPM blobs (pure-numpy
    nearest-neighbor, re-encoded in the input's own format) and raises
    the documented ``NotImplementedError`` for codec-library formats;
    the fake emits a deterministic ``target_w*target_h``-byte
    pseudo-bitmap seeded from the content hash, so output sizing/schema
    behave exactly like a real resize with any bytes."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for start in range(0, len(pdf), batch_limit):
                chunk = pdf.iloc[start : start + batch_limit]
                rows = []
                for doc_id, blob in zip(chunk[id_col], chunk[blob_col]):
                    data = bytes(blob)
                    if decoder == "real":
                        from feature_generation_benchmark_spark.operators.imagecodec import (  # noqa: E501
                            decode_image,
                            encode_image,
                            resize_nearest,
                        )

                        img, fmt = decode_image(data)
                        out = resize_nearest(img, target_w, target_h)
                        rows.append(
                            {
                                "doc_id": int(doc_id),
                                "width": target_w,
                                "height": target_h,
                                "resized": encode_image(out, fmt),
                            }
                        )
                        continue
                    seed = hashlib.sha256(data).digest()
                    n = target_w * target_h
                    fake = (seed * (n // len(seed) + 1))[:n]
                    rows.append(
                        {
                            "doc_id": int(doc_id),
                            "width": target_w,
                            "height": target_h,
                            "resized": fake,
                        }
                    )
                yield pd.DataFrame(rows)

    # NULL blobs excluded for the same reason as extract_media_features
    narrow = df.filter(F.col(blob_col).isNotNull()).select(
        F.col(id_col), F.col(blob_col)
    )
    return narrow.mapInPandas(run, RESIZED_SCHEMA)


def frame_sample_plan(
    df: DataFrame, id_col: str, blob_col: str, every_n: int = 10
) -> DataFrame:
    """Video frame-sampling plumbing: one output row per sampled frame
    index (decode stubbed). Demonstrates the explode-after-extract shape —
    the blob is decoded ONCE per row, then only small per-frame features
    fan out."""
    feats = extract_media_features(df, id_col, blob_col, media_type="video")
    return feats.select(
        "doc_id",
        "content_sha256",
        F.explode(
            F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_n))
        ).alias("frame_idx"),
        "feature_vec",
    )
