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
    extract_media_features,
    frame_sample_plan,
    resize_media,
)
from feature_generation_benchmark_spark.sources.testdata import load_table
from feature_generation_benchmark_spark.workloads import QueryDef


def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    # NULL text -> NULL blob: excluded on BOTH engines (the operator maps
    # drop NULL blobs; oracles carry the same WHERE) - r6 session-3 review
    blobs = docs.filter(F.col("text").isNotNull()).select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("blob")
    )
    # (attach_media_meta was called here historically but its meta
    # struct never reached the output — extract_media_features
    # projects to (id, blob) and recomputes n_bytes/media_type; the
    # typed-metadata surface stays covered by tests/test_multimodal
    # via the operator API — r6 session-3 review, dead-code removal)
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
    # NULL text -> NULL blob: excluded on BOTH engines (the operator maps
    # drop NULL blobs; oracles carry the same WHERE) - r6 session-3 review
    blobs = docs.filter(F.col("text").isNotNull()).select(
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
  FROM documents WHERE text IS NOT NULL
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
    # NULL text -> NULL blob: excluded on BOTH engines (the operator maps
    # drop NULL blobs; oracles carry the same WHERE) - r6 session-3 review
    blobs = docs.filter(F.col("text").isNotNull()).select(
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
  WHERE text IS NOT NULL
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
FROM documents WHERE text IS NOT NULL
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


# ---------------------------------------------------------------------------
# multimodal_real_pixel_stats — the REAL codec path, oracle-checked (r5)
# ---------------------------------------------------------------------------

_PIX_W, _PIX_H = 16, 16
_PIX_N = _PIX_W * _PIX_H * 3  # 768 bytes per synthesized image

def _ascii_blob_buffer(blob, source: str, entry: str):
    """Zero-padded 768-byte uint8 buffer from a document blob, with the
    shared ASCII contract: the DuckDB twins index CODEPOINTS
    (substr/ord) while the Spark side consumes UTF-8 BYTES — identical
    only on ASCII, so a non-ASCII fixture fails loudly here instead of
    hash-mismatching confusingly (advisor finding, r5)."""
    import numpy as np

    buf = np.zeros(_PIX_N, dtype=np.uint8)
    data = np.frombuffer(bytes(blob)[:_PIX_N], dtype=np.uint8)
    if (data >= 128).any():
        raise ValueError(
            f"{entry} requires an ASCII corpus; "
            f"non-ASCII byte in doc from {source!r}"
        )
    buf[: len(data)] = data
    return buf



def multimodal_real_pixel_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drive the REAL (pure-numpy) codecs through the oracle gate.

    Each document's UTF-8 bytes become the pixel buffer of a 16×16 RGB
    image (first 768 bytes, zero-padded), then roundtrip through ALL
    FOUR lossless real image codecs chained — BMP (bottom-up rows, BGR,
    4-byte padding) → PPM (P6 header) → PNG (RFC 2083: zlib DEFLATE,
    filtered scanlines, chunk CRCs) → GIF (GIF89a LZW, palette
    indexing; a 16×16 image has ≤256 pixels hence ≤256 colors, so
    indexed color is exact) — inside the ``mapInPandas`` worker via
    ``operators/imagecodec.py`` + ``operators/gifcodec.py``: four true
    encode→decode roundtrips per blob, not the hash fake. The output is
    the per-source EXACT integer per-channel pixel sums; because each
    roundtrip is pixel-identity, the DuckDB twin computes the same sums
    straight from the text bytes (ASCII corpus ⇒ ``ord`` = byte), so
    any codec defect — row order, BGR swap, padding arithmetic, PNG
    filter/CRC/deflate handling, LZW coding or palette mapping —
    breaks the value hash.

    Scale: blob synthesis + encode + decode + channel sums are one
    narrow map (blobs never shuffle); the only exchange is the
    ≤|sources| combining aggregate."""
    import numpy as np
    import pandas as pd
    from collections.abc import Iterator

    from feature_generation_benchmark_spark.operators.gifcodec import (
        decode_gif_rgb,
        encode_gif_rgb,
    )
    from feature_generation_benchmark_spark.operators.imagecodec import (
        decode_bmp,
        decode_png,
        decode_ppm,
        encode_bmp,
        encode_png,
        encode_ppm,
    )

    docs = load_table(spark, sf_dir, "documents")
    # NULL text excluded (same contract as the other multimodal queries;
    # bytes(None) would abort the worker) - r6 session-3 review
    narrow = docs.filter(F.col("text").isNotNull()).select(
        "source", F.encode(F.col("text"), "UTF-8").alias("blob")
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for source, blob in zip(pdf["source"], pdf["blob"]):
                buf = _ascii_blob_buffer(blob, source, "multimodal_real_pixel_stats")
                img = buf.reshape(_PIX_H, _PIX_W, 3)
                # REAL codec roundtrips, chained: any non-identity step
                # in any of the three formats corrupts the sums
                back = decode_bmp(encode_bmp(img))
                back = decode_ppm(encode_ppm(back))
                back = decode_png(encode_png(back))
                back = decode_gif_rgb(encode_gif_rgb(back))
                assert back.shape == (_PIX_H, _PIX_W, 3)
                sums = back.reshape(-1, 3).astype(np.int64).sum(axis=0)
                out.append(
                    {
                        "source": source,
                        "r_sum": int(sums[0]),
                        "g_sum": int(sums[1]),
                        "b_sum": int(sums[2]),
                    }
                )
            yield pd.DataFrame(out)

    per_doc = narrow.mapInPandas(
        run, "source string, r_sum long, g_sum long, b_sum long"
    )
    return (
        per_doc.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("r_sum").alias("r_total"),
            F.sum("g_sum").alias("g_total"),
            F.sum("b_sum").alias("b_total"),
        )
        .orderBy("source")
    )


_REAL_PIXEL_ORACLE = f"""
WITH bytes AS (
  SELECT source, u.i AS i,
         CASE WHEN u.i <= length(text) THEN ord(substr(text, u.i, 1))
              ELSE 0 END AS b
  FROM documents,
       unnest(generate_series(1, {_PIX_N})) AS u(i)
  WHERE text IS NOT NULL
)
SELECT source,
       CAST(count(*) // {_PIX_N} AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN (i - 1) % 3 = 0 THEN b ELSE 0 END) AS BIGINT)
         AS r_total,
       CAST(sum(CASE WHEN (i - 1) % 3 = 1 THEN b ELSE 0 END) AS BIGINT)
         AS g_total,
       CAST(sum(CASE WHEN (i - 1) % 3 = 2 THEN b ELSE 0 END) AS BIGINT)
         AS b_total
FROM bytes GROUP BY source ORDER BY source
"""

# bench=False: this is the CODEC VALIDATION query (a deliberate
# per-image encode→decode roundtrip, ~0.9 ms/doc of python codec work);
# the throughput path for blob features is multimodal_features, which
# stays benched
QUERIES.append(
    QueryDef(
        "multimodal_real_pixel_stats",
        multimodal_real_pixel_stats,
        _REAL_PIXEL_ORACLE,
        "REAL BMP->PPM->PNG->GIF encode->decode roundtrips per blob "
        "inside mapInPandas (pure-numpy codecs), exact integer channel "
        "sums per source — the oracle recomputes them from the raw "
        "bytes, so any codec defect breaks the hash",
        bench=False,
    )
)


def multimodal_jpeg_bound_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drive the REAL baseline JPEG codec (operators/jpegcodec.py)
    through the oracle gate.

    JPEG is lossy, so the exact-roundtrip gate the BMP/PPM/PNG chain
    uses cannot apply; this follows the repo's bound-gated sketch
    pattern instead (COVERAGE r7 §1): the hashed output carries (a)
    EXACT channel sums computed from the ORIGINAL pixel buffer — the
    DuckDB twin replays those from the raw bytes — plus (b) an in-plan
    invariant on the engine-specific part: every document's quality-100
    encode→decode roundtrip must stay within the codec's PROVABLE
    ``JPEG_Q100_MAX_ABS_ERR`` L∞ bound (derivation in the module
    docstring), folded to one ``jpeg_within_bound`` boolean per source
    that the oracle emits as literal TRUE. A Huffman-table, DCT,
    zig-zag, byte-stuffing or color-transform defect either corrupts
    the stream (worker exception) or blows the bound (hash mismatch).

    Scale: blob synthesis + encode + decode + sums are one narrow map
    (blobs never shuffle); the only exchange is the ≤|sources|
    combining aggregate."""
    import numpy as np
    import pandas as pd
    from collections.abc import Iterator

    from feature_generation_benchmark_spark.operators.jpegcodec import (
        JPEG_Q100_MAX_ABS_ERR,
        decode_jpeg,
        encode_jpeg,
    )

    docs = load_table(spark, sf_dir, "documents")
    narrow = docs.filter(F.col("text").isNotNull()).select(
        "source", F.encode(F.col("text"), "UTF-8").alias("blob")
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for source, blob in zip(pdf["source"], pdf["blob"]):
                buf = _ascii_blob_buffer(blob, source, "multimodal_jpeg_bound_stats")
                img = buf.reshape(_PIX_H, _PIX_W, 3)
                back = decode_jpeg(encode_jpeg(img, quality=100))
                assert back.shape == (_PIX_H, _PIX_W, 3)
                err = int(
                    np.abs(back.astype(np.int64) - img.astype(np.int64)).max()
                )
                sums = img.reshape(-1, 3).astype(np.int64).sum(axis=0)
                out.append(
                    {
                        "source": source,
                        "r_sum": int(sums[0]),
                        "g_sum": int(sums[1]),
                        "b_sum": int(sums[2]),
                        "ok": err <= JPEG_Q100_MAX_ABS_ERR,
                    }
                )
            yield pd.DataFrame(out)

    per_doc = narrow.mapInPandas(
        run, "source string, r_sum long, g_sum long, b_sum long, ok boolean"
    )
    return (
        per_doc.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("r_sum").alias("r_total"),
            F.sum("g_sum").alias("g_total"),
            F.sum("b_sum").alias("b_total"),
            F.min("ok").alias("jpeg_within_bound"),
        )
        .orderBy("source")
    )


_JPEG_BOUND_ORACLE = f"""
WITH bytes AS (
  SELECT source, u.i AS i,
         CASE WHEN u.i <= length(text) THEN ord(substr(text, u.i, 1))
              ELSE 0 END AS b
  FROM documents,
       unnest(generate_series(1, {_PIX_N})) AS u(i)
  WHERE text IS NOT NULL
)
SELECT source,
       CAST(count(*) // {_PIX_N} AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN (i - 1) % 3 = 0 THEN b ELSE 0 END) AS BIGINT)
         AS r_total,
       CAST(sum(CASE WHEN (i - 1) % 3 = 1 THEN b ELSE 0 END) AS BIGINT)
         AS g_total,
       CAST(sum(CASE WHEN (i - 1) % 3 = 2 THEN b ELSE 0 END) AS BIGINT)
         AS b_total,
       TRUE AS jpeg_within_bound
FROM bytes GROUP BY source ORDER BY source
"""

QUERIES.append(
    QueryDef(
        "multimodal_jpeg_bound_stats",
        multimodal_jpeg_bound_stats,
        _JPEG_BOUND_ORACLE,
        "REAL baseline JPEG (T.81: DCT + Annex K Huffman, pure numpy) "
        "q100 encode->decode per blob inside mapInPandas; exact channel "
        "sums hash-checked cross-engine + the provable L-inf error bound "
        "asserted in-plan per document",
        bench=False,
    )
)


# --- multimodal_real_video_frames — REAL AVI container, frame sampling ----

_VID_N_FRAMES, _VID_H, _VID_W = 4, 8, 8
_VID_FRAME_BYTES = _VID_H * _VID_W * 3  # 192; 4 frames = 768 = _PIX_N
_VID_EVERY_N = 2  # sampled frame indices: 0, 2


def multimodal_real_video_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL video path through the oracle gate: each document's UTF-8
    bytes become a 4-frame 8×8 RGB clip (first 768 bytes, zero-padded,
    frame-major), encoded into a genuine RIFF/AVI container
    (``operators/avicodec.py``: hdrl/movi lists, 00db DIB chunks,
    idx1) and decoded back inside the ``mapInPandas`` worker; every 2nd
    frame is sampled (indices 0 and 2) and the output is the EXACT
    per-source per-channel pixel sums over the sampled frames. The DIB
    frame layout is lossless, so the DuckDB twin recomputes the same
    sums straight from the text bytes (frame index = byte_pos / 192) —
    any container-walk, row-order, BGR or padding defect breaks the
    value hash; sampling the wrong frames shifts whole 192-byte windows
    and breaks it too.

    Scale: blob synthesis + encode + decode + sums are one narrow map
    (containers never shuffle); the only exchange is the ≤|sources|
    combining aggregate."""
    import numpy as np
    import pandas as pd
    from collections.abc import Iterator

    from feature_generation_benchmark_spark.operators.avicodec import (
        encode_avi,
        sample_frames,
    )

    docs = load_table(spark, sf_dir, "documents")
    narrow = docs.filter(F.col("text").isNotNull()).select(
        "source", F.encode(F.col("text"), "UTF-8").alias("blob")
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for source, blob in zip(pdf["source"], pdf["blob"]):
                buf = _ascii_blob_buffer(blob, source, "multimodal_real_video_frames")
                clip = buf.reshape(_VID_N_FRAMES, _VID_H, _VID_W, 3)
                sampled = sample_frames(encode_avi(clip, fps=10), _VID_EVERY_N)
                assert [i for i, _ in sampled] == [0, 2]
                stack = np.stack([f for _, f in sampled])
                sums = stack.reshape(-1, 3).astype(np.int64).sum(axis=0)
                out.append(
                    {
                        "source": source,
                        "n_sampled": len(sampled),
                        "r_sum": int(sums[0]),
                        "g_sum": int(sums[1]),
                        "b_sum": int(sums[2]),
                    }
                )
            yield pd.DataFrame(out)

    per_doc = narrow.mapInPandas(
        run,
        "source string, n_sampled long, r_sum long, g_sum long, b_sum long",
    )
    return (
        per_doc.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_sampled").alias("frames_sampled"),
            F.sum("r_sum").alias("r_total"),
            F.sum("g_sum").alias("g_total"),
            F.sum("b_sum").alias("b_total"),
        )
        .orderBy("source")
    )


# sampled frames are byte windows [0,192) and [384,576) of the 768-byte
# buffer; channel = (i-1) % 3 exactly as in the image twins
_VIDEO_FRAMES_ORACLE = f"""
WITH bytes AS (
  SELECT source, u.i AS i,
         (u.i - 1) // {_VID_FRAME_BYTES} AS frame,
         CASE WHEN u.i <= length(text) THEN ord(substr(text, u.i, 1))
              ELSE 0 END AS b
  FROM documents,
       unnest(generate_series(1, {_PIX_N})) AS u(i)
  WHERE text IS NOT NULL
)
SELECT source,
       CAST(count(*) // {_PIX_N} AS BIGINT) AS n_docs,
       CAST(count(*) // {_PIX_N} * 2 AS BIGINT) AS frames_sampled,
       CAST(sum(CASE WHEN frame IN (0, 2) AND (i - 1) % 3 = 0
                     THEN b ELSE 0 END) AS BIGINT) AS r_total,
       CAST(sum(CASE WHEN frame IN (0, 2) AND (i - 1) % 3 = 1
                     THEN b ELSE 0 END) AS BIGINT) AS g_total,
       CAST(sum(CASE WHEN frame IN (0, 2) AND (i - 1) % 3 = 2
                     THEN b ELSE 0 END) AS BIGINT) AS b_total
FROM bytes GROUP BY source ORDER BY source
"""

QUERIES.append(
    QueryDef(
        "multimodal_real_video_frames",
        multimodal_real_video_frames,
        _VIDEO_FRAMES_ORACLE,
        "REAL AVI container roundtrip (RIFF hdrl/movi/idx1, uncompressed "
        "DIB frames, pure numpy) + every-2nd frame sampling inside "
        "mapInPandas; exact sampled-frame channel sums hash-checked "
        "cross-engine",
        bench=False,
    )
)


# --- multimodal_real_audio_stats — REAL G.711 codecs, SQL-replayed -------


def multimodal_real_audio_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio-codec path through the oracle gate: each document's
    UTF-8 bytes are treated as 768 G.711 companded codes (zero-padded),
    wrapped in a genuine μ-law WAV container (format tag 7), decoded
    back through the full WAV chunk walk (``decode_wav``), and ALSO
    expanded directly through both G.711 laws (``operators/g711.py``).
    The hashed output carries the EXACT int16 sample sums under both
    laws — the DuckDB twin replays the G.711 expansion formulas
    (integer shifts/masks/XOR, single-sourced as
    ``MULAW_DECODE_SQL``/``ALAW_DECODE_SQL``) on the same bytes — plus
    an in-plan boolean asserting the WAV-container path (fmt-tag-7
    parse → μ-law expand → /32768 scaling) agrees bit-for-bit with the
    direct expansion.

    Scale: one narrow map + a ≤|sources| combining aggregate, like the
    other multimodal entries."""
    import numpy as np
    import pandas as pd
    from collections.abc import Iterator

    from feature_generation_benchmark_spark.operators.g711 import (
        alaw_decode,
        mulaw_decode,
    )
    from feature_generation_benchmark_spark.operators.imagecodec import (
        decode_wav,
        encode_wav_g711,
    )

    docs = load_table(spark, sf_dir, "documents")
    narrow = docs.filter(F.col("text").isNotNull()).select(
        "source", F.encode(F.col("text"), "UTF-8").alias("blob")
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for source, blob in zip(pdf["source"], pdf["blob"]):
                buf = _ascii_blob_buffer(blob, source, "multimodal_real_audio_stats")
                mu = mulaw_decode(buf)
                al = alaw_decode(buf)
                samples, rate = decode_wav(encode_wav_g711(buf, 8000, "mulaw"))
                container_ok = bool(
                    rate == 8000
                    and samples.shape == (_PIX_N, 1)
                    and np.array_equal(
                        samples[:, 0] * 32768.0, mu.astype(np.float64)
                    )
                )
                out.append(
                    {
                        "source": source,
                        "mu_sum": int(mu.astype(np.int64).sum()),
                        "al_sum": int(al.astype(np.int64).sum()),
                        "ok": container_ok,
                    }
                )
            yield pd.DataFrame(out)

    per_doc = narrow.mapInPandas(
        run, "source string, mu_sum long, al_sum long, ok boolean"
    )
    return (
        per_doc.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("mu_sum").alias("mu_total"),
            F.sum("al_sum").alias("al_total"),
            F.min("ok").alias("wav_container_ok"),
        )
        .orderBy("source")
    )


def _audio_oracle() -> str:
    from feature_generation_benchmark_spark.operators.g711 import (
        ALAW_DECODE_SQL,
        MULAW_DECODE_SQL,
    )

    mu = MULAW_DECODE_SQL.format(b="b")
    al = ALAW_DECODE_SQL.format(b="b")
    return f"""
WITH bytes AS (
  SELECT source,
         CASE WHEN u.i <= length(text) THEN ord(substr(text, u.i, 1))
              ELSE 0 END AS b
  FROM documents,
       unnest(generate_series(1, {_PIX_N})) AS u(i)
  WHERE text IS NOT NULL
)
SELECT source,
       CAST(count(*) // {_PIX_N} AS BIGINT) AS n_docs,
       CAST(sum({mu}) AS BIGINT) AS mu_total,
       CAST(sum({al}) AS BIGINT) AS al_total,
       TRUE AS wav_container_ok
FROM bytes GROUP BY source ORDER BY source
"""


QUERIES.append(
    QueryDef(
        "multimodal_real_audio_stats",
        multimodal_real_audio_stats,
        _audio_oracle(),
        "REAL G.711 mu-law/A-law expansion per blob (vectorized numpy) + "
        "a genuine format-tag-7 WAV container roundtrip; exact int16 "
        "sample sums hash-checked against the SQL-replayed G.711 "
        "formulas",
        bench=False,
    )
)


# --- multimodal_area_resize_stats — REAL antialiased downsample, SQL-replayed


def multimodal_area_resize_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL resize math through the oracle gate: each document's 16×16
    pixel buffer is box-mean downsampled 2×2 → 8×8
    (``resize_area`` — floor-of-mean, pure integer arithmetic, the
    INTER_AREA reduction vision pipelines use), and the output is the
    EXACT per-source channel sums of the DOWNSAMPLED image. The DuckDB
    twin replays the identical arithmetic from the raw bytes by
    grouping each 2×2 source block (row = (i-1)/48, col = ((i-1)%48)/3,
    channel = (i-1)%3 → block key (row/2, col/2, channel)) and summing
    ``floor(block_sum / 4)`` — any indexing, windowing or rounding
    defect in the resize breaks the value hash.

    Scale: one narrow map + the ≤|sources| combining aggregate, like
    the other codec entries."""
    import numpy as np
    import pandas as pd
    from collections.abc import Iterator

    from feature_generation_benchmark_spark.operators.imagecodec import (
        resize_area,
    )

    docs = load_table(spark, sf_dir, "documents")
    narrow = docs.filter(F.col("text").isNotNull()).select(
        "source", F.encode(F.col("text"), "UTF-8").alias("blob")
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for source, blob in zip(pdf["source"], pdf["blob"]):
                buf = _ascii_blob_buffer(
                    blob, source, "multimodal_area_resize_stats"
                )
                img = buf.reshape(_PIX_H, _PIX_W, 3)
                small = resize_area(img, 2, 2)
                assert small.shape == (_PIX_H // 2, _PIX_W // 2, 3)
                sums = small.reshape(-1, 3).astype(np.int64).sum(axis=0)
                out.append(
                    {
                        "source": source,
                        "r_sum": int(sums[0]),
                        "g_sum": int(sums[1]),
                        "b_sum": int(sums[2]),
                    }
                )
            yield pd.DataFrame(out)

    per_doc = narrow.mapInPandas(
        run, "source string, r_sum long, g_sum long, b_sum long"
    )
    return (
        per_doc.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("r_sum").alias("r_total"),
            F.sum("g_sum").alias("g_total"),
            F.sum("b_sum").alias("b_total"),
        )
        .orderBy("source")
    )


_AREA_RESIZE_ORACLE = f"""
WITH bytes AS (
  SELECT source, doc_id,
         ((u.i - 1) // {_PIX_W * 3}) // 2 AS blk_r,
         (((u.i - 1) % {_PIX_W * 3}) // 3) // 2 AS blk_c,
         (u.i - 1) % 3 AS ch,
         CASE WHEN u.i <= length(text) THEN ord(substr(text, u.i, 1))
              ELSE 0 END AS b
  FROM documents,
       unnest(generate_series(1, {_PIX_N})) AS u(i)
  WHERE text IS NOT NULL
),
blocks AS (
  SELECT source, doc_id, blk_r, blk_c, ch, sum(b) // 4 AS px
  FROM bytes GROUP BY source, doc_id, blk_r, blk_c, ch
)
SELECT source,
       CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN ch = 0 THEN px ELSE 0 END) AS BIGINT) AS r_total,
       CAST(sum(CASE WHEN ch = 1 THEN px ELSE 0 END) AS BIGINT) AS g_total,
       CAST(sum(CASE WHEN ch = 2 THEN px ELSE 0 END) AS BIGINT) AS b_total
FROM blocks GROUP BY source ORDER BY source
"""

QUERIES.append(
    QueryDef(
        "multimodal_area_resize_stats",
        multimodal_area_resize_stats,
        _AREA_RESIZE_ORACLE,
        "REAL antialiased 2x2 box-mean downsample (floor-of-mean integer "
        "arithmetic) per blob inside mapInPandas; exact downsampled "
        "channel sums replayed block-by-block in the DuckDB twin",
        bench=False,
    )
)
