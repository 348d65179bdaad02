"""Real-decode multimodal path on the library-free image formats: the
pure-numpy BMP/PPM codec (operators/imagecodec.py) plugged into the
``decoder="real"`` mapInPandas plumbing — decode, nearest-neighbor
resize, re-encode, and feature extraction all actually run, end-to-end
through Spark, with hand-computable fixtures."""

from __future__ import annotations

import numpy as np
import pytest

from feature_generation_benchmark_spark.operators.imagecodec import (
    decode_bmp,
    decode_image,
    decode_ppm,
    encode_bmp,
    encode_png,
    encode_ppm,
    image_features,
    resize_nearest,
    sniff_format,
)


def _gradient(h, w):
    img = np.zeros((h, w, 3), dtype=np.uint8)
    img[..., 0] = np.arange(w, dtype=np.uint8)[None, :] * 3 % 256
    img[..., 1] = np.arange(h, dtype=np.uint8)[:, None] * 5 % 256
    img[..., 2] = 37
    return img


@pytest.mark.parametrize("h,w", [(1, 1), (2, 3), (16, 16), (7, 13)])
def test_bmp_roundtrip_exact(h, w):
    """encode→decode must be pixel-exact, including the non-multiple-of-4
    row widths that exercise BMP's 4-byte row padding."""
    img = _gradient(h, w)
    back = decode_bmp(encode_bmp(img))
    assert back.shape == (h, w, 3)
    assert np.array_equal(back, img)


@pytest.mark.parametrize("h,w", [(1, 1), (2, 3), (9, 4)])
def test_ppm_roundtrip_exact(h, w):
    img = _gradient(h, w)
    back = decode_ppm(encode_ppm(img))
    assert np.array_equal(back, img)


def test_ppm_header_comments_parsed():
    img = _gradient(3, 2)
    data = encode_ppm(img)
    # inject a comment line into the header (legal per netpbm spec)
    commented = data.replace(b"P6\n", b"P6\n# a comment\n", 1)
    assert np.array_equal(decode_ppm(commented), img)


def test_sniff_and_dispatch():
    img = _gradient(4, 4)
    assert sniff_format(encode_bmp(img)) == "bmp"
    assert sniff_format(encode_ppm(img)) == "ppm"
    assert sniff_format(encode_png(img)) == "png"
    assert sniff_format(b"\x89PNG\r\n") is None  # truncated magic
    # JPEG now dispatches to the REAL baseline codec (jpegcodec.py);
    # a truncated stream fails THERE with a named error, and a format
    # nothing sniffs still hits the documented plug-a-library point
    assert sniff_format(b"\xff\xd8\xff\xe0") == "jpeg"
    with pytest.raises(ValueError, match="truncated"):
        decode_image(b"\xff\xd8\xff\xe0JFIF....")
    with pytest.raises(NotImplementedError):
        decode_image(b"\x00\x01unknown-format")  # unsniffed → plug point


@pytest.mark.parametrize("h,w", [(1, 1), (2, 3), (16, 16), (7, 13)])
def test_png_roundtrip_exact(h, w):
    img = _gradient(h, w)
    data = encode_png(img)
    back, fmt = decode_image(data)
    assert fmt == "png"
    assert back.shape == (h, w, 3)
    assert np.array_equal(back, img)
    # deterministic byte stream (fixed filter + zlib level)
    assert data == encode_png(img)


def _png_with_filters(img, filters):
    """Re-emit a PNG choosing a per-row filter type — produces the
    filtered byte streams a foreign encoder would, so decode's
    Sub/Up/Average/Paeth reconstruction is exercised for real."""
    import struct
    import zlib

    h, w, _ = img.shape
    bpp = 3
    raw = img.reshape(h, w * bpp).astype(np.int64)
    lines = bytearray()
    for y in range(h):
        f = filters[y % len(filters)]
        cur = raw[y]
        prev = raw[y - 1] if y else np.zeros(w * bpp, dtype=np.int64)
        left = np.concatenate([np.zeros(bpp, dtype=np.int64), cur[:-bpp]])
        ul = np.concatenate([np.zeros(bpp, dtype=np.int64), prev[:-bpp]])
        if f == 0:
            filt = cur
        elif f == 1:
            filt = cur - left
        elif f == 2:
            filt = cur - prev
        elif f == 3:
            filt = cur - ((left + prev) >> 1)
        else:  # Paeth
            p = left + prev - ul
            pa, pb, pc = abs(p - left), abs(p - prev), abs(p - ul)
            pred = np.where(
                (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prev, ul)
            )
            filt = cur - pred
        lines.append(f)
        lines += (filt & 0xFF).astype(np.uint8).tobytes()

    def chunk(ctype, body):
        return (
            struct.pack(">I", len(body)) + ctype + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(lines)))
        + chunk(b"IEND", b"")
    )


@pytest.mark.parametrize("filters", [[1], [2], [3], [4], [0, 1, 2, 3, 4]])
def test_png_decode_all_filter_types(filters):
    """Foreign encoders emit Sub/Up/Average/Paeth; reconstruction must be
    pixel-exact for each filter and for mixed per-row choices."""
    from feature_generation_benchmark_spark.operators.imagecodec import (
        decode_png,
    )

    img = _gradient(8, 5)
    assert np.array_equal(decode_png(_png_with_filters(img, filters)), img)


def test_png_rgba_alpha_dropped_and_crc_checked():
    import struct
    import zlib

    from feature_generation_benchmark_spark.operators.imagecodec import (
        decode_png,
    )

    # hand-build a 2x2 RGBA PNG (color type 6); decode keeps RGB
    img = _gradient(2, 2)
    rgba = np.concatenate(
        [img, np.full((2, 2, 1), 200, dtype=np.uint8)], axis=2
    )
    lines = b"".join(
        b"\x00" + rgba[y].tobytes() for y in range(2)
    )

    def chunk(ctype, body):
        return (
            struct.pack(">I", len(body)) + ctype + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    data = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 6, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(lines))
        + chunk(b"IEND", b"")
    )
    assert np.array_equal(decode_png(data), img)
    # flip one IDAT payload byte: CRC must catch it loudly
    corrupt = bytearray(data)
    idat_pos = data.index(b"IDAT") + 6
    corrupt[idat_pos] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(corrupt))


def test_png_unsupported_variants_raise():
    import struct
    import zlib

    from feature_generation_benchmark_spark.operators.imagecodec import (
        decode_png,
    )

    def chunk(ctype, body):
        return (
            struct.pack(">I", len(body)) + ctype + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    # 16-bit depth and palette color are out of scope -> named error
    for depth, color in [(16, 2), (8, 3)]:
        data = (
            b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", struct.pack(">IIBBBBB", 1, 1, depth, color, 0, 0, 0))
            + chunk(b"IDAT", zlib.compress(b"\x00\x00\x00\x00"))
            + chunk(b"IEND", b"")
        )
        with pytest.raises(ValueError, match="unsupported PNG"):
            decode_png(data)


def test_resize_nearest_hand_computed():
    """2x2 checkerboard upscaled 2x: each source pixel becomes a 2x2
    block (pixel-center mapping)."""
    img = np.zeros((2, 2, 3), dtype=np.uint8)
    img[0, 0] = img[1, 1] = 255
    up = resize_nearest(img, 4, 4)
    assert up.shape == (4, 4, 3)
    for r in range(4):
        for c in range(4):
            assert np.array_equal(up[r, c], img[r // 2, c // 2])
    # downscale back recovers the original
    down = resize_nearest(up, 2, 2)
    assert np.array_equal(down, img)


def test_extract_features_real_decoder_e2e(spark):
    """decoder="real" through the actual mapInPandas plumbing: dims must
    be the true image dims and the feature vector the true channel
    means/stds (not hash pseudo-features)."""
    from feature_generation_benchmark_spark.operators.multimodal import (
        extract_media_features,
    )

    imgs = {i: _gradient(8 + i, 5 + i) for i in range(4)}
    rows = [(i, bytearray(encode_bmp(img))) for i, img in imgs.items()]
    rows.append((99, bytearray(encode_ppm(_gradient(6, 6)))))
    rows.append((98, bytearray(encode_png(_gradient(9, 7)))))
    df = spark.createDataFrame(rows, "doc_id long, blob binary")
    out = {
        r["doc_id"]: r
        for r in extract_media_features(
            df, "doc_id", "blob", decoder="real"
        ).collect()
    }
    for i, img in imgs.items():
        r = out[i]
        assert (r["width"], r["height"]) == (img.shape[1], img.shape[0])
        assert r["n_frames"] == 1
        assert r["feature_vec"] == pytest.approx(
            image_features(img), abs=1e-6
        )
    assert (out[99]["width"], out[99]["height"]) == (6, 6)
    assert (out[98]["width"], out[98]["height"]) == (7, 9)
    assert out[98]["feature_vec"] == pytest.approx(
        image_features(_gradient(9, 7)), abs=1e-6
    )


def test_resize_media_real_decoder_e2e(spark):
    """Real resize through Spark: output blob must DECODE back to the
    nearest-neighbor-resized pixels, in the input's own format."""
    from feature_generation_benchmark_spark.operators.multimodal import (
        resize_media,
    )

    img = _gradient(16, 12)
    df = spark.createDataFrame(
        [
            (1, bytearray(encode_bmp(img))),
            (2, bytearray(encode_ppm(img))),
            (3, bytearray(encode_png(img))),
        ],
        "doc_id long, blob binary",
    )
    out = {
        r["doc_id"]: r
        for r in resize_media(
            df, "doc_id", "blob", target_w=6, target_h=4, decoder="real"
        ).collect()
    }
    want = resize_nearest(img, 6, 4)
    got_bmp, fmt1 = decode_image(bytes(out[1]["resized"]))
    got_ppm, fmt2 = decode_image(bytes(out[2]["resized"]))
    got_png, fmt3 = decode_image(bytes(out[3]["resized"]))
    assert (fmt1, fmt2, fmt3) == ("bmp", "ppm", "png")
    assert np.array_equal(got_bmp, want)
    assert np.array_equal(got_ppm, want)
    assert np.array_equal(got_png, want)
    assert (out[1]["width"], out[1]["height"]) == (6, 4)


def test_bmp_topdown_variant():
    """Negative-height (top-down) BMPs are legal; decode must not flip."""
    img = _gradient(4, 4)
    data = bytearray(encode_bmp(img))
    import struct

    # rewrite height as negative and flip stored rows to top-down order
    h = struct.unpack_from("<i", data, 14 + 8)[0]
    struct.pack_into("<i", data, 14 + 8, -h)
    pix_off = struct.unpack_from("<I", data, 10)[0]
    row_bytes = (4 * 3 + 3) & ~3
    rows = [
        bytes(data[pix_off + r * row_bytes : pix_off + (r + 1) * row_bytes])
        for r in range(4)
    ]
    data[pix_off:] = b"".join(reversed(rows))
    assert np.array_equal(decode_bmp(bytes(data)), img)


# --- WAV (library-free audio) ------------------------------------------------


def test_wav_roundtrip_16bit():
    from feature_generation_benchmark_spark.operators.imagecodec import (
        decode_wav,
        encode_wav,
    )

    t = np.arange(800) / 8000.0
    stereo = np.stack(
        [np.sin(2 * np.pi * 440 * t), 0.5 * np.sin(2 * np.pi * 220 * t)],
        axis=1,
    )
    back, rate = decode_wav(encode_wav(stereo, 8000))
    assert rate == 8000 and back.shape == (800, 2)
    # error bound: ±0.5/32768 rounding + the standard 32767/32768 encode/
    # decode scale asymmetry (≈1/32768 at full scale)
    assert np.abs(back - stereo).max() <= 2.0 / 32768


def test_wav_chunk_walk_and_8bit():
    """fmt/data separated by an unknown odd-sized chunk (pad byte), plus
    the unsigned-with-128-midpoint 8-bit variant."""
    from feature_generation_benchmark_spark.operators.imagecodec import (
        decode_wav,
    )
    import struct as st

    pcm8 = bytes([128, 255, 0, 128])  # midpoint, +max, -max, midpoint
    fmt = st.pack("<HHIIHH", 1, 1, 4000, 4000, 1, 8)
    junk = b"junkxyz"  # 7 bytes -> odd, exercises even-padding
    chunks = (
        b"WAVE"
        + b"fmt " + st.pack("<I", len(fmt)) + fmt
        + b"junk" + st.pack("<I", len(junk)) + junk + b"\x00"
        + b"data" + st.pack("<I", len(pcm8)) + pcm8
    )
    data = b"RIFF" + st.pack("<I", len(chunks)) + chunks
    samples, rate = decode_wav(data)
    assert rate == 4000
    assert samples[:, 0].tolist() == [0.0, 127 / 128, -1.0, 0.0]


def test_extract_features_real_wav_e2e(spark):
    """Audio through the real decoder in Spark: schema mapping is
    (width=n_channels, height=sample_rate, n_frames=samples) and the
    feature vector carries the true duration/RMS."""
    from feature_generation_benchmark_spark.operators.imagecodec import (
        audio_features,
        decode_wav,
        encode_wav,
    )
    from feature_generation_benchmark_spark.operators.multimodal import (
        extract_media_features,
    )

    t = np.arange(1600) / 16000.0
    wav = encode_wav(np.sin(2 * np.pi * 440 * t)[:, None], 16000)
    df = spark.createDataFrame(
        [(1, bytearray(wav))], "doc_id long, blob binary"
    )
    r = extract_media_features(
        df, "doc_id", "blob", media_type="audio", decoder="real"
    ).collect()[0]
    assert (r["width"], r["height"], r["n_frames"]) == (1, 16000, 1600)
    samples, rate = decode_wav(wav)
    assert r["feature_vec"] == pytest.approx(
        audio_features(samples, rate), abs=1e-6
    )
    assert abs(r["feature_vec"][0] - 0.1) < 1e-6  # 1600/16000 s duration


def test_real_pixel_stats_rejects_non_ascii(spark, tmp_path):
    """r6 verdict #6: the pixel-stats oracle indexes CODEPOINTS
    (DuckDB substr/ord) while the Spark side sums UTF-8 BYTES — parity
    holds only on ASCII, so a non-ASCII doc must fail LOUDLY with the
    named guard instead of hash-mismatching confusingly."""
    import pytest
    from pyspark.errors import PythonException

    from feature_generation_benchmark_spark.workloads.multimodal import (
        multimodal_real_pixel_stats,
    )

    docs = spark.createDataFrame(
        [
            (1, "plain ascii body", "en", "web", 16),
            (2, "café au lait — non-ascii", "fr", "web", 22),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    docs.write.parquet(str(tmp_path / "documents.parquet"))
    with pytest.raises(PythonException, match="ASCII"):
        multimodal_real_pixel_stats(spark, str(tmp_path)).collect()


def test_extract_features_real_jpeg_gif_avi_e2e(spark):
    """The round-7 codecs through the operator API: JPEG (lossy —
    bounded-error features), GIF (exact), and AVI video (real frame
    count + frame-0 features) all decode inside the real mapInPandas
    path."""
    import numpy as np

    from feature_generation_benchmark_spark.operators.avicodec import (
        encode_avi,
    )
    from feature_generation_benchmark_spark.operators.gifcodec import (
        encode_gif_rgb,
    )
    from feature_generation_benchmark_spark.operators.jpegcodec import (
        encode_jpeg,
    )
    from feature_generation_benchmark_spark.operators.multimodal import (
        extract_media_features,
    )

    img = _gradient(12, 9)
    rng = np.random.default_rng(23)
    clip = rng.integers(0, 256, (5, 6, 7, 3), dtype=np.uint8)
    rows = [
        (1, bytearray(encode_jpeg(img, quality=100))),
        (2, bytearray(encode_gif_rgb(img))),
        (3, bytearray(encode_avi(clip, fps=10))),
    ]
    df = spark.createDataFrame(rows, "doc_id long, blob binary")
    out = {
        r["doc_id"]: r
        for r in extract_media_features(
            df, "doc_id", "blob", decoder="real"
        ).collect()
    }
    ref = image_features(img)
    assert (out[1]["width"], out[1]["height"], out[1]["n_frames"]) == (9, 12, 1)
    # q100 JPEG error <= 24/255 per pixel -> means within a loose bound
    assert out[1]["feature_vec"][:3] == pytest.approx(ref[:3], abs=24 / 255)
    assert (out[2]["width"], out[2]["height"]) == (9, 12)
    assert out[2]["feature_vec"] == pytest.approx(ref, abs=1e-6)  # exact
    assert (out[3]["width"], out[3]["height"], out[3]["n_frames"]) == (7, 6, 5)
    assert out[3]["feature_vec"] == pytest.approx(
        image_features(clip[0]), abs=1e-6
    )


def test_resize_area_hand_computed_and_guarded():
    import numpy as np

    from feature_generation_benchmark_spark.operators.imagecodec import (
        resize_area,
    )

    img = np.arange(2 * 4 * 3, dtype=np.uint8).reshape(2, 4, 3)
    out = resize_area(img, 2, 2)
    assert out.shape == (1, 2, 3)
    for c in range(2):
        for ch in range(3):
            blk = img[0:2, 2 * c : 2 * c + 2, ch].astype(int)
            assert out[0, c, ch] == blk.sum() // 4
    with pytest.raises(ValueError, match="divisible"):
        resize_area(np.zeros((3, 4, 3), np.uint8), 2, 2)


def test_resize_bilinear_hand_computed():
    import numpy as np

    from feature_generation_benchmark_spark.operators.imagecodec import (
        resize_bilinear,
    )

    # identity at the same size
    rng = np.random.default_rng(31)
    img = rng.integers(0, 256, (5, 7, 3), dtype=np.uint8)
    assert np.array_equal(resize_bilinear(img, 7, 5), img)
    # 1-D lerp: [0, 100] -> 4 wide gives the pixel-center weights
    line = np.zeros((1, 2, 3), np.uint8)
    line[0, 1] = 100
    assert list(resize_bilinear(line, 4, 1)[0, :, 0]) == [0, 25, 75, 100]
    # constant image stays constant at any ratio (no edge bleed)
    const = np.full((4, 4, 3), 77, np.uint8)
    assert (resize_bilinear(const, 9, 7) == 77).all()
