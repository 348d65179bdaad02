"""Property-based roundtrips for the round-7 codec family.

The fixed-seed unit suites pin known cases; these let hypothesis hunt
the corners — odd dims (row-padding arithmetic), extreme values,
single-pixel images, palette-boundary color counts — with the
invariants that make the oracle gates sound:

* BMP/PPM/PNG/GIF/AVI are LOSSLESS here: decode(encode(x)) == x.
* JPEG at quality 100 obeys the provable L∞ bound for ANY input.
* G.711 decode→encode is the identity on the code domain.
"""

from __future__ import annotations

import numpy as np
import pytest

hyp = pytest.importorskip("hypothesis")
from hypothesis import given, settings, strategies as st  # noqa: E402

from feature_generation_benchmark_spark.operators.avicodec import (  # noqa: E402
    decode_avi,
    encode_avi,
)
from feature_generation_benchmark_spark.operators.gifcodec import (  # noqa: E402
    decode_gif_rgb,
    encode_gif_rgb,
)
from feature_generation_benchmark_spark.operators.imagecodec import (  # noqa: E402
    decode_bmp,
    decode_png,
    decode_ppm,
    encode_bmp,
    encode_png,
    encode_ppm,
)
from feature_generation_benchmark_spark.operators.jpegcodec import (  # noqa: E402
    JPEG_Q100_MAX_ABS_ERR,
    decode_jpeg,
    encode_jpeg,
)

_dims = st.tuples(st.integers(1, 24), st.integers(1, 24))


def _img(seed: int, h: int, w: int) -> np.ndarray:
    return np.random.default_rng(seed).integers(
        0, 256, (h, w, 3), dtype=np.uint8
    )


@settings(max_examples=40, deadline=None)
@given(seed=st.integers(0, 2**32 - 1), dims=_dims)
def test_lossless_image_codecs_roundtrip(seed, dims):
    h, w = dims
    img = _img(seed, h, w)
    assert np.array_equal(decode_bmp(encode_bmp(img)), img)
    assert np.array_equal(decode_ppm(encode_ppm(img)), img)
    assert np.array_equal(decode_png(encode_png(img)), img)


@settings(max_examples=30, deadline=None)
@given(seed=st.integers(0, 2**32 - 1), dims=_dims)
def test_gif_roundtrip_when_palette_fits(seed, dims):
    h, w = dims
    img = _img(seed, h, w)
    n_colors = len(np.unique(img.reshape(-1, 3), axis=0))
    if n_colors > 256:
        with pytest.raises(ValueError, match="distinct colors"):
            encode_gif_rgb(img)
    else:
        assert np.array_equal(decode_gif_rgb(encode_gif_rgb(img)), img)


@settings(max_examples=25, deadline=None)
@given(
    seed=st.integers(0, 2**32 - 1),
    dims=_dims,
    quality=st.sampled_from([100]),
)
def test_jpeg_q100_bound_holds_for_any_input(seed, dims, quality):
    h, w = dims
    img = _img(seed, h, w)
    back = decode_jpeg(encode_jpeg(img, quality=quality))
    assert back.shape == img.shape
    err = np.abs(back.astype(int) - img.astype(int)).max()
    assert err <= JPEG_Q100_MAX_ABS_ERR


@settings(max_examples=25, deadline=None)
@given(
    seed=st.integers(0, 2**32 - 1),
    n=st.integers(1, 6),
    dims=st.tuples(st.integers(1, 12), st.integers(1, 12)),
    fps=st.integers(1, 60),
)
def test_avi_roundtrip_any_geometry(seed, n, dims, fps):
    h, w = dims
    frames = np.random.default_rng(seed).integers(
        0, 256, (n, h, w, 3), dtype=np.uint8
    )
    back, out_fps = decode_avi(encode_avi(frames, fps=fps))
    assert out_fps == fps
    assert np.array_equal(back, frames)


@settings(max_examples=50, deadline=None)
@given(pcm=st.lists(st.integers(-32768, 32767), min_size=1, max_size=64))
def test_g711_requantization_is_stable(pcm):
    """Companding is idempotent after one quantization step — at the
    VALUE level: dec(enc(dec(enc(x)))) == dec(enc(x)). (Strict CODE
    idempotence is false for μ-law: pcm −3..−1 encode to 0x7F, the
    negative zero, which canonically re-encodes as 0xFF — both decode
    to 0. Pinned explicitly below so hypothesis need not stumble on
    it.)"""
    from feature_generation_benchmark_spark.operators.g711 import (
        alaw_decode,
        alaw_encode,
        mulaw_decode,
        mulaw_encode,
    )

    x = np.array(pcm + [-3, -2, -1, 0], dtype=np.int16)  # force the ±0 edge
    for enc, dec in ((mulaw_encode, mulaw_decode), (alaw_encode, alaw_decode)):
        val = dec(enc(x))
        assert np.array_equal(dec(enc(val)), val)
    # the documented ±0 collapse, asserted exactly
    assert list(mulaw_encode(np.array([-1, 0], np.int16))) == [0x7F, 0xFF]
    assert list(mulaw_decode(np.array([0x7F, 0xFF], np.uint8))) == [0, 0]


_MAGICS = {
    "bmp": b"BM",
    "ppm": b"P6",
    "png": b"\x89PNG\r\n\x1a\n",
    "jpeg": b"\xff\xd8",
    "gif": b"GIF89a",
    "avi": b"RIFF\x20\x00\x00\x00AVI ",
    "wav": b"RIFF\x20\x00\x00\x00WAVE",
}


@settings(max_examples=60, deadline=None)
@given(
    fmt=st.sampled_from(sorted(_MAGICS)),
    junk=st.binary(min_size=0, max_size=300),
)
def test_decoders_fail_closed_on_garbage(fmt, junk):
    """Untrusted-blob contract: a valid magic followed by arbitrary
    bytes must raise ValueError / NotImplementedError — never a raw
    struct.error / IndexError / zlib.error, never a giant allocation
    from a corrupt dimension field (strict_decoder + check_dims,
    operators/imagecodec.py). At corpus scale corrupt blobs are
    routine; named errors are filterable rows, anything else is an
    opaque worker crash."""
    from feature_generation_benchmark_spark.operators.avicodec import (
        decode_avi,
    )
    from feature_generation_benchmark_spark.operators.gifcodec import (
        decode_gif,
    )
    from feature_generation_benchmark_spark.operators.imagecodec import (
        decode_bmp,
        decode_png,
        decode_ppm,
        decode_wav,
    )
    from feature_generation_benchmark_spark.operators.jpegcodec import (
        decode_jpeg,
    )

    dec = {
        "bmp": decode_bmp,
        "ppm": decode_ppm,
        "png": decode_png,
        "jpeg": decode_jpeg,
        "gif": decode_gif,
        "avi": decode_avi,
        "wav": decode_wav,
    }[fmt]
    try:
        dec(_MAGICS[fmt] + junk)
    except (ValueError, NotImplementedError):
        pass  # named failure — the contract
