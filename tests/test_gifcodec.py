"""GIF89a/LZW codec (operators/gifcodec.py) — pure python/stdlib."""

from __future__ import annotations

import numpy as np
import pytest

from feature_generation_benchmark_spark.operators.gifcodec import (
    decode_gif,
    decode_gif_rgb,
    encode_gif,
    encode_gif_rgb,
    sniff_gif,
)
from feature_generation_benchmark_spark.operators.imagecodec import (
    decode_image,
    encode_image,
    sniff_format,
)


@pytest.mark.parametrize("shape", [(1, 1), (8, 8), (16, 16), (13, 7)])
def test_rgb_roundtrip_exact(shape):
    """≤256 pixels ⇒ ≤256 colors ⇒ indexed color is exact."""
    rng = np.random.default_rng(6)
    img = rng.integers(0, 256, (*shape, 3), dtype=np.uint8)
    data = encode_gif_rgb(img)
    assert sniff_gif(data)
    assert np.array_equal(decode_gif_rgb(data), img)


def test_lzw_dictionary_growth_and_reset():
    """A 60k-pixel 4-color plane pushes the LZW dictionary through the
    9→12-bit width escalations and past 4096 entries (forcing a CLEAR
    reset) — the classic failure modes of a hand-rolled LZW."""
    rng = np.random.default_rng(7)
    idx = rng.integers(0, 4, (200, 300), dtype=np.uint8)
    pal = np.array(
        [[0, 0, 0], [255, 0, 0], [0, 255, 0], [0, 0, 255]], dtype=np.uint8
    )
    out_idx, out_pal = decode_gif(encode_gif(idx, pal))
    assert np.array_equal(out_idx, idx)
    assert np.array_equal(out_pal[:4], pal)


def test_kwkwk_special_case():
    """The code-equals-next-table-entry case (cScSc strings) — the one
    branch a naive LZW decoder gets wrong."""
    # 'aabbbaabb...' style repetition reliably produces the case
    idx = np.array([[0, 0, 0, 0, 0, 0, 0, 0]], dtype=np.uint8).repeat(4, axis=0)
    pal = np.array([[9, 9, 9]], dtype=np.uint8)
    out_idx, _ = decode_gif(encode_gif(idx, pal))
    assert np.array_equal(out_idx, idx)


def test_deterministic_bytes():
    g = np.repeat(np.arange(256, dtype=np.uint8), 4).reshape(32, 32)
    img = np.stack([g, g, g], axis=-1)
    assert encode_gif_rgb(img) == encode_gif_rgb(img)


def test_named_errors():
    rng = np.random.default_rng(8)
    with pytest.raises(ValueError, match="not a GIF"):
        decode_gif(b"NOTGIF....")
    big = rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)
    # 4096 pixels of noise ⇒ far more than 256 colors
    with pytest.raises(ValueError, match="distinct colors"):
        encode_gif_rgb(big)
    idx = np.zeros((4, 4), dtype=np.uint8)
    with pytest.raises(ValueError, match="at most 256"):
        encode_gif(idx, np.zeros((300, 3), dtype=np.uint8))
    # interlace flag set in the image descriptor
    data = bytearray(encode_gif_rgb(np.zeros((4, 4, 3), dtype=np.uint8)))
    desc = _descriptor_offset(data)
    assert data[desc] == 0x2C
    data[desc + 9] |= 0x40
    with pytest.raises(ValueError, match="interlaced"):
        decode_gif(bytes(data))


def _descriptor_offset(data) -> int:
    """Image-descriptor offset: 13-byte header + global color table
    (palette bytes can contain 0x2C, so find() is not safe)."""
    return 13 + (2 << (data[10] & 0x07)) * 3 if data[10] & 0x80 else 13


def test_extension_blocks_skipped():
    """A Graphic Control Extension before the image descriptor (what
    every animation tool emits) must be walked over."""
    img = np.arange(48, dtype=np.uint8).reshape(4, 4, 3)
    data = encode_gif_rgb(img)
    gce = b"\x21\xf9\x04\x00\x00\x00\x00\x00"  # GCE: 4-byte block + term
    desc = _descriptor_offset(data)
    assert data[desc] == 0x2C
    patched = data[:desc] + gce + data[desc:]
    assert np.array_equal(decode_gif_rgb(patched), img)


def test_dispatch_through_decode_image():
    img = np.arange(48, dtype=np.uint8).reshape(4, 4, 3)
    data = encode_image(img, "gif")
    assert sniff_format(data) == "gif"
    out, fmt = decode_image(data)
    assert fmt == "gif"
    assert np.array_equal(out, img)
