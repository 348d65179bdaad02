"""Uncompressed AVI container codec (operators/avicodec.py)."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from feature_generation_benchmark_spark.operators.avicodec import (
    decode_avi,
    encode_avi,
    sample_frames,
    sniff_avi,
)


@pytest.mark.parametrize("shape", [(1, 4, 4), (4, 8, 8), (7, 5, 9), (3, 16, 2)])
def test_roundtrip_exact(shape):
    """DIB frames are lossless — decode(encode(x)) must be
    pixel-identical for every frame, including odd widths that
    exercise the 4-byte row padding."""
    rng = np.random.default_rng(2)
    frames = rng.integers(0, 256, (*shape, 3), dtype=np.uint8)
    back, fps = decode_avi(encode_avi(frames, fps=24))
    assert fps == 24
    assert np.array_equal(back, frames)


def test_deterministic_bytes_and_sniff():
    frames = np.arange(2 * 4 * 4 * 3, dtype=np.uint8).reshape(2, 4, 4, 3)
    a = encode_avi(frames, fps=10)
    assert a == encode_avi(frames, fps=10)
    assert sniff_avi(a)
    assert not sniff_avi(b"RIFF\x00\x00\x00\x00WAVE")  # WAV is not AVI
    assert a[:4] == b"RIFF" and a[8:12] == b"AVI "


def test_sample_frames_indices():
    rng = np.random.default_rng(3)
    frames = rng.integers(0, 256, (7, 8, 8, 3), dtype=np.uint8)
    data = encode_avi(frames, fps=10)
    sampled = sample_frames(data, 3)
    assert [i for i, _ in sampled] == [0, 3, 6]
    for i, f in sampled:
        assert np.array_equal(f, frames[i])


def test_unsupported_codec_raises_by_name():
    frames = np.zeros((1, 4, 4, 3), dtype=np.uint8)
    data = bytearray(encode_avi(frames, fps=10))
    # rewrite biCompression in the strf BITMAPINFOHEADER to 'H264'
    strf = data.find(b"strf")
    assert strf > 0
    data[strf + 8 + 16 : strf + 8 + 20] = b"H264"
    with pytest.raises(ValueError, match="compression"):
        decode_avi(bytes(data))
    # MJPG chunks that are not actually JPEG still fail with a NAMED
    # error (the frame decoder's, via the container walk)
    data[strf + 8 + 16 : strf + 8 + 20] = b"MJPG"
    with pytest.raises(ValueError, match="JPEG"):
        decode_avi(bytes(data))


def test_mjpeg_compressed_video_roundtrip():
    """Motion-JPEG: REAL compressed video — one baseline JPEG per 00dc
    chunk. Lossy, so the q100 roundtrip is gated by the JPEG codec's
    provable bound; the container (per-frame sizes in idx1, fourcc in
    strf/strh) must carry it faithfully."""
    from feature_generation_benchmark_spark.operators.jpegcodec import (
        JPEG_Q100_MAX_ABS_ERR,
    )

    rng = np.random.default_rng(8)
    frames = rng.integers(0, 256, (4, 16, 24, 3), dtype=np.uint8)
    data = encode_avi(frames, fps=15, codec="MJPG", quality=100)
    assert b"MJPG" in data and b"00dc" in data
    back, fps = decode_avi(data)
    assert fps == 15 and back.shape == frames.shape
    err = np.abs(back.astype(int) - frames.astype(int)).max()
    assert err <= JPEG_Q100_MAX_ABS_ERR
    # compressed stream is genuinely smaller than raw on smooth frames
    smooth = np.tile(np.arange(24, dtype=np.uint8) * 10, (4, 16, 1))
    smooth = np.stack([smooth] * 3, axis=-1)
    assert len(encode_avi(smooth, 15, "MJPG", 90)) < len(encode_avi(smooth, 15))
    with pytest.raises(ValueError, match="codec"):
        encode_avi(frames, 15, codec="H264")


def test_malformed_streams_raise():
    with pytest.raises(ValueError, match="not a RIFF/AVI"):
        decode_avi(b"RIFF\x04\x00\x00\x00WAVE")
    # a valid RIFF AVI shell with no frames
    hdr = b"AVI "
    shell = b"RIFF" + struct.pack("<I", len(hdr)) + hdr
    with pytest.raises(ValueError, match="strf|frame"):
        decode_avi(shell)


def test_topdown_dib_variant():
    """Foreign encoders may write top-down DIBs (negative biHeight in
    strf) — frames must not come back vertically flipped."""
    rng = np.random.default_rng(6)
    frames = rng.integers(0, 256, (2, 4, 4, 3), dtype=np.uint8)
    data = bytearray(encode_avi(frames, fps=10))
    strf = data.find(b"strf")
    (h,) = struct.unpack_from("<i", data, strf + 8 + 8)
    # flip biHeight sign AND re-pack each frame's rows top-down
    struct.pack_into("<i", data, strf + 8 + 8, -h)
    pos = 0
    for f in frames:
        pos = data.find(b"00db", pos)
        body = pos + 8
        flipped = f[:, :, ::-1].reshape(h, -1)  # top-down BGR, no pad (w=4)
        data[body : body + flipped.size] = flipped.tobytes()
        pos = body
    back, _ = decode_avi(bytes(data))
    assert np.array_equal(back, frames)


def test_frame_chunk_padding_odd_sizes():
    """A 1-px-wide frame has a 4-byte padded row (odd chunk body never
    occurs for DIBs, but even-byte RIFF padding must still be walked
    over between chunks)."""
    rng = np.random.default_rng(5)
    frames = rng.integers(0, 256, (5, 3, 1, 3), dtype=np.uint8)
    back, _ = decode_avi(encode_avi(frames, fps=10))
    assert np.array_equal(back, frames)
