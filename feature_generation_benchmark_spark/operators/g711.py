"""G.711 μ-law / A-law audio companding (ITU-T G.711 — public spec).

The two classic telephony codecs are pure integer bit-twiddling — no
library needed — and their DECODE direction is exactly expressible in
SQL (shifts, masks, XOR), which is what lets the multimodal registry
entry hash-gate a REAL audio codec end-to-end: Spark decodes 8-bit
companded codes inside the worker, the DuckDB twin replays the same
formula on the raw bytes, and the sums must match bit-for-bit.

Both directions are vectorized numpy over whole arrays. The codecs are
lossy PCM→code, but code→PCM→code is the identity for every one of the
256 codes (the canonical G.711 property, pinned by tests), so a
roundtrip STARTING from codes is exact — same shape as the GIF palette
argument.

``decode_wav``/``encode_wav`` (operators/imagecodec.py) accept WAVE
format tags 7 (μ-law) and 6 (A-law) through these functions.
"""

from __future__ import annotations

import numpy as np

_MULAW_BIAS = 0x84  # 132
_MULAW_CLIP = 32635


def mulaw_decode(codes: np.ndarray) -> np.ndarray:
    """(N,) uint8 μ-law codes → (N,) int16 linear PCM (G.711 Table 2a,
    the classic ~((m<<3)+132)<<e − 132 expansion)."""
    u = (~codes.astype(np.int32)) & 0xFF
    t = (((u & 0x0F) << 3) + _MULAW_BIAS) << ((u >> 4) & 0x07)
    return np.where(u & 0x80, _MULAW_BIAS - t, t - _MULAW_BIAS).astype(np.int16)


def mulaw_encode(pcm: np.ndarray) -> np.ndarray:
    """(N,) int16 linear PCM → (N,) uint8 μ-law codes."""
    x = pcm.astype(np.int32)
    sign = np.where(x < 0, 0x80, 0x00)
    mag = np.minimum(np.abs(x), _MULAW_CLIP) + _MULAW_BIAS
    # floor(log2(mag)): frexp is exact for ints < 2^53
    exp = np.frexp(mag.astype(np.float64))[1] - 1
    exp = np.clip(exp - 7, 0, 7)
    mant = (mag >> (exp + 3)) & 0x0F
    return ((~(sign | (exp << 4) | mant)) & 0xFF).astype(np.uint8)


def alaw_decode(codes: np.ndarray) -> np.ndarray:
    """(N,) uint8 A-law codes → (N,) int16 linear PCM (G.711 Table 1a;
    codes are transmitted XOR 0x55)."""
    a = codes.astype(np.int32) ^ 0x55
    seg = (a >> 4) & 0x07
    mant = a & 0x0F
    t = np.where(
        seg == 0,
        (mant << 4) + 8,
        ((mant << 4) + 0x108) << np.maximum(seg - 1, 0),
    )
    # MSB set = positive in A-law (opposite of mu-law)
    return np.where(a & 0x80, t, -t).astype(np.int16)


def alaw_encode(pcm: np.ndarray) -> np.ndarray:
    """(N,) int16 linear PCM → (N,) uint8 A-law codes."""
    x = pcm.astype(np.int32)
    sign = np.where(x >= 0, 0x80, 0x00)
    mag = np.minimum(np.where(x >= 0, x, -x), 32767)
    exp = np.frexp(mag.astype(np.float64))[1] - 1  # floor(log2), -1 for 0
    seg = np.clip(exp - 7, 0, 7)
    mant = np.where(seg == 0, mag >> 4, (mag >> (seg + 3)) & 0x0F)
    return (((sign | (seg << 4) | mant) ^ 0x55) & 0xFF).astype(np.uint8)


# DuckDB twins of the decode formulas — used by the oracle-gated
# multimodal entry so the SQL stays single-sourced with the numpy above.
# {b} is an integer byte expression in 0..255.
MULAW_DECODE_SQL = (
    "(CASE WHEN (xor({b}, 255) & 128) != 0 "
    f"THEN {_MULAW_BIAS} - ((((xor({{b}}, 255) & 15) << 3) + {_MULAW_BIAS})"
    " << ((xor({b}, 255) >> 4) & 7)) "
    f"ELSE ((((xor({{b}}, 255) & 15) << 3) + {_MULAW_BIAS})"
    f" << ((xor({{b}}, 255) >> 4) & 7)) - {_MULAW_BIAS} END)"
)

ALAW_DECODE_SQL = (
    "(CASE WHEN (xor({b}, 85) & 128) != 0 THEN 1 ELSE -1 END * "
    "CASE WHEN ((xor({b}, 85) >> 4) & 7) = 0 "
    "THEN ((xor({b}, 85) & 15) << 4) + 8 "
    "ELSE (((xor({b}, 85) & 15) << 4) + 264)"
    " << (((xor({b}, 85) >> 4) & 7) - 1) END)"
)
