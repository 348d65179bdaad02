"""Pure-python GIF codec (GIF89a, LZW — public spec, stdlib only).

GIF's only compression is the LZW variant defined in the GIF89a
specification (variable code width 3–12 bits, LSB-first bit packing,
CLEAR/EOI codes, 4096-entry dictionary) — no external library needed.
Indexed color is exact: an image with ≤256 distinct RGB colors
roundtrips pixel-identically, which is what lets the oracle-gated
multimodal chain (workloads/multimodal.py) include GIF alongside
BMP/PPM/PNG — a 16×16 fixture has at most 256 pixels, hence at most
256 distinct colors, always.

Scope, named like the other real codecs: single-image, non-interlaced,
global color table; ``decode_gif`` also accepts a local color table and
skips extension blocks (GCE/comment/application). Interlaced images and
animations (multiple image descriptors) raise ValueError by name.
"""

from __future__ import annotations

import struct

import numpy as np

from feature_generation_benchmark_spark.operators.imagecodec import (
    check_dims,
    strict_decoder,
)


def sniff_gif(data: bytes) -> bool:
    return data[:6] in (b"GIF87a", b"GIF89a")


# --- LZW (GIF variant) ---------------------------------------------------


def _lzw_encode(indices: np.ndarray, min_code_size: int) -> bytes:
    """Index stream → GIF LZW bytes (LSB-first bit packing)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    width = min_code_size + 1
    emit(clear, width)
    seq = b""
    for px in indices.ravel().tolist():
        cand = seq + bytes([px])
        if cand in table:
            seq = cand
            continue
        emit(table[seq], width)
        if next_code < 4096:
            table[cand] = next_code
            next_code += 1
            if next_code > (1 << width) and width < 12:
                width += 1
        else:  # dictionary full → reset, per spec
            emit(clear, width)
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
            width = min_code_size + 1
        seq = bytes([px])
    if seq:
        emit(table[seq], width)
    emit(eoi, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> np.ndarray:
    clear = 1 << min_code_size
    eoi = clear + 1
    pos = 0
    acc = 0
    nbits = 0

    def read(width: int) -> int:
        nonlocal pos, acc, nbits
        while nbits < width:
            if pos >= len(data):
                raise ValueError("GIF LZW stream truncated")
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        return code

    out = bytearray()
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    width = min_code_size + 1
    prev: bytes | None = None
    while len(out) < n_pixels:
        code = read(width)
        if code == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if code < len(table):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]  # the KwKwK special case
        else:
            raise ValueError(f"invalid GIF LZW code {code}")
        out += entry
        if prev is not None and len(table) < 4096:
            table.append(prev + entry[:1])
            if len(table) >= (1 << width) and width < 12:
                width += 1
        prev = entry
    if len(out) < n_pixels:
        raise ValueError("GIF LZW stream ended before all pixels")
    return np.frombuffer(bytes(out[:n_pixels]), dtype=np.uint8)


# --- container -----------------------------------------------------------


def encode_gif(indices: np.ndarray, palette: np.ndarray) -> bytes:
    """((H, W) uint8 index plane, (n≤256, 3) uint8 palette) → GIF89a
    bytes (single image, global color table, non-interlaced,
    deterministic)."""
    h, w = indices.shape
    n = len(palette)
    if n > 256:
        raise ValueError("GIF palette holds at most 256 colors")
    if indices.max(initial=0) >= n:
        raise ValueError("index plane references colors beyond the palette")
    # global color table size = 2^(k+1) ≥ n, k in 0..7
    k = max(1, int(n - 1).bit_length()) - 1 if n > 1 else 0
    while (2 << k) < n:
        k += 1
    gct = np.zeros((2 << k, 3), dtype=np.uint8)
    gct[:n] = palette
    out = bytearray(b"GIF89a")
    # logical screen descriptor: dims, GCT flag + color resolution + size
    out += struct.pack("<HHBBB", w, h, 0x80 | (7 << 4) | k, 0, 0)
    out += gct.tobytes()
    out += struct.pack("<BHHHHB", 0x2C, 0, 0, w, h, 0)  # image descriptor
    mcs = max(2, k + 1)  # LZW min code size must cover the palette, ≥2
    out.append(mcs)
    lzw = _lzw_encode(indices, mcs)
    for i in range(0, len(lzw), 255):  # data sub-blocks
        block = lzw[i : i + 255]
        out.append(len(block))
        out += block
    out += b"\x00\x3b"  # block terminator + trailer
    return bytes(out)


@strict_decoder("GIF")
def decode_gif(data: bytes) -> tuple[np.ndarray, np.ndarray]:
    """GIF bytes → ((H, W) uint8 index plane, (n, 3) uint8 palette)."""
    if not sniff_gif(data):
        raise ValueError("not a GIF stream")
    w, h, packed, _bg, _ar = struct.unpack_from("<HHBBB", data, 6)
    pos = 13
    palette = None
    if packed & 0x80:
        size = 2 << (packed & 0x07)
        palette = np.frombuffer(data[pos : pos + size * 3], dtype=np.uint8)
        palette = palette.reshape(size, 3).copy()
        pos += size * 3
    while pos < len(data):
        block = data[pos]
        if block == 0x21:  # extension: label + sub-blocks, skip
            pos += 2
            while data[pos]:
                pos += 1 + data[pos]
            pos += 1
        elif block == 0x2C:  # image descriptor
            _l, _t, iw, ih, ipacked = struct.unpack_from("<HHHHB", data, pos + 1)
            pos += 10
            check_dims("GIF", iw, ih, channels=1)
            if ipacked & 0x40:
                raise ValueError("interlaced GIF unsupported")
            if ipacked & 0x80:  # local color table overrides global
                size = 2 << (ipacked & 0x07)
                palette = np.frombuffer(
                    data[pos : pos + size * 3], dtype=np.uint8
                ).reshape(size, 3).copy()
                pos += size * 3
            mcs = data[pos]
            pos += 1
            lzw = bytearray()
            while data[pos]:
                n = data[pos]
                lzw += data[pos + 1 : pos + 1 + n]
                pos += 1 + n
            pos += 1
            if palette is None:
                raise ValueError("GIF image has no color table")
            idx = _lzw_decode(bytes(lzw), mcs, iw * ih).reshape(ih, iw)
            # single-image scope: ignore anything after the first frame
            return idx, palette
        elif block == 0x3B:  # trailer
            break
        else:
            raise ValueError(f"unknown GIF block 0x{block:02X}")
    raise ValueError("GIF contains no image data")


def encode_gif_rgb(img: np.ndarray) -> bytes:
    """(H, W, 3) uint8 RGB with ≤256 distinct colors → GIF bytes.
    Palette order is the lexicographic unique-color order, so the byte
    stream is deterministic."""
    h, w, c = img.shape
    if c != 3:
        raise ValueError("encode_gif_rgb needs (H, W, 3) RGB")
    flat = img.reshape(-1, 3)
    palette, inverse = np.unique(flat, axis=0, return_inverse=True)
    if len(palette) > 256:
        raise ValueError(
            f"image has {len(palette)} distinct colors; GIF holds ≤256"
        )
    return encode_gif(
        inverse.astype(np.uint8).reshape(h, w), palette.astype(np.uint8)
    )


def decode_gif_rgb(data: bytes) -> np.ndarray:
    """GIF bytes → (H, W, 3) uint8 RGB via palette lookup."""
    idx, palette = decode_gif(data)
    return palette[idx]
