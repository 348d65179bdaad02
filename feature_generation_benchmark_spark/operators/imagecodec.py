"""Pure-numpy image codec for the library-free formats — uncompressed
24-bit BMP (BITMAPINFOHEADER, BI_RGB), binary PPM (P6), and 8-bit
truecolor PNG (RFC 2083 — DEFLATE via the stdlib ``zlib``).

All three formats are fully public specifications (BMP: Windows
device-independent bitmap layout; PPM: netpbm; PNG: RFC 2083 /
ISO 15948). None needs an external codec library — PNG's only
compression is zlib, which ships with CPython — so the multimodal
``decoder="real"`` path can ACTUALLY decode, resize, and re-encode them
in this container. Baseline JPEG (ITU-T T.81) lives in the sibling
``operators/jpegcodec.py`` (pure numpy DCT + Huffman) and dispatches
through :func:`decode_image`/:func:`encode_image` here; uncompressed
AVI video and WAV audio in ``operators/avicodec.py`` / below. Formats
that genuinely require external libraries (compressed video, MP3/AAC)
still raise the documented ``NotImplementedError`` at the same call
sites.

Everything is vectorized numpy — these run inside Arrow-batched
``mapInPandas`` workers, so per-pixel Python loops are never acceptable
on the paths our encoder produces (PNG decode keeps a per-pixel inner
loop ONLY for the Average/Paeth filters foreign encoders may emit;
our encoder emits filter 0, whose decode is a pure memcpy).
"""

from __future__ import annotations

import functools
import struct
import zlib

import numpy as np

_BMP_HEADER_FMT = "<2sIHHI"  # magic, file size, res1, res2, pixel offset
_BMP_INFO_FMT = "<IiiHHIIiiII"  # BITMAPINFOHEADER

#: Decoded images larger than this (bytes) are rejected as malformed —
#: a corrupt 4-byte dimension field must not OOM a 100 TB worker.
MAX_DECODE_BYTES = 1 << 26  # 64 MiB


def strict_decoder(fmt_name: str):
    """Wrap a decode function so malformed input ALWAYS surfaces as
    ``ValueError`` naming the format — never a raw ``struct.error`` /
    ``IndexError`` / ``zlib.error``. Decoders parse untrusted blobs in
    Arrow-batched workers; at corpus scale corrupt bytes are routine
    and a named error is the difference between a filterable row and
    an opaque worker crash."""

    def deco(fn):
        @functools.wraps(fn)
        def wrap(*args, **kwargs):
            try:
                return fn(*args, **kwargs)
            except (struct.error, IndexError, zlib.error) as e:
                raise ValueError(f"malformed {fmt_name} stream: {e}") from e

        return wrap

    return deco


def check_dims(fmt_name: str, *dims: int, channels: int = 3) -> None:
    """Reject non-positive or implausibly large header dimensions
    BEFORE allocating (product capped at MAX_DECODE_BYTES)."""
    total = channels
    for d in dims:
        if d <= 0:
            raise ValueError(f"malformed {fmt_name} stream: dimension {d}")
        total *= d
    if total > MAX_DECODE_BYTES:
        raise ValueError(
            f"malformed {fmt_name} stream: implausible dimensions {dims}"
        )


_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def sniff_format(data: bytes) -> str | None:
    """'bmp' | 'ppm' | 'png' | 'jpeg' for the formats the real codecs
    handle, else None."""
    if data[:2] == b"BM":
        return "bmp"
    if data[:2] == b"P6":
        return "ppm"
    if data[:8] == _PNG_MAGIC:
        return "png"
    if data[:2] == b"\xff\xd8":
        return "jpeg"
    if data[:6] in (b"GIF87a", b"GIF89a"):
        return "gif"
    return None


@strict_decoder("BMP")
def decode_bmp(data: bytes) -> np.ndarray:
    """Uncompressed 24-bit BI_RGB BMP → (H, W, 3) uint8 RGB array.

    Handles bottom-up (positive height, the common case) and top-down
    (negative height) layouts, and the 4-byte row padding the format
    mandates. Anything else (compression, other bit depths) raises
    ValueError — those variants need a real library."""
    if data[:2] != b"BM":
        raise ValueError("not a BMP stream")
    _, _, _, _, pix_off = struct.unpack_from(_BMP_HEADER_FMT, data, 0)
    (
        hdr_size,
        width,
        height,
        _planes,
        bpp,
        compression,
        _img_size,
        _xppm,
        _yppm,
        _clr_used,
        _clr_imp,
    ) = struct.unpack_from(_BMP_INFO_FMT, data, 14)
    if hdr_size < 40 or bpp != 24 or compression != 0:
        raise ValueError(
            f"unsupported BMP variant (hdr={hdr_size}, bpp={bpp}, "
            f"compression={compression}); only uncompressed 24-bit BI_RGB"
        )
    top_down = height < 0
    height = abs(height)
    check_dims("BMP", width, height)
    row_bytes = (width * 3 + 3) & ~3  # rows pad to 4-byte boundaries
    end = pix_off + row_bytes * height
    raw = np.frombuffer(data[pix_off:end], dtype=np.uint8)
    rows = raw.reshape(height, row_bytes)[:, : width * 3]
    img = rows.reshape(height, width, 3)
    if not top_down:
        img = img[::-1]  # bottom-up storage → top-down array
    return img[..., ::-1].copy()  # BGR on disk → RGB


def encode_bmp(img: np.ndarray) -> bytes:
    """(H, W, 3) uint8 RGB array → uncompressed 24-bit BI_RGB BMP."""
    h, w, c = img.shape
    if c != 3:
        raise ValueError("encode_bmp needs (H, W, 3) RGB")
    row_bytes = (w * 3 + 3) & ~3
    rows = np.zeros((h, row_bytes), dtype=np.uint8)
    rows[:, : w * 3] = img[::-1, :, ::-1].reshape(h, w * 3)  # RGB→BGR, flip
    pix = rows.tobytes()
    pix_off = 14 + 40
    header = struct.pack(_BMP_HEADER_FMT, b"BM", pix_off + len(pix), 0, 0, pix_off)
    info = struct.pack(_BMP_INFO_FMT, 40, w, h, 1, 24, 0, len(pix), 2835, 2835, 0, 0)
    return header + info + pix


@strict_decoder("PPM")
def decode_ppm(data: bytes) -> np.ndarray:
    """Binary PPM (P6, maxval ≤ 255) → (H, W, 3) uint8 RGB array."""
    if data[:2] != b"P6":
        raise ValueError("not a P6 PPM stream")
    # header: magic, width, height, maxval as whitespace-separated tokens
    # (comments start with '#'); pixel data begins after ONE whitespace
    # byte following maxval
    pos = 2
    fields: list[int] = []
    while len(fields) < 3:
        while pos < len(data) and data[pos : pos + 1].isspace():
            pos += 1
        if data[pos : pos + 1] == b"#":
            while pos < len(data) and data[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(data) and not data[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(data[start:pos]))
    pos += 1  # the single whitespace after maxval
    w, h, maxval = fields
    check_dims("PPM", w, h)
    if maxval > 255:
        raise ValueError("16-bit PPM unsupported")
    raw = np.frombuffer(data[pos : pos + w * h * 3], dtype=np.uint8)
    return raw.reshape(h, w, 3).copy()


def encode_ppm(img: np.ndarray) -> bytes:
    """(H, W, 3) uint8 RGB array → binary PPM (P6)."""
    h, w, c = img.shape
    if c != 3:
        raise ValueError("encode_ppm needs (H, W, 3) RGB")
    return f"P6\n{w} {h}\n255\n".encode() + img.tobytes()


def _png_chunks(data: bytes):
    """Yield (type, body) for each chunk; stops at IEND. CRCs are
    verified — a silently corrupt IDAT would otherwise surface as a
    confusing zlib error (or worse, wrong pixels)."""
    pos = 8
    while pos + 8 <= len(data):
        (size,) = struct.unpack_from(">I", data, pos)
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + size]
        (crc,) = struct.unpack_from(">I", data, pos + 8 + size)
        if zlib.crc32(ctype + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {ctype!r} CRC mismatch")
        yield ctype, body
        if ctype == b"IEND":
            return
        pos += 12 + size
    raise ValueError("PNG truncated before IEND")


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


@strict_decoder("PNG")
def decode_png(data: bytes) -> np.ndarray:
    """8-bit truecolor PNG (color type 2 RGB or 6 RGBA, non-interlaced)
    → (H, W, 3) uint8 RGB array (alpha, if present, is dropped — this
    codec's consumers are RGB feature extractors). Filters 0-4 are all
    unfiltered per RFC 2083 §6; Sub/Up are vectorized, Average/Paeth
    (never emitted by :func:`encode_png`) fall back to a per-pixel loop
    for foreign files. Palette, 16-bit, grayscale and interlaced
    variants raise ValueError — decode fidelity over silent guessing."""
    if data[:8] != _PNG_MAGIC:
        raise ValueError("not a PNG stream")
    width = height = None
    channels = None
    idat = bytearray()
    for ctype, body in _png_chunks(data):
        if ctype == b"IHDR":
            width, height, depth, color, comp, filt, interlace = (
                struct.unpack(">IIBBBBB", body)
            )
            if depth != 8 or color not in (2, 6) or comp or filt or interlace:
                raise ValueError(
                    f"unsupported PNG variant (depth={depth}, color={color},"
                    f" interlace={interlace}); only 8-bit RGB/RGBA"
                    " non-interlaced"
                )
            channels = 3 if color == 2 else 4
            check_dims("PNG", width, height, channels=channels + 1)
        elif ctype == b"IDAT":
            idat += body
    if width is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    raw = zlib.decompress(bytes(idat))
    stride = width * channels
    if len(raw) != height * (stride + 1):
        raise ValueError("PNG pixel payload size mismatch")
    lines = np.frombuffer(raw, dtype=np.uint8).reshape(height, stride + 1)
    filters = lines[:, 0]
    out = np.zeros((height, stride), dtype=np.uint8)
    bpp = channels
    for y in range(height):
        f = int(filters[y])
        cur = lines[y, 1:].astype(np.int64)
        prev = out[y - 1].astype(np.int64) if y else np.zeros(stride, np.int64)
        if f == 0:  # None
            rec = cur
        elif f == 2:  # Up
            rec = cur + prev
        elif f == 1:  # Sub — per-byte-lane cumulative sum (mod 256)
            rec = cur.reshape(-1, bpp).cumsum(axis=0).reshape(-1)
        elif f in (3, 4):  # Average / Paeth — sequential by spec
            rec = np.zeros(stride, dtype=np.int64)
            for x in range(stride):
                a = rec[x - bpp] & 0xFF if x >= bpp else 0
                b = prev[x]
                if f == 3:
                    rec[x] = cur[x] + ((a + b) >> 1)
                else:
                    c = prev[x - bpp] if x >= bpp else 0
                    rec[x] = cur[x] + _paeth(int(a), int(b), int(c))
        else:
            raise ValueError(f"invalid PNG filter {f}")
        out[y] = rec & 0xFF
    img = out.reshape(height, width, channels)
    return img[..., :3].copy()


def encode_png(img: np.ndarray) -> bytes:
    """(H, W, 3) uint8 RGB array → 8-bit truecolor non-interlaced PNG.
    Every scanline uses filter 0 (None): DEFLATE alone compresses our
    synthetic fixtures fine, decode of our own files stays a pure
    vectorized copy, and the byte stream is deterministic (fixed zlib
    level, no heuristic filter search)."""
    h, w, c = img.shape
    if c != 3:
        raise ValueError("encode_png needs (H, W, 3) RGB")
    lines = np.zeros((h, 1 + w * 3), dtype=np.uint8)
    lines[:, 1:] = img.reshape(h, w * 3)
    payload = zlib.compress(lines.tobytes(), 6)

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        _PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", payload)
        + chunk(b"IEND", b"")
    )


def decode_image(data: bytes) -> tuple[np.ndarray, str]:
    """Decode any supported format; returns (array, format)."""
    fmt = sniff_format(data)
    if fmt == "bmp":
        return decode_bmp(data), "bmp"
    if fmt == "ppm":
        return decode_ppm(data), "ppm"
    if fmt == "png":
        return decode_png(data), "png"
    if fmt == "jpeg":
        from feature_generation_benchmark_spark.operators.jpegcodec import (
            decode_jpeg,
        )

        return decode_jpeg(data), "jpeg"
    if fmt == "gif":
        from feature_generation_benchmark_spark.operators.gifcodec import (
            decode_gif_rgb,
        )

        return decode_gif_rgb(data), "gif"
    raise NotImplementedError(
        "only BMP, binary PPM, 8-bit truecolor PNG, baseline JPEG and "
        "single-frame GIF decode without codec libraries; plug "
        "PIL/ffmpeg here for other formats"
    )


def encode_image(img: np.ndarray, fmt: str) -> bytes:
    if fmt == "bmp":
        return encode_bmp(img)
    if fmt == "ppm":
        return encode_ppm(img)
    if fmt == "png":
        return encode_png(img)
    if fmt == "jpeg":
        from feature_generation_benchmark_spark.operators.jpegcodec import (
            encode_jpeg,
        )

        return encode_jpeg(img)
    if fmt == "gif":
        from feature_generation_benchmark_spark.operators.gifcodec import (
            encode_gif_rgb,
        )

        return encode_gif_rgb(img)
    raise NotImplementedError(f"cannot encode {fmt!r} without codec libraries")


def resize_nearest(img: np.ndarray, target_w: int, target_h: int) -> np.ndarray:
    """Nearest-neighbor resize via integer index maps (pure numpy — two
    fancy-index gathers, no Python per-pixel work). Uses the standard
    pixel-center mapping src = floor((dst + 0.5) * scale)."""
    h, w = img.shape[:2]
    rows = np.minimum(
        ((np.arange(target_h) + 0.5) * (h / target_h)).astype(np.int64), h - 1
    )
    cols = np.minimum(
        ((np.arange(target_w) + 0.5) * (w / target_w)).astype(np.int64), w - 1
    )
    return img[rows][:, cols]


def resize_area(img: np.ndarray, fx: int, fy: int) -> np.ndarray:
    """Integer-factor box-mean downsample (the antialiased reduction
    vision pipelines use; cv2's INTER_AREA for integer factors). Each
    output pixel is the FLOOR of the mean of its fy×fx source block —
    pure integer arithmetic, so the oracle-gated registry entry can
    replay it exactly in SQL. Requires dims divisible by the factors
    (named error otherwise: silent cropping would corrupt parity)."""
    h, w = img.shape[:2]
    if h % fy or w % fx:
        raise ValueError(
            f"resize_area needs dims divisible by factors: {(h, w)} vs "
            f"(fy={fy}, fx={fx})"
        )
    blocks = img.reshape(h // fy, fy, w // fx, fx, -1).astype(np.int64)
    return (blocks.sum(axis=(1, 3)) // (fx * fy)).astype(np.uint8)


def resize_bilinear(img: np.ndarray, target_w: int, target_h: int) -> np.ndarray:
    """Bilinear resize with the standard pixel-center mapping
    (src = (dst + 0.5)·scale − 0.5, edges clamped) — the general-ratio
    companion to :func:`resize_nearest`; vectorized gathers + lerps."""
    h, w = img.shape[:2]
    ys = np.clip((np.arange(target_h) + 0.5) * (h / target_h) - 0.5, 0, h - 1)
    xs = np.clip((np.arange(target_w) + 0.5) * (w / target_w) - 0.5, 0, w - 1)
    y0 = np.floor(ys).astype(np.int64)
    x0 = np.floor(xs).astype(np.int64)
    y1 = np.minimum(y0 + 1, h - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    wy = (ys - y0)[:, None, None]
    wx = (xs - x0)[None, :, None]
    f = img.astype(np.float64)
    top = f[y0][:, x0] * (1 - wx) + f[y0][:, x1] * wx
    bot = f[y1][:, x0] * (1 - wx) + f[y1][:, x1] * wx
    out = top * (1 - wy) + bot * wy
    return np.clip(np.round(out), 0, 255).astype(np.uint8)


def image_features(img: np.ndarray) -> list[float]:
    """8-dim feature vector from a decoded image: per-channel means and
    stds (e6-rounded for cross-run stability) + normalized dims."""
    f = img.reshape(-1, 3).astype(np.float64) / 255.0
    means = f.mean(axis=0)
    stds = f.std(axis=0)
    h, w = img.shape[:2]
    vec = [*means, *stds, w / 4096.0, h / 4096.0]
    return [round(float(v), 6) for v in vec]


# --- WAV (RIFF PCM) — the library-free audio format ---------------------

def sniff_wav(data: bytes) -> bool:
    return data[:4] == b"RIFF" and data[8:12] == b"WAVE"


@strict_decoder("WAV")
def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE PCM (8/16-bit integer) or G.711 companded (format tag
    7 = μ-law, 6 = A-law; ``operators/g711.py``) → ((n_samples,
    n_channels) float64 array in [-1, 1], sample_rate). Walks the chunk
    list properly (fmt/data need not be adjacent; chunks pad to even
    sizes). Other compressed or float WAV variants raise ValueError —
    those need a real library."""
    if not sniff_wav(data):
        raise ValueError("not a RIFF/WAVE stream")
    pos = 12
    fmt = None
    pcm = None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        body = data[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            pcm = body
        pos += 8 + size + (size & 1)  # chunks pad to even byte counts
    if fmt is None or pcm is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_format, n_ch, rate, _byte_rate, _block, bits = fmt
    if audio_format == 6 or audio_format == 7:  # G.711 A-law / mu-law
        if bits != 8:
            raise ValueError(
                f"G.711 WAV must be 8-bit (format={audio_format}, "
                f"bits={bits})"
            )
        from feature_generation_benchmark_spark.operators.g711 import (
            alaw_decode,
            mulaw_decode,
        )

        codes = np.frombuffer(pcm, dtype=np.uint8)
        dec = mulaw_decode(codes) if audio_format == 7 else alaw_decode(codes)
        scaled = dec.astype(np.float64) / 32768.0
    elif audio_format != 1 or bits not in (8, 16):
        raise ValueError(
            f"unsupported WAV variant (format={audio_format}, bits={bits});"
            " only integer PCM 8/16-bit and G.711 mu-law/A-law"
        )
    elif bits == 16:
        raw = np.frombuffer(pcm, dtype="<i2")
        scaled = raw.astype(np.float64) / 32768.0
    else:  # 8-bit WAV is UNSIGNED with a 128 midpoint, per the format
        raw = np.frombuffer(pcm, dtype=np.uint8)
        scaled = (raw.astype(np.float64) - 128.0) / 128.0
    n = len(scaled) - len(scaled) % n_ch
    return scaled[:n].reshape(-1, n_ch), rate


def encode_wav(samples: np.ndarray, rate: int) -> bytes:
    """(n_samples, n_channels) float array in [-1, 1] → 16-bit PCM WAV."""
    if samples.ndim == 1:
        samples = samples[:, None]
    n_ch = samples.shape[1]
    pcm = (
        np.clip(samples, -1.0, 1.0) * 32767.0
    ).round().astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, n_ch, rate, rate * n_ch * 2, n_ch * 2, 16)
    chunks = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(pcm)) + pcm
    )
    return b"RIFF" + struct.pack("<I", len(chunks)) + chunks


def encode_wav_g711(codes: np.ndarray, rate: int, law: str = "mulaw") -> bytes:
    """(N,) uint8 G.711 codes → single-channel companded WAV (format
    tag 7 for μ-law, 6 for A-law, 8 bits/sample)."""
    if law == "mulaw":
        tag = 7
    elif law == "alaw":
        tag = 6
    else:
        raise ValueError(f"law must be 'mulaw' or 'alaw', got {law!r}")
    pcm = codes.astype(np.uint8).tobytes()
    fmt = struct.pack("<HHIIHH", tag, 1, rate, rate, 1, 8)
    chunks = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(pcm)) + pcm
    )
    if len(pcm) & 1:
        chunks += b"\x00"  # RIFF chunks pad to even byte counts
    return b"RIFF" + struct.pack("<I", len(chunks)) + chunks


def audio_features(samples: np.ndarray, rate: int) -> list[float]:
    """8-dim audio features: duration, RMS, peak, zero-crossing rate,
    per-channel count, rate (scaled), DC offset, crest proxy."""
    mono = samples.mean(axis=1)
    n = max(len(mono), 1)
    rms = float(np.sqrt((mono**2).mean())) if len(mono) else 0.0
    peak = float(np.abs(mono).max()) if len(mono) else 0.0
    zc = float((np.diff(np.signbit(mono)) != 0).sum() / n) if len(mono) > 1 else 0.0
    vec = [
        n / max(rate, 1),            # duration sec
        rms,
        peak,
        zc,
        samples.shape[1] / 8.0,      # channels, normalized
        rate / 96000.0,              # sample rate, normalized
        float(mono.mean()),          # DC offset
        peak / rms if rms > 0 else 0.0,  # crest factor
    ]
    return [round(float(v), 6) for v in vec]
