"""Pure-numpy AVI video container codec (uncompressed 24-bit DIB frames).

Closes the "real video decode" edge flagged in round-6 review: the
frame-sampling path previously ran only on the deterministic fake
decoder because no video library ships in this container — but the AVI
container itself (Microsoft RIFF, fully public: the 'AVI ' form with
``hdrl``/``movi`` lists and ``00db`` device-independent-bitmap frame
chunks) needs nothing beyond struct packing, and uncompressed 24-bit
DIB frames reuse exactly the BMP pixel layout (bottom-up rows, BGR,
4-byte row padding) the BMP codec already handles.

Scope, honest and named like the other real codecs:

* ``encode_avi``: 'AVI ' RIFF with one video stream ('vids'), ``idx1``
  index, deterministic bytes (fixed header fields, no padding
  heuristics). ``codec="DIB "`` (default) writes uncompressed ``00db``
  frames; ``codec="MJPG"`` writes one baseline JPEG per ``00dc`` chunk
  (Motion-JPEG, the classic camera format — REAL compressed video,
  powered by ``operators/jpegcodec.py``).
* ``decode_avi``: walks the RIFF tree properly (nested LISTs, even-byte
  chunk padding), reads dims/compression from ``strf``
  (BITMAPINFOHEADER) and fps from ``strh``; decodes biCompression=0
  24-bpp DIB frames and fourcc-'MJPG' JPEG frames — other codecs
  (H.264 …) raise ValueError by name, that's what ffmpeg is for.

Decode of our own encode is pixel-exact (the DIB layout is lossless),
so the oracle-gated registry entry (workloads/multimodal.py) can gate
REAL frame sampling with exact cross-engine sums, same as the
BMP→PPM→PNG chain.

Runs inside Arrow-batched ``mapInPandas`` workers; all pixel work is
vectorized numpy (frame packing is one reshape + flip per frame).
"""

from __future__ import annotations

import struct

import numpy as np

from feature_generation_benchmark_spark.operators.imagecodec import (
    check_dims,
    strict_decoder,
)


def sniff_avi(data: bytes) -> bool:
    return data[:4] == b"RIFF" and data[8:12] == b"AVI "


def _row_bytes(w: int) -> int:
    return (w * 3 + 3) & ~3  # DIB rows pad to 4-byte boundaries


def _dib_from_frame(frame: np.ndarray) -> bytes:
    """(H, W, 3) uint8 RGB → bottom-up BGR padded DIB pixel bytes."""
    h, w, _ = frame.shape
    rows = np.zeros((h, _row_bytes(w)), dtype=np.uint8)
    rows[:, : w * 3] = frame[::-1, :, ::-1].reshape(h, w * 3)
    return rows.tobytes()


def _frame_from_dib(
    body: bytes, w: int, h: int, top_down: bool = False
) -> np.ndarray:
    rows = np.frombuffer(body, dtype=np.uint8).reshape(h, _row_bytes(w))
    img = rows[:, : w * 3].reshape(h, w, 3)
    if not top_down:  # bottom-up storage (positive biHeight, the norm)
        img = img[::-1]
    return img[..., ::-1].copy()  # BGR on disk → RGB


def encode_avi(
    frames: np.ndarray,
    fps: int = 10,
    codec: str = "DIB ",
    quality: int = 90,
) -> bytes:
    """(N, H, W, 3) uint8 RGB frame stack → AVI bytes. ``codec``:
    'DIB ' (uncompressed, lossless) or 'MJPG' (one baseline JPEG per
    frame at ``quality``; q100 inherits the JPEG codec's provable
    error bound)."""
    if frames.ndim != 4 or frames.shape[3] != 3:
        raise ValueError("encode_avi needs (N, H, W, 3) RGB frames")
    if codec not in ("DIB ", "MJPG"):
        raise ValueError(f"codec must be 'DIB ' or 'MJPG', got {codec!r}")
    n, h, w, _ = frames.shape
    if codec == "MJPG":
        from feature_generation_benchmark_spark.operators.jpegcodec import (
            encode_jpeg,
        )

        payloads = [encode_jpeg(f, quality=quality) for f in frames]
        frame_bytes = max(len(p) for p in payloads)
    else:
        payloads = None
        frame_bytes = _row_bytes(w) * h

    def chunk(cid: bytes, body: bytes) -> bytes:
        pad = b"\x00" if len(body) & 1 else b""
        return cid + struct.pack("<I", len(body)) + body + pad

    def lst(form: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", form + body)

    # avih: MainAVIHeader (microsec/frame, rates, counts, dims)
    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        1_000_000 // fps,          # dwMicroSecPerFrame
        frame_bytes * fps,         # dwMaxBytesPerSec
        0,                         # dwPaddingGranularity
        0x10,                      # dwFlags: AVIF_HASINDEX
        n,                         # dwTotalFrames
        0,                         # dwInitialFrames
        1,                         # dwStreams
        frame_bytes,               # dwSuggestedBufferSize
        w, h, 0, 0, 0, 0,          # dims + reserved
    )
    # strh: AVIStreamHeader for the video stream
    strh = (
        b"vids" + codec.encode("ascii") + struct.pack(
            "<IHHIIIIIIIIhhhh",
            0, 0, 0,               # flags, priority, language
            0,                     # initial frames
            1, fps,                # scale, rate → fps
            0, n,                  # start, length (frames)
            frame_bytes,           # suggested buffer size
            0xFFFFFFFF,            # quality (-1: default)
            0,                     # sample size (0: one chunk = one frame)
            0, 0, int(w), int(h),  # rcFrame
        )
    )
    # strf: BITMAPINFOHEADER — biCompression 0 (BI_RGB) or the fourcc
    bi_comp = 0 if codec == "DIB " else int.from_bytes(b"MJPG", "little")
    strf = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, bi_comp, frame_bytes, 2835, 2835, 0, 0
    )
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    cid = b"00db" if codec == "DIB " else b"00dc"
    bodies = (
        [_dib_from_frame(f) for f in frames] if payloads is None else payloads
    )
    movi_frames = [chunk(cid, b) for b in bodies]
    movi = lst(b"movi", b"".join(movi_frames))
    # idx1: one entry per frame (chunk id, flags=KEYFRAME, offset, size)
    idx = bytearray()
    off = 4  # offsets count from the start of the 'movi' list data
    for b in bodies:
        idx += cid + struct.pack("<III", 0x10, off, len(b))
        off += 8 + len(b) + (len(b) & 1)
    riff_body = b"AVI " + hdrl + movi + chunk(b"idx1", bytes(idx))
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


@strict_decoder("AVI")
def decode_avi(data: bytes) -> tuple[np.ndarray, int]:
    """Uncompressed AVI bytes → ((N, H, W, 3) uint8 RGB stack, fps)."""
    if not sniff_avi(data):
        raise ValueError("not a RIFF/AVI stream")
    w = h = None
    top_down = False
    mjpeg = False
    fps = 0
    frames: list[np.ndarray] = []

    def walk(pos: int, end: int) -> None:
        nonlocal w, h, top_down, mjpeg, fps
        while pos + 8 <= end:
            cid = data[pos : pos + 4]
            (size,) = struct.unpack_from("<I", data, pos + 4)
            body_start = pos + 8
            if cid == b"LIST":
                walk(body_start + 4, body_start + size)  # skip form type
            elif cid == b"strh":
                if data[body_start : body_start + 4] == b"vids":
                    scale, rate = struct.unpack_from(
                        "<II", data, body_start + 20
                    )
                    fps = rate // scale if scale else 0
            elif cid == b"strf" and w is None:
                (
                    _hdr,
                    bw,
                    bh,
                    _planes,
                    bpp,
                    compression,
                ) = struct.unpack_from("<IiiHHI", data, body_start)
                mjpg_fourcc = int.from_bytes(b"MJPG", "little")
                if compression == mjpg_fourcc:
                    mjpeg = True  # frames are whole baseline JPEGs
                elif bpp != 24 or compression != 0:
                    raise ValueError(
                        f"unsupported AVI codec (bpp={bpp}, "
                        f"compression=0x{compression:08X}); only "
                        "uncompressed 24-bit DIB and MJPG — plug "
                        "ffmpeg here"
                    )
                check_dims("AVI", bw, abs(bh) if bh else 0)
                w, h, top_down = bw, abs(bh), bh < 0
            elif cid in (b"00db", b"00dc"):
                if w is None:
                    raise ValueError("AVI frame chunk before strf header")
                body = data[body_start : body_start + size]
                if mjpeg:
                    from feature_generation_benchmark_spark.operators import (
                        jpegcodec,
                    )

                    frame = jpegcodec.decode_jpeg(body)
                    if frame.shape[:2] != (h, w):
                        raise ValueError(
                            f"MJPG frame dims {frame.shape[:2]} disagree "
                            f"with strf ({h}, {w})"
                        )
                    frames.append(frame)
                else:
                    frames.append(_frame_from_dib(body, w, h, top_down))
            pos = body_start + size + (size & 1)  # chunks pad to even

    walk(12, 8 + struct.unpack_from("<I", data, 4)[0])
    if w is None:
        raise ValueError("AVI missing strf stream format")
    if not frames:
        raise ValueError("AVI contains no frame chunks")
    return np.stack(frames), fps


def sample_frames(
    data: bytes, every_n: int
) -> list[tuple[int, np.ndarray]]:
    """Decode an AVI and return [(frame_idx, frame)] for frames
    0, every_n, 2·every_n, … — the real-codec counterpart of the
    stub-backed ``frame_sample_plan``."""
    frames, _fps = decode_avi(data)
    return [(i, frames[i]) for i in range(0, len(frames), every_n)]
