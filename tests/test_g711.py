"""G.711 mu-law/A-law companding (operators/g711.py) + companded WAV."""

from __future__ import annotations

import numpy as np
import pytest

from feature_generation_benchmark_spark.operators.g711 import (
    ALAW_DECODE_SQL,
    MULAW_DECODE_SQL,
    alaw_decode,
    alaw_encode,
    mulaw_decode,
    mulaw_encode,
)
from feature_generation_benchmark_spark.operators.imagecodec import (
    decode_wav,
    encode_wav_g711,
)


def test_mulaw_code_identity():
    """encode(decode(c)) == c for every code except 0x7F (negative
    zero), which canonically re-encodes as 0xFF — the documented G.711
    ±0 collapse."""
    codes = np.arange(256, dtype=np.uint8)
    re = mulaw_encode(mulaw_decode(codes))
    bad = np.nonzero(re != codes)[0]
    assert list(bad) == [0x7F]
    assert re[0x7F] == 0xFF
    assert mulaw_decode(np.array([0x7F], np.uint8))[0] == 0
    assert mulaw_decode(np.array([0xFF], np.uint8))[0] == 0


def test_alaw_code_identity_all_256():
    codes = np.arange(256, dtype=np.uint8)
    assert np.array_equal(alaw_encode(alaw_decode(codes)), codes)


def test_known_extreme_values():
    """The canonical G.711 extremes: mu-law ±32124, A-law ±32256."""
    md = mulaw_decode(np.arange(256, dtype=np.uint8))
    assert md.min() == -32124 and md.max() == 32124
    ad = alaw_decode(np.arange(256, dtype=np.uint8))
    assert ad.min() == -32256 and ad.max() == 32256


def test_encode_monotone_quantization():
    """Companding must be monotone: larger PCM magnitude never maps to
    a smaller decoded magnitude after a roundtrip."""
    pcm = np.linspace(-32768, 32767, 4001).astype(np.int16)
    for enc, dec in ((mulaw_encode, mulaw_decode), (alaw_encode, alaw_decode)):
        out = dec(enc(pcm)).astype(np.int64)
        assert (np.diff(out) >= 0).all()


def test_sql_twin_parity_all_codes():
    """The DuckDB formulas are single-sourced here — they must agree
    with numpy on every one of the 256 codes (this is what makes the
    multimodal_real_audio_stats hash gate sound)."""
    duckdb = pytest.importorskip("duckdb")
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT i, {MULAW_DECODE_SQL.format(b='i')} AS mu, "
        f"{ALAW_DECODE_SQL.format(b='i')} AS al "
        "FROM range(256) t(i) ORDER BY i"
    ).fetchall()
    codes = np.arange(256, dtype=np.uint8)
    assert np.array_equal(
        np.array([r[1] for r in rows]), mulaw_decode(codes).astype(np.int64)
    )
    assert np.array_equal(
        np.array([r[2] for r in rows]), alaw_decode(codes).astype(np.int64)
    )


@pytest.mark.parametrize("law,tag", [("mulaw", 7), ("alaw", 6)])
def test_companded_wav_container_roundtrip(law, tag):
    rng = np.random.default_rng(17)
    codes = rng.integers(0, 256, 777, dtype=np.uint8)  # odd → pad byte
    data = encode_wav_g711(codes, 8000, law)
    assert data[20] == tag  # format tag in the fmt chunk
    samples, rate = decode_wav(data)
    assert rate == 8000 and samples.shape == (777, 1)
    dec = mulaw_decode(codes) if law == "mulaw" else alaw_decode(codes)
    assert np.array_equal(samples[:, 0] * 32768.0, dec.astype(np.float64))


def test_g711_wav_named_errors():
    with pytest.raises(ValueError, match="law"):
        encode_wav_g711(np.zeros(4, np.uint8), 8000, "opus")
    # a 16-bit G.711 fmt chunk is malformed
    data = bytearray(encode_wav_g711(np.zeros(4, np.uint8), 8000, "mulaw"))
    data[34] = 16  # bits/sample field
    with pytest.raises(ValueError, match="8-bit"):
        decode_wav(bytes(data))
