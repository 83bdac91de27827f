"""RIFF/WAVE codec round trips (pure-python, no Spark)."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from duckpipe_spark.functions.wav import decode_wav, encode_wav_pcm16


def test_pcm16_round_trip_mono_and_stereo():
    rng = np.random.default_rng(7)
    for ch in (1, 2):
        s = rng.integers(-32768, 32767, size=(200, ch), dtype=np.int16)
        arr, rate = decode_wav(encode_wav_pcm16(s, 22_050))
        assert rate == 22_050
        assert arr.shape == (200, ch)
        np.testing.assert_array_equal((arr * 32768.0).astype(np.int16), s)


def test_constant_rms_is_exact():
    """The analytic-oracle property: constant v -> rms == |v|/32768 with
    NO float error (see audio_decode_wav's derivation)."""
    for v in (-1000, -1, 0, 1, 777, 32767):
        s = np.full((137, 2), v, dtype=np.int16)
        arr, _ = decode_wav(encode_wav_pcm16(s))
        rms = float(np.sqrt((arr**2).mean()))
        assert rms == abs(v) / 32768.0


def test_8bit_and_24bit_and_float_paths():
    # hand-build an 8-bit mono WAV: values 0..255 map to [-1, 1)
    def wav(tag, ch, rate, bits, payload):
        fmt = struct.pack("<HHIIHH", tag, ch, rate, rate * ch * bits // 8, ch * bits // 8, bits)
        out = b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(payload)) + b"WAVE"
        out += b"fmt " + struct.pack("<I", len(fmt)) + fmt
        out += b"data" + struct.pack("<I", len(payload)) + payload
        return out

    arr, rate = decode_wav(wav(1, 1, 8000, 8, bytes([128, 0, 255])))
    assert rate == 8000
    np.testing.assert_allclose(arr[:, 0], [0.0, -1.0, 127 / 128])
    # 24-bit: 0x000001 = 1/2^23; 0xFFFFFF = -1/2^23
    arr, _ = decode_wav(wav(1, 1, 8000, 24, b"\x01\x00\x00\xff\xff\xff"))
    np.testing.assert_allclose(arr[:, 0], [1 / (1 << 23), -1 / (1 << 23)])
    # float32 passthrough
    arr, _ = decode_wav(wav(3, 1, 8000, 32, np.array([0.5, -0.25], "<f4").tobytes()))
    np.testing.assert_allclose(arr[:, 0], [0.5, -0.25])


def test_rejects_outside_subset():
    with pytest.raises(ValueError, match="RIFF"):
        decode_wav(b"\xff\xd8\xffnot a wav")
    # MP3-in-WAV (format tag 85) is the external-codec plug point
    fmt = struct.pack("<HHIIHH", 85, 1, 8000, 8000, 1, 16)
    blob = (
        b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8) + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", 0)
    )
    with pytest.raises(ValueError, match="external codec"):
        decode_wav(blob)


def test_word_alignment_of_odd_chunks():
    """An odd-sized chunk before data must be skipped with its pad byte."""
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    payload = np.array([1234, -1234], "<i2").tobytes()
    blob = (
        b"RIFF" + struct.pack("<I", 99) + b"WAVE"
        + b"LIST" + struct.pack("<I", 3) + b"abc\x00"  # odd chunk + pad
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(payload)) + payload
    )
    arr, _ = decode_wav(blob)
    np.testing.assert_array_equal((arr[:, 0] * 32768).astype(np.int16), [1234, -1234])


def test_fuzz_decoder_never_crashes():
    """Arbitrary bytes and single-byte corruptions of a valid stream must
    raise ValueError (or decode) — never hang or crash."""
    from hypothesis import given, settings, strategies as st

    valid = encode_wav_pcm16(np.arange(-50, 50, dtype=np.int16), 8000)

    @settings(max_examples=150, deadline=2000)
    @given(st.binary(min_size=0, max_size=300))
    def fuzz_raw(data):
        try:
            decode_wav(data)
        except (ValueError, struct.error):
            pass

    @settings(max_examples=150, deadline=2000)
    @given(st.integers(0, len(valid) - 1), st.integers(0, 255))
    def fuzz_corrupt(pos, byte):
        try:
            decode_wav(valid[:pos] + bytes([byte]) + valid[pos + 1 :])
        except (ValueError, struct.error):
            pass

    fuzz_raw()
    fuzz_corrupt()


def test_zero_sample_rate_rejected_not_zerodivision():
    """ADVICE r5: a parseable WAV with rate=0 must raise ValueError, not
    reach decode_audio's duration division as a ZeroDivisionError."""
    fmt = struct.pack("<HHIIHH", 1, 1, 0, 0, 2, 16)
    payload = np.array([1, 2], "<i2").tobytes()
    blob = (
        b"RIFF" + struct.pack("<I", 99) + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(payload)) + payload
    )
    with pytest.raises(ValueError, match="sample rate"):
        decode_wav(blob)


def test_mulaw_codec_conformance():
    """G.711 mu-law (r12): E(D(c)) == c for all codes except the spec's
    negative-zero (0x7F -> -0 == +0 -> 0xFF); D(E(v)) is idempotent on
    the expansion grid; quantization error is bounded by half the top
    segment step; full-scale values clip to 32635 before encoding."""
    import numpy as np

    from duckpipe_spark.functions.wav import mulaw_decode, mulaw_encode

    codes = np.arange(256, dtype=np.uint8)
    re = mulaw_encode(mulaw_decode(codes))
    mism = np.where(re != codes)[0]
    assert list(mism) == [0x7F]  # negative zero, the documented exception
    assert mulaw_decode(np.array([0x7F], dtype=np.uint8))[0] == 0

    rng = np.random.default_rng(3)
    v = rng.integers(-32768, 32768, 50_000).astype(np.int16)
    v2 = mulaw_decode(mulaw_encode(v))
    # idempotent on the grid: re-coding a decoded value is lossless
    assert (mulaw_decode(mulaw_encode(v2)) == v2).all()
    clipped = np.clip(v.astype(np.int64), -32635, 32635)
    err = np.abs(v2.astype(np.int64) - clipped)
    assert err.max() <= 512  # half of the top segment's 1024 step + bias slack


def test_mulaw_wav_roundtrip_through_decode_wav():
    """encode_wav_mulaw -> decode_wav lands on the exact 16-bit grid
    (rint(x*32768) recovers mulaw_decode's integers bit-for-bit), stereo
    interleave and sample rate survive."""
    import numpy as np

    from duckpipe_spark.functions.wav import (
        decode_wav,
        encode_wav_mulaw,
        mulaw_decode,
        mulaw_encode,
    )

    rng = np.random.default_rng(5)
    v = rng.integers(-30000, 30000, (500, 2)).astype(np.int16)
    blob = encode_wav_mulaw(v, 22_050)
    arr, rate = decode_wav(blob)
    assert rate == 22_050 and arr.shape == (500, 2)
    rec = np.rint(arr * 32768.0).astype(np.int64)
    want = mulaw_decode(mulaw_encode(v.ravel())).reshape(500, 2).astype(np.int64)
    assert (rec == want).all()


def test_alaw_codec_conformance():
    """G.711 A-law (r12): E(D(c)) == c for ALL 256 codes (A-law has no
    negative-zero ambiguity), expansion range is the spec's ±32256,
    idempotent on the grid, and decode_wav handles tag 6 on the exact
    16-bit grid."""
    import numpy as np

    from duckpipe_spark.functions.wav import (
        alaw_decode,
        alaw_encode,
        decode_wav,
        encode_wav_alaw,
    )

    codes = np.arange(256, dtype=np.uint8)
    dec = alaw_decode(codes)
    assert (alaw_encode(dec) == codes).all()
    assert dec.min() == -32256 and dec.max() == 32256

    rng = np.random.default_rng(7)
    v = rng.integers(-32768, 32768, 50_000).astype(np.int16)
    v2 = alaw_decode(alaw_encode(v))
    assert (alaw_decode(alaw_encode(v2)) == v2).all()
    assert np.abs(v2.astype(np.int64) - v.astype(np.int64)).max() <= 512

    blob = encode_wav_alaw(v[:300], 8_000)
    arr, rate = decode_wav(blob)
    assert rate == 8_000
    rec = np.rint(arr * 32768.0).astype(np.int64).ravel()
    assert (rec == v2[:300].astype(np.int64)).all()
