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


def test_adpcm_codec_conformance_vs_scalar_reference():
    """IMA ADPCM (r13): the vectorized block codec must agree sample-for-
    sample with an independent SCALAR transcription of the IMA spec's
    state machine (predictor + step index, clamps at ±32767/0..88),
    across waveform classes that stress every branch — the fixture-family
    quadratic-residue wave, a full-scale square wave (predictor clamps),
    a near-silent ramp (index pinned at 0), and a full-range
    pseudo-random stream — and across block geometries incl. a partial
    final block trimmed by the fact count."""
    import numpy as np

    from duckpipe_spark.functions.wav import (
        _IMA_ADJ,
        _IMA_STEPS,
        adpcm_decode,
        adpcm_encode_mono,
        decode_wav,
        encode_wav_adpcm,
    )

    def ref_codec(samples, spb):
        n = len(samples)
        out = []
        nblocks = (n + spb - 1) // spb
        padded = list(samples) + [samples[-1]] * (nblocks * spb - n)
        for b in range(nblocks):
            blk = padded[b * spb : (b + 1) * spb]
            pred, idx = int(blk[0]), 0
            out.append(pred)
            for s in blk[1:]:
                step = int(_IMA_STEPS[idx])
                delta = int(s) - pred
                code = 8 if delta < 0 else 0
                d = abs(delta)
                if d >= step:
                    code |= 4
                    d -= step
                if d >= step >> 1:
                    code |= 2
                    d -= step >> 1
                if d >= step >> 2:
                    code |= 1
                diff = step >> 3
                if code & 4:
                    diff += step
                if code & 2:
                    diff += step >> 1
                if code & 1:
                    diff += step >> 2
                pred = pred - diff if code & 8 else pred + diff
                pred = max(-32768, min(32767, pred))
                idx = max(0, min(88, idx + int(_IMA_ADJ[code & 7])))
                out.append(pred)
        return np.array(out[:n], dtype=np.int16)

    i = np.arange(1040, dtype=np.int64)
    seed = (7 * 1000003 + i + 1) % 1000000007
    qr = (
        (seed * seed % 1000000007 * 2654435761 % 1000000007) % 60000 - 30000
    ).astype(np.int16)
    square = np.array(
        [0, 32767, -32768, 32767, -32768, 0, 100, -100] * 130, np.int16
    )
    ramp = (np.arange(1040) % 7 - 3).astype(np.int16)
    rng = (np.arange(2000, dtype=np.int64) * 2654435761 % (1 << 16)) - 32768

    for s in (qr, square, ramp, rng.astype(np.int16)):
        for spb in (505, 9, 1025):
            block = 4 + (spb - 1) // 2
            data = adpcm_encode_mono(s, spb)
            got = adpcm_decode(data, 1, block, spb, total_samples=len(s)).ravel()
            ref = ref_codec(s, spb)
            assert np.array_equal(got, ref), (spb, int(np.argmax(got != ref)))
            frames, rate = decode_wav(encode_wav_adpcm(s, 8_000, spb))
            assert rate == 8_000 and frames.shape == (len(s), 1)
            ints = np.rint(frames.ravel() * 32768).astype(np.int64)
            assert np.array_equal(ints, ref.astype(np.int64))


def test_adpcm_stereo_decode_and_validation():
    """IMA ADPCM decode handles the spec's per-channel 4-byte-word
    interleave (headers per channel, then alternating nibble groups);
    the mono encoder rejects non-word-granular block sizes (spb must be
    8k+1 — the layout is 4-byte-word granular)."""
    import numpy as np
    import pytest

    from duckpipe_spark.functions.wav import (
        _IMA_ADJ,
        _IMA_STEPS,
        adpcm_decode,
        adpcm_encode_mono,
    )

    spb = 9
    a = (np.arange(25) * 311 % 2000 - 1000).astype(np.int16)
    b = (np.arange(25) * 157 % 1500 - 700).astype(np.int16)
    da = np.frombuffer(adpcm_encode_mono(a, spb), np.uint8).reshape(-1, 8)
    db = np.frombuffer(adpcm_encode_mono(b, spb), np.uint8).reshape(-1, 8)
    stereo = b"".join(
        bytes(ba[:4]) + bytes(bb[:4]) + bytes(ba[4:]) + bytes(bb[4:])
        for ba, bb in zip(da, db)
    )
    fr = adpcm_decode(stereo, 2, 16, spb, total_samples=25)
    mono_a = adpcm_decode(adpcm_encode_mono(a, spb), 1, 8, spb, total_samples=25)
    mono_b = adpcm_decode(adpcm_encode_mono(b, spb), 1, 8, spb, total_samples=25)
    assert np.array_equal(fr[:, 0], mono_a.ravel())
    assert np.array_equal(fr[:, 1], mono_b.ravel())

    with pytest.raises(ValueError, match="8k"):
        adpcm_encode_mono(a, 11)
    with pytest.raises(ValueError, match="8k"):
        adpcm_encode_mono(a, 8)


def test_msadpcm_codec_conformance_vs_scalar_reference():
    """MS ADPCM (r13): the vectorized block codec must agree sample-for-
    sample with an independent scalar transcription of the MS state
    machine (coefficient prediction, signed-nibble delta scaling,
    adaptation-table delta update with the 16 floor), across the same
    waveform battery as the IMA pin and block geometries incl. partial
    final blocks."""
    import numpy as np

    from duckpipe_spark.functions.wav import (
        _MSADPCM_ADAPT,
        _MSADPCM_INIT_DELTA,
        decode_wav,
        encode_wav_msadpcm,
        msadpcm_decode,
        msadpcm_encode_mono,
    )

    def ref_codec(samples, spb):
        n = len(samples)
        out = []
        nb = (n + spb - 1) // spb
        padded = list(samples) + [samples[-1]] * (nb * spb - n)
        for b in range(nb):
            blk = padded[b * spb : (b + 1) * spb]
            s2, s1, delta = int(blk[0]), int(blk[1]), _MSADPCM_INIT_DELTA
            out += [s2, s1]
            for s in blk[2:]:
                pred = (s1 * 256 + s2 * 0) >> 8
                err = int(s) - pred
                q = abs(err) // delta
                nn = max(-8, min(7, q if err >= 0 else -q))
                code = nn & 15
                new = max(-32768, min(32767, pred + nn * delta))
                s2, s1 = s1, new
                delta = max(16, (int(_MSADPCM_ADAPT[code]) * delta) >> 8)
                out.append(new)
        return np.array(out[:n], dtype=np.int16)

    i = np.arange(1040, dtype=np.int64)
    seed = (7 * 1000003 + i + 1) % 1000000007
    qr = (
        (seed * seed % 1000000007 * 2654435761 % 1000000007) % 60000 - 30000
    ).astype(np.int16)
    square = np.array(
        [0, 32767, -32768, 32767, -32768, 0, 100, -100] * 130, np.int16
    )
    ramp = (np.arange(1040) % 7 - 3).astype(np.int16)
    rng = ((np.arange(2000, dtype=np.int64) * 2654435761 % (1 << 16)) - 32768).astype(
        np.int16
    )

    for s in (qr, square, ramp, rng):
        for spb in (500, 4, 1024):
            block = 7 + (spb - 2) // 2
            data = msadpcm_encode_mono(s, spb)
            got = msadpcm_decode(data, 1, block, spb, total_samples=len(s)).ravel()
            ref = ref_codec(s, spb)
            assert np.array_equal(got, ref), (spb, int(np.argmax(got != ref)))
            frames, rate = decode_wav(encode_wav_msadpcm(s, 8_000, spb))
            assert rate == 8_000 and frames.shape == (len(s), 1)
            ints = np.rint(frames.ravel() * 32768).astype(np.int64)
            assert np.array_equal(ints, ref.astype(np.int64))

    import pytest

    with pytest.raises(ValueError, match="even"):
        msadpcm_encode_mono(qr, 501)


def test_msadpcm_decode_honors_wire_coefficients():
    """The decoder must obey the HEADER's coefficient-set index and
    initial delta (any encoder's choices decode): re-point a block's
    bpredictor at coefficient set 2 ((0, 0) — predictor always 0) and
    the reconstruction must change accordingly, computed against the
    scalar model with those coefficients."""
    import numpy as np

    from duckpipe_spark.functions.wav import (
        _MSADPCM_ADAPT,
        msadpcm_decode,
        msadpcm_encode_mono,
    )

    s = (np.arange(20, dtype=np.int64) * 311 % 2000 - 1000).astype(np.int16)
    spb = 20
    raw = bytearray(msadpcm_encode_mono(s, spb))
    raw[0] = 2  # coefficient set (0, 0): predictor == 0 for every sample
    got = msadpcm_decode(bytes(raw), 1, 7 + (spb - 2) // 2, spb, total_samples=spb)

    s2, s1, delta = int(s[0]), int(s[1]), 128
    want = [s2, s1]
    body = bytes(raw[7:])
    nibs = []
    for byte in body:
        nibs += [byte >> 4, byte & 15]
    for code in nibs[: spb - 2]:
        nn = code - 16 if code >= 8 else code
        pred = 0  # coef set 2
        new = max(-32768, min(32767, pred + nn * delta))
        s2, s1 = s1, new
        delta = max(16, (int(_MSADPCM_ADAPT[code]) * delta) >> 8)
        want.append(new)
    assert got.ravel().tolist() == want


def test_msadpcm_decode_rejects_out_of_table_predictor():
    """ADVICE r13 item 3: a block-header coefficient-set index beyond the
    fmt coefficient table is a malformed file — the decoder must raise
    (like the other malformed-WAV paths), not clamp to the last set and
    decode wrong samples silently."""
    import numpy as np
    import pytest

    from duckpipe_spark.functions.wav import msadpcm_decode, msadpcm_encode_mono

    s = (np.arange(20, dtype=np.int64) * 173 % 1500 - 700).astype(np.int16)
    spb = 20
    raw = bytearray(msadpcm_encode_mono(s, spb))
    raw[0] = 7  # one past the 7 standard coefficient pairs (valid: 0..6)
    with pytest.raises(ValueError, match="predictor index"):
        msadpcm_decode(bytes(raw), 1, 7 + (spb - 2) // 2, spb, total_samples=spb)
    # a truncated coefficient table must reject indices it no longer covers
    with pytest.raises(ValueError, match="predictor index"):
        raw[0] = 2
        msadpcm_decode(
            bytes(raw), 1, 7 + (spb - 2) // 2, spb, total_samples=spb,
            coefs=np.array([[256, 0], [512, -256]], dtype=np.int64),
        )
