"""Minimal pure-python WAV (RIFF PCM) codec (stdlib ``struct`` + numpy).

Third vendored media codec after `functions/png.py` and
`functions/jpeg.py`: turns the audio branch of `decode_audio` from an
honest stub into a REAL decode for the format a curation pipeline meets
first — RIFF/WAVE containers holding integer PCM (8/16/24/32-bit) or
IEEE-float samples, mono or multi-channel — plus both G.711 halves
(mu-law tag 7, A-law tag 6) since r12. Predictive compressed codecs
(MP3, AAC, ADPCM...) remain the documented external-codec plug point.

From-scratch implementation of the public RIFF/WAVE layout (the original
Microsoft/IBM multimedia spec, mirrored in RFC 2361's format registry):
chunks are (fourcc, uint32 size) pairs; ``fmt `` carries the sample
layout; ``data`` carries little-endian interleaved frames.

r12 adds both G.711 halves (mu-law tag 7, A-law tag 6) — the first
COMPRESSED codecs with a native decode here: stateless per-sample
integer expansion makes them both vendorable and analytically
replayable by the DuckDB oracle (predictive codecs — ADPCM, MP3, AAC —
remain external plug points: their decoder state has no closed form an
oracle could replay).
"""

from __future__ import annotations

import struct

import numpy as np

_PCM = 1
_IEEE_FLOAT = 3
_ALAW = 6
_MULAW = 7
_EXTENSIBLE = 0xFFFE

# --- G.711 mu-law (r12): the first COMPRESSED audio codec with a real
# decode (not an ffmpeg plug point). Chosen because it is STATELESS
# integer math per sample — exactly vendorable here AND exactly
# replayable in oracle SQL, unlike predictive codecs (ADPCM/MP3) whose
# decode state cannot be expressed analytically. 2:1 compression, the
# ITU-T telephony standard (RFC 2361 format tag 7).

_MULAW_BIAS = 0x84  # 132
_MULAW_CLIP = 32635


def mulaw_encode(samples: np.ndarray) -> np.ndarray:
    """int16 linear samples → uint8 G.711 mu-law codes (vectorized,
    standard bias-132 segment encoder; codes are bit-complemented on the
    wire per the spec)."""
    v = samples.astype(np.int64)
    sign = np.where(v < 0, 0x80, 0)
    mag = np.minimum(np.abs(v), _MULAW_CLIP) + _MULAW_BIAS
    # exponent = index of the highest set bit of mag, minus 7 (mag >= 132
    # so the result is in [0, 7])
    exp = (np.floor(np.log2(mag)).astype(np.int64) - 7).clip(0, 7)
    mant = (mag >> (exp + 3)) & 0x0F
    return (~(sign | (exp << 4) | mant) & 0xFF).astype(np.uint8)


def mulaw_decode(codes: np.ndarray) -> np.ndarray:
    """uint8 G.711 mu-law codes → int16 linear samples (exact integer
    expansion — the value set is the 16-bit grid, so downstream
    rint(x·32768) recovers these integers exactly)."""
    c = (~codes.astype(np.int64)) & 0xFF
    sign = c & 0x80
    exp = (c >> 4) & 0x07
    mant = c & 0x0F
    t = (((mant << 3) + _MULAW_BIAS) << exp) - _MULAW_BIAS
    return np.where(sign != 0, -t, t).astype(np.int16)


def alaw_encode(samples: np.ndarray) -> np.ndarray:
    """int16 linear samples → uint8 G.711 A-law codes (vectorized Sun
    g711.c segment encoder; even bits inverted on the wire per spec)."""
    v = samples.astype(np.int64) >> 3  # 13-bit domain
    mask = np.where(v >= 0, 0xD5, 0x55)
    mag = np.where(v >= 0, v, -v - 1)
    # segment = index of the first seg_aend bound >= mag (8 = overflow)
    bounds = np.array([0x1F, 0x3F, 0x7F, 0xFF, 0x1FF, 0x3FF, 0x7FF, 0xFFF])
    seg = np.searchsorted(bounds, mag, side="left")
    shift = np.where(seg < 2, 1, np.minimum(seg, 7))
    aval = (np.minimum(seg, 7) << 4) | ((mag >> shift) & 0x0F)
    aval = np.where(seg >= 8, 0x7F, aval)
    return ((aval ^ mask) & 0xFF).astype(np.uint8)


def alaw_decode(codes: np.ndarray) -> np.ndarray:
    """uint8 G.711 A-law codes → int16 linear samples (exact integer
    expansion, max |value| = 32256)."""
    a = codes.astype(np.int64) ^ 0x55
    t = (a & 0x0F) << 4
    seg = (a & 0x70) >> 4
    t = np.where(seg == 0, t + 8, np.where(seg == 1, t + 0x108, (t + 0x108) << np.maximum(seg - 1, 0)))
    return np.where(a & 0x80, t, -t).astype(np.int16)


def encode_wav_pcm16(samples: np.ndarray, sample_rate: int = 16_000) -> bytes:
    """Encode int16 samples — shape (n,) mono or (n, channels) — as a
    canonical 44-byte-header RIFF/WAVE PCM blob (the round-trip twin for
    `decode_wav`, same role as `encode_jpeg_gray`)."""
    if samples.dtype != np.int16:
        raise ValueError("encode_wav_pcm16 expects int16 samples")
    if samples.ndim == 1:
        samples = samples[:, None]
    n, ch = samples.shape
    data = samples.astype("<i2").tobytes()
    block = ch * 2
    fmt = struct.pack("<HHIIHH", _PCM, ch, sample_rate, sample_rate * block, block, 16)
    out = b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data)) + b"WAVE"
    out += b"fmt " + struct.pack("<I", len(fmt)) + fmt
    out += b"data" + struct.pack("<I", len(data)) + data
    return out


def _encode_wav_g711(samples: np.ndarray, sample_rate: int, tag: int, enc) -> bytes:
    if samples.dtype != np.int16:
        raise ValueError("G.711 encoders expect int16 samples")
    if samples.ndim == 1:
        samples = samples[:, None]
    n, ch = samples.shape
    data = enc(samples.ravel()).tobytes()
    block = ch  # one byte per sample per channel
    fmt = struct.pack("<HHIIHHH", tag, ch, sample_rate, sample_rate * block, block, 8, 0)
    out = b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data)) + b"WAVE"
    out += b"fmt " + struct.pack("<I", len(fmt)) + fmt
    out += b"data" + struct.pack("<I", len(data)) + data
    return out


def encode_wav_mulaw(samples: np.ndarray, sample_rate: int = 8_000) -> bytes:
    """Encode int16 samples — shape (n,) mono or (n, channels) — as a
    RIFF/WAVE G.711 mu-law blob (format tag 7, 8 bits/sample, 18-byte
    fmt chunk with cbSize=0 per the non-PCM convention)."""
    return _encode_wav_g711(samples, sample_rate, _MULAW, mulaw_encode)


def encode_wav_alaw(samples: np.ndarray, sample_rate: int = 8_000) -> bytes:
    """Encode int16 samples as a RIFF/WAVE G.711 A-law blob (format tag
    6) — the European telephony half of G.711, same 2:1 stateless
    contract as mu-law."""
    return _encode_wav_g711(samples, sample_rate, _ALAW, alaw_encode)


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """Decode a RIFF/WAVE blob → (samples float64 in [-1, 1] of shape
    (n_frames, channels), sample_rate). Integer PCM is scaled by its
    full-scale value (2^(bits-1)); float PCM passes through. Raises
    ValueError outside the subset (compressed codecs, malformed)."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE blob")
    pos = 12
    fmt = None
    raw = None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        body = data[pos + 8 : pos + 8 + size]
        if len(body) != size:
            raise ValueError("truncated WAV chunk")
        pos += 8 + size + (size & 1)  # chunks are word-aligned
        if cid == b"fmt ":
            if size < 16:
                raise ValueError("fmt chunk too short")
            tag, ch, rate, _br, block, bits = struct.unpack_from("<HHIIHH", body, 0)
            if tag == _EXTENSIBLE and size >= 26:
                # WAVE_FORMAT_EXTENSIBLE: the real tag is the first two
                # bytes of the SubFormat GUID
                (tag,) = struct.unpack_from("<H", body, 24)
            fmt = (tag, ch, rate, block, bits)
        elif cid == b"data":
            raw = body
            if fmt is not None:
                break  # fmt is required before data in practice
    if fmt is None or raw is None:
        raise ValueError("missing fmt or data chunk")
    tag, ch, rate, block, bits = fmt
    if ch == 0 or bits == 0 or rate == 0:
        raise ValueError("zero channels, bit depth, or sample rate")
    if tag == _PCM:
        if bits == 8:  # 8-bit WAV is unsigned
            arr = np.frombuffer(raw, dtype=np.uint8).astype(np.float64) - 128.0
            arr /= 128.0
        elif bits == 16:
            arr = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
        elif bits == 24:
            b = np.frombuffer(raw, dtype=np.uint8)
            b = b[: len(b) - len(b) % 3].reshape(-1, 3).astype(np.int64)
            v = b[:, 0] | (b[:, 1] << 8) | (b[:, 2] << 16)
            v = np.where(v >= 1 << 23, v - (1 << 24), v)
            arr = v.astype(np.float64) / float(1 << 23)
        elif bits == 32:
            arr = np.frombuffer(raw, dtype="<i4").astype(np.float64) / float(1 << 31)
        else:
            raise ValueError(f"{bits}-bit integer PCM unsupported")
    elif tag == _IEEE_FLOAT:
        if bits == 32:
            arr = np.frombuffer(raw, dtype="<f4").astype(np.float64)
        elif bits == 64:
            arr = np.frombuffer(raw, dtype="<f8").astype(np.float64)
        else:
            raise ValueError(f"{bits}-bit float PCM unsupported")
    elif tag in (_MULAW, _ALAW):
        if bits != 8:
            raise ValueError(f"{bits}-bit G.711 unsupported (spec is 8)")
        # expansion lands on the 16-bit grid; scale like 16-bit PCM so
        # downstream rint(x*32768) recovers the exact integers
        dec = mulaw_decode if tag == _MULAW else alaw_decode
        arr = dec(np.frombuffer(raw, dtype=np.uint8)).astype(np.float64)
        arr /= 32768.0
    else:
        raise ValueError(f"compressed WAV format tag {tag} needs an external codec")
    n = len(arr) - len(arr) % ch
    return arr[:n].reshape(-1, ch), rate
