"""Minimal pure-python WAV (RIFF PCM) codec (stdlib ``struct`` + numpy).

Third vendored media codec after `functions/png.py` and
`functions/jpeg.py`: turns the audio branch of `decode_audio` from an
honest stub into a REAL decode for the format a curation pipeline meets
first — RIFF/WAVE containers holding integer PCM (8/16/24/32-bit) or
IEEE-float samples, mono or multi-channel — plus both G.711 halves
(mu-law tag 7, A-law tag 6) since r12 and IMA/DVI ADPCM (tag 0x11)
since r13, the first PREDICTIVE codec vendored here. Transform-domain
codecs (MP3, AAC) remain the documented external-codec plug point.

From-scratch implementation of the public RIFF/WAVE layout (the original
Microsoft/IBM multimedia spec, mirrored in RFC 2361's format registry):
chunks are (fourcc, uint32 size) pairs; ``fmt `` carries the sample
layout; ``data`` carries little-endian interleaved frames.

r12 adds both G.711 halves (mu-law tag 7, A-law tag 6) — the first
COMPRESSED codecs with a native decode here: stateless per-sample
integer expansion makes them both vendorable and analytically
replayable by the DuckDB oracle.

r13 adds IMA ADPCM (tag 0x11, VERDICT r12 item 5) — the first
PREDICTIVE codec: block-stateful but fully deterministic integer math.
No closed form exists for its decoder state, but the state RECURSION
is replayable per block (this encoder deliberately resets the step
index at each block header, a spec-legal choice that makes blocks
independent), so the oracle runs it as a recursive CTE — and MS ADPCM
(tag 0x02), the second predictive codec, same design with a different
state machine (per-block coefficient set + initial delta + two history
samples, all trusted from the wire on decode; this encoder fixes
coefficient set 0 and a constant initial delta). Transform-domain
codecs (MP3, AAC) remain external plug points.
"""

from __future__ import annotations

import struct

import numpy as np

_PCM = 1
_IEEE_FLOAT = 3
_ALAW = 6
_MULAW = 7
_IMA_ADPCM = 0x11
_MS_ADPCM = 0x02
_EXTENSIBLE = 0xFFFE

# --- IMA/DVI ADPCM (r13): the first PREDICTIVE compressed codec with a
# real decode (VERDICT r12 item 5). 4:1 compression, RFC 2361 format
# tag 0x11; block-stateful but fully deterministic integer math: each
# block carries an int16 predictor seed + step index, then 4-bit codes
# adapt both per sample. Public tables from the IMA Digital Audio
# Compatibility specification (the same constants every open
# implementation ships).

_IMA_STEPS = np.array(
    [
        7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31,
        34, 37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130,
        143, 157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408,
        449, 494, 544, 598, 658, 724, 796, 876, 963, 1060, 1166, 1282,
        1411, 1552, 1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327,
        3660, 4026, 4428, 4871, 5358, 5894, 6484, 7132, 7845, 8630,
        9493, 10442, 11487, 12635, 13899, 15289, 16818, 18500, 20350,
        22385, 24623, 27086, 29794, 32767,
    ],
    dtype=np.int64,
)
# index adjustment for code & 7 (sign bit never moves the index)
_IMA_ADJ = np.array([-1, -1, -1, -1, 2, 4, 6, 8], dtype=np.int64)


def _ima_reconstruct(pred, idx, code):
    """One decoder step, vectorized over any shape: (pred, idx, code) →
    (pred', idx'). The ENCODER calls this too — mirroring the decoder's
    reconstruction is what keeps both state machines in lockstep."""
    step = _IMA_STEPS[idx]
    diff = (
        (step >> 3)
        + np.where(code & 4, step, 0)
        + np.where(code & 2, step >> 1, 0)
        + np.where(code & 1, step >> 2, 0)
    )
    pred = np.clip(
        np.where(code & 8, pred - diff, pred + diff), -32768, 32767
    )
    idx = np.clip(idx + _IMA_ADJ[code & 7], 0, 88)
    return pred, idx


def adpcm_encode_mono(
    samples: np.ndarray, samples_per_block: int = 505
) -> bytes:
    """int16 mono samples → IMA ADPCM block stream (the data-chunk
    payload): per block a 4-byte header (int16 predictor = the block's
    first sample VERBATIM, uint8 step index, uint8 reserved 0) then
    (samples_per_block − 1) 4-bit codes, low nibble first, zero-padded
    to the full block. THIS encoder resets the step index to 0 at every
    block header (a spec-legal encoder choice — the header index is the
    encoder's to pick) so blocks are fully independent: the oracle can
    replay each block's state recursion in parallel instead of
    serializing the whole stream. Vectorized ACROSS blocks; the inner
    loop runs once per in-block position."""
    if samples.dtype != np.int16 or samples.ndim != 1:
        raise ValueError("adpcm_encode_mono expects 1-D int16 samples")
    if samples_per_block < 9 or (samples_per_block - 1) % 8 != 0:
        # 1 header sample + whole 4-byte nibble words (8 samples each):
        # the IMA layout is word-granular, so spb ≡ 1 (mod 8)
        raise ValueError("samples_per_block must be 8k+1 and >= 9")
    n = len(samples)
    if n == 0:
        return b""
    spb = samples_per_block
    n_blocks = (n + spb - 1) // spb
    padded = np.zeros(n_blocks * spb, dtype=np.int64)
    padded[:n] = samples.astype(np.int64)
    # padding repeats the last real sample: code 0 keeps pred almost
    # still, and the fact-chunk trim drops these samples anyway
    if n < len(padded):
        padded[n:] = padded[n - 1]
    return _adpcm_encode_blocks(padded.reshape(n_blocks, spb)).tobytes()


def _adpcm_encode_blocks(blocks: np.ndarray) -> np.ndarray:
    """(n_blocks, spb) int64 samples → (n_blocks, 4 + (spb−1)//2) uint8
    encoded blocks. The vectorized core of `adpcm_encode_mono`, exposed
    at block granularity so fixtures can batch MANY equal-geometry
    streams through ONE call (blocks are independent by this encoder's
    index-reset design, so streams just concatenate along axis 0)."""
    n_blocks, spb = blocks.shape
    pred = blocks[:, 0].copy()
    idx = np.zeros(n_blocks, dtype=np.int64)
    nibbles = np.zeros((n_blocks, spb - 1), dtype=np.uint8)
    for pos in range(1, spb):
        s = blocks[:, pos]
        step = _IMA_STEPS[idx]
        delta = s - pred
        sign = np.where(delta < 0, 8, 0)
        d = np.abs(delta)
        b4 = d >= step
        d = d - np.where(b4, step, 0)
        b2 = d >= (step >> 1)
        d = d - np.where(b2, step >> 1, 0)
        b1 = d >= (step >> 2)
        code = sign | (b4 << 2) | (b2 << 1) | b1.astype(np.int64)
        nibbles[:, pos - 1] = code
        pred, idx = _ima_reconstruct(pred, idx, code)
    # pack: low nibble first, pad the odd tail nibble with 0
    n_bytes = (spb - 1 + 1) // 2
    packed = np.zeros((n_blocks, n_bytes), dtype=np.uint8)
    packed |= nibbles[:, 0::2][:, : n_bytes]
    if spb > 2:
        hi = nibbles[:, 1::2]
        packed[:, : hi.shape[1]] |= hi << 4
    header = np.zeros((n_blocks, 4), dtype=np.uint8)
    p16 = blocks[:, 0].astype("<i2").view(np.uint8).reshape(n_blocks, 2)
    header[:, :2] = p16
    # header[:, 2] stays 0 = the reset step index; header[:, 3] reserved
    return np.concatenate([header, packed], axis=1)


def adpcm_decode(
    data: bytes, channels: int, block_align: int, samples_per_block: int,
    total_samples: int | None = None,
) -> np.ndarray:
    """IMA ADPCM data-chunk payload → int16 samples of shape (n_frames,
    channels): per block and channel a 4-byte header seeds (predictor,
    step index) — TRUSTED from the wire, any encoder's choice decodes —
    then 4-byte nibble groups interleave per channel (8 samples each,
    low nibble first). Vectorized across blocks and channels; the inner
    loop runs once per in-block sample position. ``total_samples``
    (the fact chunk) trims the final block's padding."""
    if block_align < 4 * channels:
        raise ValueError("ADPCM block_align smaller than its headers")
    blob = np.frombuffer(data, dtype=np.uint8)
    n_blocks = len(blob) // block_align
    if n_blocks == 0:
        return np.zeros((0, channels), dtype=np.int16)
    blocks = blob[: n_blocks * block_align].reshape(n_blocks, block_align)
    spb = samples_per_block
    hdr = blocks[:, : 4 * channels].reshape(n_blocks, channels, 4)
    pred = (
        hdr[:, :, :2].reshape(n_blocks, channels * 2)
        .view("<i2").astype(np.int64)
    )
    idx = np.clip(hdr[:, :, 2].astype(np.int64), 0, 88)
    body = blocks[:, 4 * channels :]
    # nibble i of channel c lives in 4-byte group (i // 8) of that
    # channel; groups interleave across channels
    n_groups = body.shape[1] // (4 * channels)
    groups = body[:, : n_groups * 4 * channels].reshape(
        n_blocks, n_groups, channels, 4
    )
    lo = groups & 0x0F
    hi = groups >> 4
    nib = np.stack([lo, hi], axis=-1).reshape(n_blocks, n_groups, channels, 8)
    # → (n_blocks, channels, n_groups*8) in sample order
    nib = nib.transpose(0, 2, 1, 3).reshape(n_blocks, channels, n_groups * 8)
    max_pos = min(spb - 1, nib.shape[2])
    out = np.zeros((n_blocks, channels, max_pos + 1), dtype=np.int64)
    out[:, :, 0] = pred
    for pos in range(max_pos):
        pred, idx = _ima_reconstruct(pred, idx, nib[:, :, pos].astype(np.int64))
        out[:, :, pos + 1] = pred
    # (n_blocks, ch, spb) → frame-major (n_blocks*spb, ch)
    frames = out.transpose(0, 2, 1).reshape(-1, channels)
    if total_samples is not None:
        frames = frames[:total_samples]
    return frames.astype(np.int16)


# --- MS ADPCM (r13, tag 0x02): the SECOND predictive codec, proving the
# IMA pattern generalizes. Per-block header carries a coefficient-set
# index (into the fmt chunk's table), an initial adaptive delta and TWO
# history samples; each 4-bit SIGNED code then scales the delta. This
# encoder always picks coefficient set 0 (coef1=256, coef2=0 ⇒ predictor
# = previous sample) and a FIXED initial delta — both spec-legal encoder
# choices (the header fields exist precisely so decoders obey whatever
# the encoder chose) that keep every block's state recursion closed-form-
# free but REPLAYABLE, exactly like IMA's index reset.

_MSADPCM_ADAPT = np.array(
    [230, 230, 230, 230, 307, 409, 512, 614, 768, 614, 512, 409, 307, 230, 230, 230],
    dtype=np.int64,
)
_MSADPCM_COEFS = np.array(
    [[256, 0], [512, -256], [0, 0], [192, 64], [240, 0], [460, -208], [392, -232]],
    dtype=np.int64,
)
_MSADPCM_INIT_DELTA = 128  # this encoder's fixed initial delta (header field)


def _msadpcm_encode_blocks(blocks: np.ndarray) -> np.ndarray:
    """(n_blocks, spb) int64 samples → (n_blocks, 7 + (spb−2)//2) uint8
    MS ADPCM blocks (mono geometry), coefficient set 0, initial delta
    ``_MSADPCM_INIT_DELTA``. spb must be even (2 header samples + whole
    bytes of 2 nibbles); nibbles pack HIGH-first per the MS layout."""
    n_blocks, spb = blocks.shape
    s2 = blocks[:, 0].copy()  # older sample, emitted first
    s1 = blocks[:, 1].copy()
    delta = np.full(n_blocks, _MSADPCM_INIT_DELTA, dtype=np.int64)
    nibbles = np.zeros((n_blocks, spb - 2), dtype=np.uint8)
    for pos in range(2, spb):
        s = blocks[:, pos]
        pred = (s1 * 256 + s2 * 0) >> 8  # coef set 0: pred == s1, exact
        err = s - pred
        # truncate toward zero (C semantics), delta > 0 always
        n = np.sign(err) * (np.abs(err) // delta)
        n = np.clip(n, -8, 7)
        code = (n & 15).astype(np.int64)
        new = np.clip(pred + n * delta, -32768, 32767)
        s2 = s1
        s1 = new
        delta = np.maximum(16, (_MSADPCM_ADAPT[code] * delta) >> 8)
        nibbles[:, pos - 2] = code
    n_bytes = (spb - 2) // 2
    packed = (nibbles[:, 0::2] << 4) | nibbles[:, 1::2]
    header = np.zeros((n_blocks, 7), dtype=np.uint8)
    # [bpred u8][idelta i16][sample1 i16][sample2 i16], little-endian
    header[:, 0] = 0  # coefficient set 0
    header[:, 1:3] = (
        np.full(n_blocks, _MSADPCM_INIT_DELTA, np.int64)
        .astype("<i2").view(np.uint8).reshape(n_blocks, 2)
    )
    header[:, 3:5] = blocks[:, 1].astype("<i2").view(np.uint8).reshape(n_blocks, 2)
    header[:, 5:7] = blocks[:, 0].astype("<i2").view(np.uint8).reshape(n_blocks, 2)
    return np.concatenate([header, packed.astype(np.uint8)], axis=1)


def msadpcm_encode_mono(samples: np.ndarray, samples_per_block: int = 500) -> bytes:
    """int16 mono samples → MS ADPCM block stream (the data-chunk
    payload). spb must be EVEN and >= 4 (2 verbatim header samples +
    whole bytes); the final partial block pads by repeating the last
    sample (trimmed on decode via the fact chunk)."""
    if samples.dtype != np.int16 or samples.ndim != 1:
        raise ValueError("msadpcm_encode_mono expects 1-D int16 samples")
    spb = samples_per_block
    if spb < 4 or spb % 2 != 0:
        raise ValueError("samples_per_block must be even and >= 4")
    n = len(samples)
    if n == 0:
        return b""
    n_blocks = (n + spb - 1) // spb
    padded = np.zeros(n_blocks * spb, dtype=np.int64)
    padded[:n] = samples.astype(np.int64)
    if n < len(padded):
        padded[n:] = padded[n - 1]
    return _msadpcm_encode_blocks(padded.reshape(n_blocks, spb)).tobytes()


def msadpcm_decode(
    data: bytes, channels: int, block_align: int, samples_per_block: int,
    total_samples: int | None = None, coefs: np.ndarray | None = None,
) -> np.ndarray:
    """MS ADPCM data-chunk payload → int16 samples of shape (n_frames,
    channels). Header fields (coefficient-set index, initial delta, two
    history samples) are TRUSTED from the wire per channel — any
    encoder's choices decode; ``coefs`` is the fmt-chunk coefficient
    table (defaults to the 7 standard pairs). Vectorized across blocks
    and channels; the inner loop runs once per in-block position."""
    if coefs is None:
        coefs = _MSADPCM_COEFS
    hdr_bytes = 7 * channels
    if block_align < hdr_bytes:
        raise ValueError("MS ADPCM block_align smaller than its headers")
    blob = np.frombuffer(data, dtype=np.uint8)
    n_blocks = len(blob) // block_align
    if n_blocks == 0:
        return np.zeros((0, channels), dtype=np.int16)
    blocks = blob[: n_blocks * block_align].reshape(n_blocks, block_align)
    ch = channels
    bpred = blocks[:, 0:ch].astype(np.int64)
    if np.any(bpred >= len(coefs)):
        # ADVICE r13 item 3: an out-of-table coefficient-set index means a
        # malformed file (or a truncated fmt coefficient table) — raising
        # keeps the trusted-from-the-wire contract scoped to VALID indices
        # instead of silently decoding wrong samples via a clamped index
        raise ValueError(
            "MS ADPCM block predictor index out of coefficient-table range"
        )
    def _i16(lo):  # field of ch int16s starting at byte lo
        return (
            blocks[:, lo : lo + 2 * ch].reshape(n_blocks, ch, 2)
            .reshape(n_blocks, 2 * ch).view("<i2").astype(np.int64)
        )
    delta = _i16(ch).astype(np.int64)
    s1 = _i16(3 * ch)
    s2 = _i16(5 * ch)
    c1 = coefs[bpred, 0]
    c2 = coefs[bpred, 1]
    body = blocks[:, hdr_bytes:]
    hi = body >> 4
    lo = body & 0x0F
    nib = np.stack([hi, lo], axis=-1).reshape(n_blocks, -1)  # high first
    # nibble k belongs to channel k % ch, in sample order per channel
    n_codes = nib.shape[1] // ch
    nib = nib[:, : n_codes * ch].reshape(n_blocks, n_codes, ch).transpose(0, 2, 1)
    spb = samples_per_block
    max_pos = min(spb - 2, n_codes)
    out = np.zeros((n_blocks, ch, max_pos + 2), dtype=np.int64)
    out[:, :, 0] = s2
    out[:, :, 1] = s1
    delta = np.maximum(delta, 16)
    for pos in range(max_pos):
        code = nib[:, :, pos].astype(np.int64)
        signed = np.where(code >= 8, code - 16, code)
        pred = (s1 * c1 + s2 * c2) >> 8
        new = np.clip(pred + signed * delta, -32768, 32767)
        s2 = s1
        s1 = new
        delta = np.maximum(16, (_MSADPCM_ADAPT[code] * delta) >> 8)
        out[:, :, pos + 2] = new
    frames = out.transpose(0, 2, 1).reshape(-1, ch)
    if total_samples is not None:
        frames = frames[:total_samples]
    return frames.astype(np.int16)


def wav_msadpcm_container(
    data: bytes, n_samples: int, sample_rate: int, samples_per_block: int
) -> bytes:
    """Wrap an encoded mono MS ADPCM block stream in RIFF/WAVE: fmt tag
    0x02 with the standard extra block (wSamplesPerBlock, wNumCoef=7 and
    the 7 coefficient pairs), a fact chunk with the true frame count,
    then data."""
    spb = samples_per_block
    block = 7 + (spb - 2) // 2
    byte_rate = (sample_rate * block + spb - 1) // spb
    extra = struct.pack("<HH", spb, len(_MSADPCM_COEFS))
    for c1, c2 in _MSADPCM_COEFS:
        extra += struct.pack("<hh", int(c1), int(c2))
    fmt = struct.pack(
        "<HHIIHHH", _MS_ADPCM, 1, sample_rate, byte_rate, block, 4, len(extra)
    ) + extra
    fact = struct.pack("<I", n_samples)
    out = b"RIFF" + struct.pack(
        "<I", 4 + 8 + len(fmt) + 8 + len(fact) + 8 + len(data)
    ) + b"WAVE"
    out += b"fmt " + struct.pack("<I", len(fmt)) + fmt
    out += b"fact" + struct.pack("<I", len(fact)) + fact
    out += b"data" + struct.pack("<I", len(data)) + data
    return out


def encode_wav_msadpcm(
    samples: np.ndarray, sample_rate: int = 8_000, samples_per_block: int = 500
) -> bytes:
    """Encode int16 MONO samples as a RIFF/WAVE MS ADPCM blob (format
    tag 0x02, 4 bits/sample, coefficient set 0, fixed initial delta)."""
    if samples.dtype != np.int16 or samples.ndim != 1:
        raise ValueError("encode_wav_msadpcm expects 1-D int16 mono samples")
    return wav_msadpcm_container(
        msadpcm_encode_mono(samples, samples_per_block),
        len(samples), sample_rate, samples_per_block,
    )


def encode_wav_adpcm(
    samples: np.ndarray,
    sample_rate: int = 8_000,
    samples_per_block: int = 505,
) -> bytes:
    """Encode int16 MONO samples as a RIFF/WAVE IMA ADPCM blob (format
    tag 0x11, 4 bits/sample, fact chunk carrying the true frame count so
    the final block's padding trims on decode). Multi-channel encode is
    out of scope (decode handles any channel count); block_align =
    4 + (samples_per_block − 1) / 2."""
    if samples.dtype != np.int16 or samples.ndim != 1:
        raise ValueError("encode_wav_adpcm expects 1-D int16 mono samples")
    return wav_adpcm_container(
        adpcm_encode_mono(samples, samples_per_block),
        len(samples), sample_rate, samples_per_block,
    )


def wav_adpcm_container(
    data: bytes, n_samples: int, sample_rate: int, samples_per_block: int
) -> bytes:
    """Wrap an already-encoded mono IMA ADPCM block stream in the
    RIFF/WAVE container (fmt tag 0x11 + fact + data) — split out of
    `encode_wav_adpcm` so batched fixtures can encode many streams in
    one `_adpcm_encode_blocks` call and container-wrap each slice."""
    spb = samples_per_block
    block = 4 + (spb - 1) // 2
    byte_rate = (sample_rate * block + spb - 1) // spb
    fmt = struct.pack(
        "<HHIIHHHH", _IMA_ADPCM, 1, sample_rate, byte_rate, block, 4, 2, spb
    )
    fact = struct.pack("<I", n_samples)
    out = b"RIFF" + struct.pack(
        "<I", 4 + 8 + len(fmt) + 8 + len(fact) + 8 + len(data)
    ) + b"WAVE"
    out += b"fmt " + struct.pack("<I", len(fmt)) + fmt
    out += b"fact" + struct.pack("<I", len(fact)) + fact
    out += b"data" + struct.pack("<I", len(data)) + data
    return out

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
    spb = None
    fact = None
    ms_coefs = None
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
            if tag in (_IMA_ADPCM, _MS_ADPCM) and size >= 20:
                # cbSize (offset 16) then wSamplesPerBlock
                (spb,) = struct.unpack_from("<H", body, 18)
            if tag == _MS_ADPCM and size >= 22:
                (ncoef,) = struct.unpack_from("<H", body, 20)
                if size >= 22 + 4 * ncoef and ncoef > 0:
                    ms_coefs = np.array(
                        struct.unpack_from(f"<{2 * ncoef}h", body, 22),
                        dtype=np.int64,
                    ).reshape(ncoef, 2)
            fmt = (tag, ch, rate, block, bits)
        elif cid == b"fact" and size >= 4:
            (fact,) = struct.unpack_from("<I", body, 0)
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
    elif tag == _IMA_ADPCM:
        if bits != 4:
            raise ValueError(f"{bits}-bit IMA ADPCM unsupported (spec is 4)")
        if spb is None:
            # derive the spec default from the block geometry
            spb = (block - 4 * ch) * 2 // ch + 1
        frames = adpcm_decode(raw, ch, block, spb, total_samples=fact)
        # reconstruction lands on the 16-bit grid; scale like 16-bit PCM
        # so downstream rint(x*32768) recovers the exact integers
        return frames.astype(np.float64) / 32768.0, rate
    elif tag == _MS_ADPCM:
        if bits != 4:
            raise ValueError(f"{bits}-bit MS ADPCM unsupported (spec is 4)")
        if spb is None:
            spb = (block - 7 * ch) * 2 // ch + 2
        frames = msadpcm_decode(
            raw, ch, block, spb, total_samples=fact, coefs=ms_coefs
        )
        return frames.astype(np.float64) / 32768.0, rate
    else:
        raise ValueError(f"compressed WAV format tag {tag} needs an external codec")
    n = len(arr) - len(arr) % ch
    return arr[:n].reshape(-1, ch), rate
