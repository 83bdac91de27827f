"""Vendored GIF (LZW) codec conformance (VERDICT r13 item 5).

Three independent pins, mirroring the ADPCM conformance strategy in
test_wav_codec.py:

1. an INDEPENDENT SCALAR LZW TRANSCRIPTION (written below as a naive
   bit-string machine, structurally unlike the vendored accumulator
   implementation) must agree with the vendored codec in both directions
   on randomized streams;
2. a HAND-SIMULATED code stream pins the exact emitted bytes (variable
   width start, CLEAR/EOI, first dictionary entries);
3. REAL FILES written by real encoders (the CPython distribution ships
   GIF icons) must decode to exactly their declared pixel counts — the
   empirical pin for the famous code-width-bump off-by-one (a wrong bump
   rule desyncs the bit stream within a few dictionary growths and
   raises).
"""

import glob

import numpy as np
import pytest

from duckpipe_spark.functions.gif import (
    decode_gif,
    encode_gif,
    lzw_decode,
    lzw_encode,
)

# real encoder-written GIFs available in this container (skip if absent)
_REAL_GIF_GLOBS = [
    "/mnt/sandboxing/model_tools_env/*/python/install/lib/python3*/idlelib/Icons/*.gif",
    "/usr/share/**/*.gif",
]


# ---------------------------------------------------------------------------
# independent scalar transcription: bit-STRING based, table keyed by the
# decoded byte strings themselves — deliberately naive and structurally
# different from the vendored integer-accumulator implementation
# ---------------------------------------------------------------------------


def _scalar_lzw_encode(symbols, min_code_size):
    clear, eoi = 1 << min_code_size, (1 << min_code_size) + 1
    bits = []

    def put(code, width):
        bits.append(format(code, "b").zfill(width)[::-1])  # LSB-first

    table = {bytes([s]): s for s in range(clear)}
    nxt, width = eoi + 1, min_code_size + 1
    put(clear, width)
    w = b""
    for s in bytes(bytearray(int(x) for x in symbols)):
        wk = w + bytes([s])
        if wk in table:
            w = wk
            continue
        put(table[w], width)
        table[wk] = nxt
        nxt += 1
        if nxt == (1 << width) + 1 and width < 12:
            width += 1
        if nxt == 4097:
            put(clear, width)
            table = {bytes([q]): q for q in range(clear)}
            nxt, width = eoi + 1, min_code_size + 1
        w = bytes([s])
    if w:
        put(table[w], width)
    put(eoi, width)
    stream = "".join(bits)
    stream += "0" * (-len(stream) % 8)
    return bytes(
        int(stream[i : i + 8][::-1], 2) for i in range(0, len(stream), 8)
    )


def _scalar_lzw_decode(data, min_code_size):
    clear, eoi = 1 << min_code_size, (1 << min_code_size) + 1
    stream = "".join(format(b, "b").zfill(8)[::-1] for b in data)
    pos = 0
    out = b""
    table = [bytes([s]) for s in range(clear)] + [b"", b""]
    width = min_code_size + 1
    prev = None
    while pos + width <= len(stream):
        code = int(stream[pos : pos + width][::-1], 2)
        pos += width
        if code == eoi:
            break
        if code == clear:
            table = [bytes([s]) for s in range(clear)] + [b"", b""]
            width = min_code_size + 1
            prev = None
            continue
        if code < len(table):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]
        else:
            raise ValueError("scalar: bad code")
        out += entry
        if prev is not None and len(table) < 4096:
            table.append(prev + entry[:1])
            if len(table) + 1 == (1 << width) + 1 and width < 12:
                width += 1
        prev = entry
    return np.frombuffer(out, dtype=np.uint8)


@pytest.mark.parametrize("mcs", [2, 4, 8])
def test_lzw_conformance_vs_scalar_reference(mcs):
    rng = np.random.default_rng(101 + mcs)
    for n in (1, 7, 300, 6000):
        syms = rng.integers(0, 1 << mcs, size=n, dtype=np.uint8)
        vend = lzw_encode(syms, mcs)
        scal = _scalar_lzw_encode(syms, mcs)
        assert vend == scal, f"encoders disagree (mcs={mcs}, n={n})"
        assert (lzw_decode(scal, mcs).astype(np.int64) == syms).all()
        assert (_scalar_lzw_decode(vend, mcs).astype(np.int64) == syms).all()


def test_lzw_hand_simulated_stream():
    """Pin the exact bytes for symbols [1, 1, 1, 1] at min_code_size=2.

    Codes in emit order (width 3): CLEAR=4, then '1'=1 (entry 6='11'
    added), then '11'=6 (entry 7='111'), then the final '1'=1, then
    EOI=5. LSB-first packing of 3-bit codes 4,1,6,1,5 — per-code bits
    LSB-first: 001 100 011 100 101 → byte0 = bits 0..7 =
    0,0,1,1,0,0,0,1 → 0x8C; byte1 = bits 8..14 = 1,1,0,0,1,0,1 →
    0x53."""
    got = lzw_encode(np.array([1, 1, 1, 1], dtype=np.uint8), 2)
    assert got == bytes([0x8C, 0x53])
    assert (lzw_decode(got, 2).astype(np.int64) == [1, 1, 1, 1]).all()


def test_gif_roundtrip_gray():
    rng = np.random.default_rng(5)
    for shape in [(1, 1), (7, 9), (16, 18), (64, 64)]:
        img = rng.integers(0, 256, size=shape, dtype=np.uint8)
        frames = decode_gif(encode_gif(img))
        assert len(frames) == 1
        assert frames[0].shape == (*shape, 3)
        for ch in range(3):  # gray palette: every channel equals the index
            assert (frames[0][:, :, ch] == img).all()


def test_gif_roundtrip_forces_dictionary_reset():
    """>4096 distinct-context pixels force the 12-bit cap and an in-stream
    CLEAR + table reset; the round trip must survive it."""
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, size=(120, 131), dtype=np.uint8)
    assert (decode_gif(encode_gif(img))[0][:, :, 0] == img).all()


def test_gif_animated_roundtrip():
    rng = np.random.default_rng(13)
    frames = [rng.integers(0, 256, size=(9, 11), dtype=np.uint8) for _ in range(3)]
    back = decode_gif(encode_gif(frames, delay_cs=10))
    assert len(back) == 3
    for a, b in zip(frames, back):
        assert (b[:, :, 0] == a).all()


def test_gif_malformed_raises():
    good = encode_gif(np.zeros((4, 4), dtype=np.uint8))
    with pytest.raises(ValueError, match="signature"):
        decode_gif(b"not a gif")
    with pytest.raises(ValueError):
        decode_gif(good[:10])  # truncated header
    with pytest.raises(ValueError):
        decode_gif(good[:-20])  # truncated image data
    with pytest.raises(ValueError, match="beyond dictionary"):
        # descriptor promises pixels, stream is a single out-of-range code
        lzw_decode(bytes([0xFF, 0xFF]), 2, n_pixels=100)
    with pytest.raises(ValueError, match="min_code_size"):
        lzw_encode(np.zeros(4, dtype=np.uint8), 1)


def test_gif_real_files_decode():
    """Decode GIFs written by REAL encoders — the empirical width-bump
    pin. Exact pixel-count completion without a desync error is the
    assertion (a wrong bump rule raises within a few dictionary
    growths); interlaced files must raise the documented ValueError."""
    paths = sorted(p for g in _REAL_GIF_GLOBS for p in glob.glob(g, recursive=True))
    if not paths:
        pytest.skip("no real GIF files present in this container")
    decoded = interlaced = 0
    for p in paths[:20]:
        data = open(p, "rb").read()
        try:
            frames = decode_gif(data)
        except ValueError as exc:
            if "interlaced" in str(exc):
                interlaced += 1
                continue
            raise
        assert frames and frames[0].ndim == 3 and frames[0].shape[2] == 3
        decoded += 1
    assert decoded > 0


def test_image_dhash_cross_codec_gif_png(spark):
    """The SAME image encoded as PNG and as GIF must produce the SAME
    dHash code (cross-codec near-dup identity: byte dedup can never see
    this pair, the perceptual engine must)."""
    from duckpipe_spark.functions.multimodal import image_dhash
    from duckpipe_spark.functions.png import encode_png

    rng = np.random.default_rng(17)
    img = rng.integers(0, 256, size=(16, 18), dtype=np.uint8)
    df = spark.createDataFrame(
        [(1, bytearray(encode_png(img))), (2, bytearray(encode_gif(img)))],
        "blob_id bigint, blob binary",
    )
    rows = {r.blob_id: (r.h0, r.h1) for r in image_dhash(df).collect()}
    assert rows[1] == rows[2]
