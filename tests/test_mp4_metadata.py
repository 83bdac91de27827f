"""ISO-BMFF box-walk metadata parser round trips (pure-python)."""

from __future__ import annotations

import struct

import pytest

from duckpipe_spark.functions.mp4 import build_minimal_mp4, parse_mp4_metadata


def test_round_trip_single_video_track():
    blob = build_minimal_mp4(12.5, timescale=1000, tracks=(("vide", 1280, 720),))
    m = parse_mp4_metadata(blob)
    assert m["brand"] == "isom"
    assert m["timescale"] == 1000
    assert m["duration_s"] == 12.5
    assert m["n_tracks"] == 1
    assert m["tracks"] == [{"type": "vide", "width": 1280, "height": 720}]


def test_round_trip_av_tracks():
    blob = build_minimal_mp4(3.25, timescale=48000, tracks=(("vide", 640, 480), ("soun", 0, 0)))
    m = parse_mp4_metadata(blob)
    assert m["n_tracks"] == 2
    assert [t["type"] for t in m["tracks"]] == ["vide", "soun"]
    assert m["tracks"][0]["width"] == 640
    assert m["duration_s"] == 3.25


def test_sniff_alignment_with_multimodal():
    from duckpipe_spark.functions.multimodal import _sniff_format

    assert _sniff_format(build_minimal_mp4(1.0)) == "mp4"


def test_rejects_non_bmff_and_malformed():
    with pytest.raises(ValueError, match="ftyp"):
        parse_mp4_metadata(b"RIFF....WAVE")
    # valid ftyp but a box whose size overruns the blob
    bad = build_minimal_mp4(1.0)[:40] + struct.pack(">I", 9999) + b"free"
    with pytest.raises(ValueError):
        parse_mp4_metadata(bad)
    # ftyp only, no moov -> unplayable
    ftyp_only = build_minimal_mp4(1.0)[:24]
    with pytest.raises(ValueError, match="mvhd"):
        parse_mp4_metadata(ftyp_only)


def test_version1_64bit_mvhd():
    """64-bit duration variant of mvhd (version 1) parses identically."""
    blob = build_minimal_mp4(2.0, timescale=90000)
    # rebuild the mvhd payload as version 1 by hand
    i = blob.find(b"mvhd") - 4
    (size,) = struct.unpack_from(">I", blob, i)
    v1 = (
        b"\x01\x00\x00\x00"
        + struct.pack(">QQ", 0, 0)
        + struct.pack(">IQ", 90000, 180000)
        + b"\x00" * 80
    )
    v1box = struct.pack(">I", 8 + len(v1)) + b"mvhd" + v1
    patched = blob[:i] + v1box + blob[i + size:]
    # fix the enclosing moov size
    delta = len(v1box) - size
    j = patched.find(b"moov") - 4
    (msize,) = struct.unpack_from(">I", patched, j)
    patched = patched[:j] + struct.pack(">I", msize + delta) + patched[j + 4:]
    m = parse_mp4_metadata(patched)
    assert m["timescale"] == 90000 and m["duration_s"] == 2.0


def test_fuzz_parser_never_crashes():
    """Arbitrary bytes and single-byte corruptions of a valid shell must
    raise ValueError (or parse) — never hang on the box walk."""
    from hypothesis import given, settings, strategies as st

    valid = build_minimal_mp4(3.0, tracks=(("vide", 64, 48), ("soun", 0, 0)))

    @settings(max_examples=150, deadline=2000)
    @given(st.binary(min_size=0, max_size=300))
    def fuzz_raw(data):
        try:
            parse_mp4_metadata(data)
        except (ValueError, struct.error):
            pass

    @settings(max_examples=150, deadline=2000)
    @given(st.integers(0, len(valid) - 1), st.integers(0, 255))
    def fuzz_corrupt(pos, byte):
        try:
            parse_mp4_metadata(valid[:pos] + bytes([byte]) + valid[pos + 1 :])
        except (ValueError, struct.error):
            pass

    fuzz_raw()
    fuzz_corrupt()


def test_mjpeg_sample_table_round_trip():
    """build_mjpeg_mp4 → parse_video_sample_table → vendored JPEG decode
    recovers every frame exactly (constant frames, quality 95)."""
    import numpy as np

    from duckpipe_spark.functions.jpeg import decode_jpeg, encode_jpeg_gray
    from duckpipe_spark.functions.mp4 import build_mjpeg_mp4, parse_video_sample_table

    vals = [10, 200, 77, 255, 0]
    frames = [encode_jpeg_gray(np.full((16, 16), v, np.uint8), quality=95) for v in vals]
    blob = build_mjpeg_mp4(frames, fps=4)
    st = parse_video_sample_table(blob)
    assert st["codec"] == "jpeg"
    assert len(st["samples"]) == len(vals)
    for (off, size), v in zip(st["samples"], vals):
        arr = decode_jpeg(blob[off : off + size])
        assert int(arr.min()) == int(arr.max()) == v
    # the metadata walker reads the same file
    meta = parse_mp4_metadata(blob)
    assert meta["tracks"][0] == {"type": "vide", "width": 16, "height": 16}
    assert meta["duration_s"] == len(vals) / 4


def test_multi_chunk_stsc_resolution():
    """ISO 14496-12 §8.7.4: an stsc entry covers chunks up to the NEXT
    entry's first_chunk; offsets accumulate within each chunk. Hand-built
    two-entry table: chunks of 2,2,1 samples."""
    import struct

    from duckpipe_spark.functions.mp4 import parse_video_sample_table

    def box(btype, payload):
        return struct.pack(">I", 8 + len(payload)) + btype + payload

    sizes = [5, 7, 11, 13, 17]
    payload = bytes(range(10)) * 6
    ftyp = box(b"ftyp", b"isom" + struct.pack(">I", 0) + b"isom")
    mdat = box(b"mdat", payload)
    base = len(ftyp) + 8
    # chunk1 @ base: samples 0,1; chunk2 @ base+12: samples 2,3; chunk3: sample 4
    stsd = box(b"stsd", b"\x00" * 4 + struct.pack(">I", 1) + box(b"jpeg", b"\x00" * 78))
    stsz = box(b"stsz", b"\x00" * 4 + struct.pack(">II", 0, 5) + struct.pack(">5I", *sizes))
    stsc = box(
        b"stsc",
        b"\x00" * 4 + struct.pack(">I", 2)
        + struct.pack(">III", 1, 2, 1)  # chunks 1-2: two samples each
        + struct.pack(">III", 3, 1, 1),  # chunk 3 onward: one sample
    )
    stco = box(
        b"stco",
        b"\x00" * 4 + struct.pack(">I", 3)
        + struct.pack(">3I", base, base + 12, base + 24),
    )
    hdlr = box(b"hdlr", b"\x00" * 8 + b"vide" + b"\x00" * 13)
    stbl = box(b"stbl", stsd + stsz + stsc + stco)
    trak = box(b"trak", box(b"mdia", hdlr + box(b"minf", stbl)))
    mvhd = box(b"mvhd", b"\x00" * 12 + struct.pack(">II", 1000, 1000) + b"\x00" * 80)
    blob = ftyp + mdat + box(b"moov", mvhd + trak)
    st = parse_video_sample_table(blob)
    assert st["samples"] == [
        (base, 5), (base + 5, 7),          # chunk 1
        (base + 12, 11), (base + 23, 13),  # chunk 2
        (base + 24, 17),                   # chunk 3
    ]


def test_sample_table_rejects_incomplete():
    import struct

    import pytest as _pytest

    from duckpipe_spark.functions.mp4 import build_minimal_mp4, parse_video_sample_table

    # a metadata-only MP4 (no stbl) must raise, not return garbage
    with _pytest.raises(ValueError, match="sample table"):
        parse_video_sample_table(build_minimal_mp4(1.0))
    with _pytest.raises(ValueError, match="ftyp"):
        parse_video_sample_table(b"\x00" * 32)


def test_fuzz_sample_table_parser_never_crashes():
    """Same no-hang/no-crash contract for the stbl resolver: arbitrary
    bytes and single-byte corruptions of a valid MJPEG file must raise
    ValueError/struct.error or return a well-formed table — never hang
    or index out of range."""
    import numpy as np
    from hypothesis import given, settings, strategies as st

    from duckpipe_spark.functions.jpeg import encode_jpeg_gray
    from duckpipe_spark.functions.mp4 import build_mjpeg_mp4, parse_video_sample_table

    frames = [encode_jpeg_gray(np.full((8, 8), v, np.uint8)) for v in (1, 2, 3)]
    valid = build_mjpeg_mp4(frames, fps=2)

    @settings(max_examples=150, deadline=2000)
    @given(st.binary(min_size=0, max_size=300))
    def fuzz_raw(data):
        try:
            parse_video_sample_table(data)
        except (ValueError, struct.error):
            pass

    @settings(max_examples=200, deadline=2000)
    @given(st.integers(0, len(valid) - 1), st.integers(0, 255))
    def fuzz_flip(pos, b):
        data = valid[:pos] + bytes([b]) + valid[pos + 1 :]
        try:
            st_ = parse_video_sample_table(data)
            assert all(sz >= 0 and off >= 0 for off, sz in st_["samples"])
        except (ValueError, struct.error):
            pass

    fuzz_raw()
    fuzz_flip()


def test_sample_table_rejects_zero_first_chunk():
    """ADVICE r6: stsc first_chunk is 1-based (ISO 14496-12 §8.7.4); a
    spec-invalid 0 would alias chunks[-1] via Python negative indexing
    and yield wrong sample extents — must raise instead."""
    import re
    import struct

    import pytest as _pytest

    from duckpipe_spark.functions.mp4 import build_mjpeg_mp4, parse_video_sample_table

    blob = build_mjpeg_mp4([b"\xff\xd8" + b"\x00" * 6 + b"\xff\xd9"] * 3)
    # locate the stsc box and zero its first entry's first_chunk field
    ix = blob.index(b"stsc")
    entry0 = ix + 4 + 4 + 4  # box type + (version|flags) + entry_count
    assert struct.unpack_from(">I", blob, entry0)[0] >= 1
    patched = blob[:entry0] + struct.pack(">I", 0) + blob[entry0 + 4 :]
    with _pytest.raises(ValueError, match=re.escape("invalid stsc first_chunk")):
        parse_video_sample_table(patched)
