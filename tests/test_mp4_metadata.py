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
