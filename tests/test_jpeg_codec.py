"""Baseline JPEG codec round trips (pure-python, T.81 subset).

The oracle logic mirrored by `image_decode_jpeg`: for a CONSTANT image the
DCT has only a DC coefficient, so the decoded value is analytically
predictable from the quantizer — decoded = clamp(round(q_dc *
round(8*(v-128)/q_dc) / 8) + 128). Gradient images round-trip within the
quantizer's worst-case error bound instead.
"""

from __future__ import annotations

import numpy as np
import pytest

from duckpipe_spark.functions.jpeg import (
    decode_jpeg,
    encode_jpeg_gray,
    scaled_quant_table,
)


@pytest.mark.parametrize("v", [0, 1, 17, 128, 200, 254, 255])
@pytest.mark.parametrize("quality", [88, 95, 97])
def test_constant_image_round_trip_is_exact_when_qdc_divides_8(v, quality):
    """When q_dc ∈ {1, 2, 4, 8}, both rounding steps of the DC path are
    exact in IEEE floats (8Δ/q and q·dc/8 are integers), so a constant
    image round-trips to ITSELF — through the full
    DCT→quant→zigzag→Huffman→parse→dequant→IDCT pipeline. These are the
    qualities the oracle query uses; quantizers that put values on .5
    boundaries (e.g. q=16 at odd Δ) are deliberately avoided, because the
    float DCT lands ε below the analytic value and the rounding there is
    an implementation artifact, not spec behavior."""
    q = int(scaled_quant_table(quality)[0, 0])
    assert q in (1, 2, 4, 8), f"test precondition: quality {quality} -> q {q}"
    img = np.full((13, 10), v, dtype=np.uint8)
    out = decode_jpeg(encode_jpeg_gray(img, quality=quality))
    assert out.shape == (13, 10, 1)
    assert int(out.min()) == int(out.max()) == v


def test_constant_image_low_quality_is_analytically_lossy():
    """quality 30 → q_dc = 27: Δ=1 quantizes to round(8/27) = 0, so 129
    decodes to 128 — real quantization loss, far from any .5 boundary."""
    assert int(scaled_quant_table(30)[0, 0]) == 27
    img = np.full((8, 8), 129, dtype=np.uint8)
    out = decode_jpeg(encode_jpeg_gray(img, quality=30))
    assert int(out.min()) == int(out.max()) == 128


@pytest.mark.parametrize("shape", [(8, 8), (1, 1), (7, 9), (24, 17), (64, 48)])
def test_gradient_round_trip_error_bounded(shape):
    h, w = shape
    yy, xx = np.mgrid[0:h, 0:w]
    img = ((yy * 5 + xx * 3) % 256).astype(np.uint8)
    out = decode_jpeg(encode_jpeg_gray(img, quality=95))[:, :, 0]
    assert out.shape == img.shape
    # quality-95 quantizer: worst-case per-coefficient error q/2; the
    # block-level L-inf error is bounded by sum(q)/16 in practice — use a
    # generous but failing-if-broken bound
    err = np.abs(out.astype(np.int64) - img.astype(np.int64))
    assert err.max() <= 40, f"max err {err.max()}"
    assert err.mean() <= 10


def test_dc_prediction_across_blocks():
    """Multi-block image with very different block means exercises the DC
    difference chain."""
    img = np.zeros((8, 32), dtype=np.uint8)
    img[:, 8:16] = 255
    img[:, 16:24] = 17
    img[:, 24:] = 200
    out = decode_jpeg(encode_jpeg_gray(img, quality=90))[:, :, 0]
    for bx, v in [(0, 0), (8, 255), (16, 17), (24, 200)]:
        assert abs(int(out[4, bx + 4]) - v) <= 3


def test_format_sniff_and_rejects():
    img = np.full((8, 8), 100, dtype=np.uint8)
    blob = encode_jpeg_gray(img)
    assert blob[:3] == b"\xff\xd8\xff"
    from duckpipe_spark.functions.multimodal import _sniff_format

    assert _sniff_format(blob) == "jpeg"
    with pytest.raises(ValueError):
        decode_jpeg(b"\x89PNG\r\n\x1a\nnot a jpeg")
    with pytest.raises(ValueError):
        decode_jpeg(blob[:20])  # truncated: no scan


def test_non_multiple_of_8_uses_edge_padding():
    """Edge-replication padding must not bleed artifacts into the crop."""
    img = np.full((9, 11), 77, dtype=np.uint8)
    out = decode_jpeg(encode_jpeg_gray(img, quality=95))
    assert out.shape == (9, 11, 1)
    assert int(out.min()) == int(out.max()) == 77  # q_dc=2: exact DC path


def test_fuzz_decoder_never_crashes():
    """Arbitrary bytes and truncations/corruptions of a valid stream must
    raise ValueError (or decode) — never hang, loop, or raise an
    unexpected exception type. Property-based like the WKB codec's
    garbage tests."""
    from hypothesis import given, settings, strategies as st

    img = np.arange(64, dtype=np.uint8).reshape(8, 8)
    valid = encode_jpeg_gray(img, quality=90)

    @settings(max_examples=150, deadline=2000)
    @given(st.binary(min_size=0, max_size=400))
    def fuzz_raw(data):
        try:
            decode_jpeg(data)
        except (ValueError, IndexError, struct.error):
            pass

    @settings(max_examples=150, deadline=2000)
    @given(st.integers(0, len(valid) - 1), st.integers(0, 255))
    def fuzz_corrupt(pos, byte):
        blob = valid[:pos] + bytes([byte]) + valid[pos + 1 :]
        try:
            decode_jpeg(blob)
        except (ValueError, IndexError, struct.error):
            pass

    import struct

    fuzz_raw()
    fuzz_corrupt()


def test_fill_bytes_and_standalone_markers_between_segments():
    """ADVICE r5 / T.81 B.1.1.2: 0xFF fill bytes may pad any marker, and
    TEM (0x01) / stray RSTn markers are standalone (no length segment).
    Both are legal in the baseline subset and must not be rejected."""
    img = np.full((16, 16), 128, np.uint8)
    blob = encode_jpeg_gray(img, quality=90)
    ref = decode_jpeg(blob)
    # fill bytes + TEM right after SOI
    padded = blob[:2] + b"\xff\xff\x01" + blob[2:]
    np.testing.assert_array_equal(decode_jpeg(padded), ref)
    # stray RST4 between marker segments
    stray = blob[:2] + b"\xff\xd4" + blob[2:]
    np.testing.assert_array_equal(decode_jpeg(stray), ref)


def test_fill_bytes_running_to_eof_raise_value_error():
    """ADVICE r6: a stream ending in 0xFF fill bytes (e.g. ff d8 ff ff)
    must raise the documented ValueError('truncated marker segment'),
    not IndexError from reading the marker byte past the buffer."""
    import pytest as _pytest

    for blob in (b"\xff\xd8\xff\xff", b"\xff\xd8\xff\xff\xff"):
        with _pytest.raises(ValueError, match="truncated"):
            decode_jpeg(blob)
    with _pytest.raises(ValueError):  # lone trailing 0xFF: also ValueError
        decode_jpeg(b"\xff\xd8\xff")
