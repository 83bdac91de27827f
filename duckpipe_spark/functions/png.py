"""Minimal pure-python PNG decoder (stdlib ``zlib`` + numpy).

Implements the subset of the PNG spec (RFC 2083 / W3C PNG) a curation
pipeline's image-metadata pass needs: 8-bit, non-interlaced, colour types
greyscale (0), RGB (2), palette (3), grey+alpha (4) and RGBA (6), with all
five scanline filters (None/Sub/Up/Average/Paeth). This gives
``decode_images`` a REAL decode path in environments without an image
library; anything outside the subset raises ``ValueError`` and the caller
falls back (or surfaces the row as undecodable).

This is a from-scratch implementation of the public specification — the
unfilter loop follows the spec's pseudocode directly.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIGNATURE = b"\x89PNG\r\n\x1a\n"
# channels per colour type
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def decode_png(data: bytes) -> np.ndarray:
    """Decode a PNG blob → uint8 array of shape (height, width, channels).
    Palette images are expanded to RGB. Raises ValueError outside the
    supported subset (16-bit, interlaced, malformed)."""
    if data[:8] != _SIGNATURE:
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    ihdr = None
    idat = bytearray()
    palette = None
    while pos + 8 <= len(data):
        (length,), ctype = struct.unpack_from(">I", data, pos), data[pos + 4 : pos + 8]
        chunk = data[pos + 8 : pos + 8 + length]
        if len(chunk) != length:
            raise ValueError("truncated PNG chunk")
        pos += 12 + length  # length + type + data + crc (crc not verified)
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", chunk)
        elif ctype == b"PLTE":
            palette = np.frombuffer(chunk, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat += chunk
        elif ctype == b"IEND":
            break
    if ihdr is None:
        raise ValueError("missing IHDR")
    width, height, bit_depth, color_type, compression, filter_method, interlace = ihdr
    if bit_depth != 8:
        raise ValueError(f"unsupported bit depth {bit_depth}")
    if color_type not in _CHANNELS:
        raise ValueError(f"unsupported colour type {color_type}")
    if compression != 0 or filter_method != 0:
        raise ValueError("unsupported compression/filter method")
    if interlace != 0:
        raise ValueError("interlaced PNG not supported")
    if width == 0 or height == 0:
        raise ValueError("zero-dimension PNG")
    ch = _CHANNELS[color_type]
    stride = width * ch
    raw = zlib.decompress(bytes(idat))
    if len(raw) != (stride + 1) * height:
        raise ValueError("IDAT size mismatch")

    out = np.empty((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(height):
        f = raw[y * (stride + 1)]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=y * (stride + 1) + 1
        ).copy()
        if f == 0:  # None
            cur = line
        elif f == 1:  # Sub
            cur = line
            for i in range(ch, stride):
                cur[i] = (int(cur[i]) + int(cur[i - ch])) & 0xFF
        elif f == 2:  # Up
            cur = (line.astype(np.uint16) + prev).astype(np.uint8)
        elif f == 3:  # Average
            cur = line
            for i in range(stride):
                a = cur[i - ch] if i >= ch else 0
                cur[i] = (int(cur[i]) + ((int(a) + int(prev[i])) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            cur = line
            for i in range(stride):
                a = int(cur[i - ch]) if i >= ch else 0
                c = int(prev[i - ch]) if i >= ch else 0
                cur[i] = (int(cur[i]) + _paeth(a, int(prev[i]), c)) & 0xFF
        else:
            raise ValueError(f"unknown scanline filter {f}")
        out[y] = cur
        prev = out[y]

    img = out.reshape(height, width, ch)
    if color_type == 3:
        if palette is None:
            raise ValueError("palette image without PLTE")
        if int(img.max()) >= len(palette):
            raise ValueError("palette index out of range")
        img = palette[img[:, :, 0]]
    return img


def _chunk(ctype: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + ctype
        + payload
        + struct.pack(">I", zlib.crc32(ctype + payload) & 0xFFFFFFFF)
    )


def encode_png(img: np.ndarray, filter_type: int = 0) -> bytes:
    """Encode a uint8 (h, w) or (h, w, ch) array as a PNG (test-fixture
    writer; applies one filter type to every scanline so the decoder's
    unfilter paths can be exercised individually)."""
    arr = np.asarray(img, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, ch = arr.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    flat = arr.reshape(h, w * ch).astype(np.int16)
    stride = w * ch
    lines = bytearray()
    prev = np.zeros(stride, dtype=np.int16)
    for y in range(h):
        cur = flat[y]
        if filter_type == 0:
            enc = cur
        elif filter_type == 1:
            left = np.concatenate([np.zeros(ch, np.int16), cur[:-ch]])
            enc = cur - left
        elif filter_type == 2:
            enc = cur - prev
        elif filter_type == 3:
            left = np.concatenate([np.zeros(ch, np.int16), cur[:-ch]])
            enc = cur - ((left + prev) >> 1)
        elif filter_type == 4:
            enc = np.empty(stride, dtype=np.int16)
            for i in range(stride):
                a = int(cur[i - ch]) if i >= ch else 0
                c = int(prev[i - ch]) if i >= ch else 0
                enc[i] = cur[i] - _paeth(a, int(prev[i]), c)
        else:
            raise ValueError(f"unknown filter {filter_type}")
        lines.append(filter_type)
        lines += (enc & 0xFF).astype(np.uint8).tobytes()
        prev = cur
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        _SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(lines)))
        + _chunk(b"IEND", b"")
    )
