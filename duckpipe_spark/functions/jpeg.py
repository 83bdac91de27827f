"""Minimal pure-python baseline JPEG codec (stdlib ``struct`` + numpy).

Implements the subset of ITU-T T.81 (the public JPEG specification) a
curation pipeline's image-metadata pass meets first in real crawl data:
baseline sequential DCT, 8-bit samples, Huffman entropy coding, grayscale
and interleaved YCbCr (any sampling factors ≤ 2, i.e. 4:4:4 / 4:2:2 /
4:2:0), restart markers, multiple DQT/DHT segments. Progressive,
arithmetic-coded, 12-bit and hierarchical modes raise ``ValueError`` and
the caller falls back — the same honest-subset contract as
`functions/png.py`.

The encoder side (`encode_jpeg_gray`) writes a JFIF baseline grayscale
stream with the T.81 Annex K example quantization and Huffman tables, so
`decode_jpeg(encode_jpeg_gray(img))` is a REAL compress→decompress round
trip through scaled quantization, zigzag, DC prediction, run-length AC
coding and canonical Huffman — used by the `image_decode_jpeg` oracle
query, whose expected pixel values are computed analytically from the
quantizer (JPEG is lossy but exactly deterministic).

This is a from-scratch implementation of the public specification; the
zigzag order, table-scaling formula, and DC/AC coding procedures follow
the spec text (and the libjpeg quality→scale convention, which is itself
published in the IJG sources).
"""

from __future__ import annotations

import struct

import numpy as np

# T.81 Annex K.1 — example luminance quantization table, in natural
# (row-major) order.
K1_LUMA_QUANT = np.array(
    [
        [16, 11, 10, 16, 24, 40, 51, 61],
        [12, 12, 14, 19, 26, 58, 60, 55],
        [14, 13, 16, 24, 40, 57, 69, 56],
        [14, 17, 22, 29, 51, 87, 80, 62],
        [18, 22, 37, 56, 68, 109, 103, 77],
        [24, 35, 55, 64, 81, 104, 113, 92],
        [49, 64, 78, 87, 103, 121, 120, 101],
        [72, 92, 95, 98, 112, 100, 103, 99],
    ],
    dtype=np.int64,
)

# zigzag scan order: ZIGZAG[k] = (row, col) of the k-th coefficient
_Z = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

# T.81 Annex K.3 — example Huffman tables for luminance.
# (bits[i] = number of codes of length i+1, then symbol values.)
K3_DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
K3_DC_LUMA_VALS = list(range(12))
K3_AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
K3_AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]


def scaled_quant_table(quality: int) -> np.ndarray:
    """The IJG quality→table scaling (published libjpeg convention):
    quality 50 is the Annex K table verbatim, higher is finer. Values
    clamped to [1, 255] (8-bit DQT precision)."""
    q = min(max(int(quality), 1), 100)
    scale = 5000 // q if q < 50 else 200 - 2 * q
    t = (K1_LUMA_QUANT * scale + 50) // 100
    return np.clip(t, 1, 255).astype(np.int64)


def _dct_matrix() -> np.ndarray:
    x = np.arange(8)
    t = 0.5 * np.cos((2 * x[None, :] + 1) * x[:, None] * np.pi / 16)
    t[0, :] *= 1 / np.sqrt(2)
    return t


_T = _dct_matrix()


def _huff_encode_table(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length), canonical order per T.81 C.2."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.buf.append(0x00)
            self.nbits -= 8
            self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1-bits per spec


def _magnitude(v: int) -> tuple[int, int]:
    """(size, amplitude bits) for a DC diff / AC coefficient value."""
    if v == 0:
        return 0, 0
    a = abs(v)
    size = a.bit_length()
    bits = v if v > 0 else v + (1 << size) - 1
    return size, bits


def encode_jpeg_gray(img: np.ndarray, quality: int = 90) -> bytes:
    """Encode a (h, w) uint8 grayscale image as baseline JFIF JPEG with
    the Annex K example tables scaled to ``quality``."""
    if img.ndim != 2 or img.dtype != np.uint8:
        raise ValueError("encode_jpeg_gray expects a (h, w) uint8 array")
    h, w = img.shape
    if h == 0 or w == 0:
        raise ValueError("empty image")
    qt = scaled_quant_table(quality)
    # pad to 8x8 multiples by edge replication (the standard convention)
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    padded = np.pad(img, ((0, ph - h), (0, pw - w)), mode="edge")

    dc_tab = _huff_encode_table(K3_DC_LUMA_BITS, K3_DC_LUMA_VALS)
    ac_tab = _huff_encode_table(K3_AC_LUMA_BITS, K3_AC_LUMA_VALS)
    bw = _BitWriter()
    pred = 0
    qz = qt.reshape(-1)[_Z]  # quant divisors in zigzag order
    for by in range(0, ph, 8):
        for bx in range(0, pw, 8):
            block = padded[by : by + 8, bx : bx + 8].astype(np.float64) - 128.0
            coef = _T @ block @ _T.T
            zz = coef.reshape(-1)[_Z]
            q = np.round(zz / qz).astype(np.int64)
            # DC: coded as predicted difference
            diff = int(q[0]) - pred
            pred = int(q[0])
            size, bits = _magnitude(diff)
            code, length = dc_tab[size]
            bw.write(code, length)
            if size:
                bw.write(bits, size)
            # AC: (run, size) pairs with ZRL and EOB
            run = 0
            for k in range(1, 64):
                v = int(q[k])
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    code, length = ac_tab[0xF0]  # ZRL: 16 zeros
                    bw.write(code, length)
                    run -= 16
                size, bits = _magnitude(v)
                code, length = ac_tab[(run << 4) | size]
                bw.write(code, length)
                bw.write(bits, size)
                run = 0
            if run:
                code, length = ac_tab[0x00]  # EOB
                bw.write(code, length)
    bw.flush()

    out = bytearray()
    out += b"\xff\xd8"  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    # DQT: table 0, 8-bit precision, zigzag order
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + bytes(int(v) for v in qz)
    # SOF0: baseline, 8-bit, 1 component (id 1, sampling 1x1, qtable 0)
    out += b"\xff\xc0" + struct.pack(">HBHHB", 11, 8, h, w, 1) + b"\x01\x11\x00"
    # DHT: DC table 0 then AC table 0
    dc_payload = bytes(K3_DC_LUMA_BITS) + bytes(K3_DC_LUMA_VALS)
    ac_payload = bytes(K3_AC_LUMA_BITS) + bytes(K3_AC_LUMA_VALS)
    out += b"\xff\xc4" + struct.pack(">H", 3 + len(dc_payload)) + b"\x00" + dc_payload
    out += b"\xff\xc4" + struct.pack(">H", 3 + len(ac_payload)) + b"\x10" + ac_payload
    # SOS: 1 component, DC table 0 / AC table 0
    out += b"\xff\xda" + struct.pack(">HB", 8, 1) + b"\x01\x00\x00\x3f\x00"
    out += bw.buf
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# --------------------------------------------------------------------------
# decoder


class _BitReader:
    """Entropy-coded segment reader with FF00 unstuffing; restart markers
    are consumed by the caller via `align_to_marker`."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        d = self.data
        while self.nbits <= 24:
            if self.pos >= len(d):
                # spec: pad with 1-bits at the end of the segment
                self.acc = (self.acc << 8) | 0xFF
                self.nbits += 8
                continue
            byte = d[self.pos]
            if byte == 0xFF:
                nxt = d[self.pos + 1] if self.pos + 1 < len(d) else 0xD9
                if nxt == 0x00:  # stuffed FF
                    self.pos += 2
                elif 0xD0 <= nxt <= 0xD7 or nxt == 0xD9:
                    # restart/EOI marker: stop feeding real bits
                    self.acc = (self.acc << 8) | 0xFF
                    self.nbits += 8
                    continue
                else:
                    raise ValueError(f"unexpected marker {nxt:#x} in scan")
            else:
                self.pos += 1
            self.acc = (self.acc << 8) | byte
            self.nbits += 8

    def bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def reset_at_marker(self) -> None:
        """Skip to just past the next RSTn marker and clear bit state."""
        d = self.data
        p = self.pos
        while p + 1 < len(d) and not (d[p] == 0xFF and 0xD0 <= d[p + 1] <= 0xD7):
            p += 1
        if p + 1 >= len(d):
            raise ValueError("expected restart marker")
        self.pos = p + 2
        self.acc = 0
        self.nbits = 0


def _huff_decode_map(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol."""
    out: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return out


def _read_symbol(br: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code")


def _extend(bits: int, size: int) -> int:
    """T.81 F.2.2.1 EXTEND: map magnitude bits back to a signed value."""
    if size == 0:
        return 0
    if bits < (1 << (size - 1)):
        return bits - (1 << size) + 1
    return bits


def decode_jpeg(data: bytes) -> np.ndarray:
    """Decode a baseline JPEG blob → uint8 array (height, width, channels)
    with channels 1 (grayscale) or 3 (RGB from YCbCr). Raises ValueError
    outside the supported subset (progressive, arithmetic, 12-bit)."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    frame = None
    restart_interval = 0
    while pos + 2 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError("marker expected")
        # T.81 B.1.1.2: any number of 0xFF fill bytes may precede a marker
        while pos + 1 < len(data) and data[pos + 1] == 0xFF:
            pos += 1
        if pos + 2 > len(data):  # fill bytes ran to EOF — no marker byte left
            raise ValueError("truncated marker segment")
        marker = data[pos + 1]
        if marker == 0xD9:  # EOI
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:  # TEM / stray RSTn:
            pos += 2  # standalone markers carry no length segment
            continue
        if pos + 4 > len(data):
            raise ValueError("truncated marker segment")
        (seglen,) = struct.unpack_from(">H", data, pos + 2)
        seg = data[pos + 4 : pos + 2 + seglen]
        pos += 2 + seglen
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(seg):
                prec, tid = seg[i] >> 4, seg[i] & 0xF
                if prec != 0:
                    raise ValueError("16-bit quantization tables unsupported")
                zz = np.frombuffer(seg[i + 1 : i + 65], dtype=np.uint8).astype(np.int64)
                nat = np.zeros(64, dtype=np.int64)
                nat[_Z] = zz
                qtables[tid] = nat.reshape(8, 8)
                i += 65
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(seg):
                cls, tid = seg[i] >> 4, seg[i] & 0xF
                bits = list(seg[i + 1 : i + 17])
                n = sum(bits)
                vals = list(seg[i + 17 : i + 17 + n])
                htables[(cls, tid)] = _huff_decode_map(bits, vals)
                i += 17 + n
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1: baseline
            prec, h, w, nc = seg[0], *struct.unpack_from(">HH", seg, 1), seg[5]
            if prec != 8:
                raise ValueError("only 8-bit samples supported")
            if h == 0 or w == 0 or nc == 0:
                raise ValueError("zero-sized frame")
            if h * w > 1 << 26:  # 67M pixels: curation-kernel sanity cap
                raise ValueError("frame too large")
            comps = []
            for c in range(nc):
                cid, samp, qid = seg[6 + 3 * c], seg[7 + 3 * c], seg[8 + 3 * c]
                hs, vs = samp >> 4, samp & 0xF
                if hs == 0 or vs == 0:
                    raise ValueError("zero sampling factor")
                comps.append({"id": cid, "hs": hs, "vs": vs, "q": qid})
            frame = {"h": h, "w": w, "comps": comps}
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("only baseline sequential DCT JPEG supported")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xDA:  # SOS — entropy data follows
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = seg[0]
            scan_tabs = {}
            for c in range(ns):
                cid, tt = seg[1 + 2 * c], seg[2 + 2 * c]
                scan_tabs[cid] = (tt >> 4, tt & 0xF)
            return _decode_scan(
                data, pos, frame, scan_tabs, qtables, htables, restart_interval
            )
        # APPn / COM / others: skipped
    raise ValueError("no scan data found")


def _decode_scan(data, pos, frame, scan_tabs, qtables, htables, restart_interval):
    h, w, comps = frame["h"], frame["w"], frame["comps"]
    hmax = max(c["hs"] for c in comps)
    vmax = max(c["vs"] for c in comps)
    if hmax > 2 or vmax > 2:
        raise ValueError("sampling factors > 2 unsupported")
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    planes = [
        np.zeros((mcuy * c["vs"] * 8, mcux * c["hs"] * 8), dtype=np.float64)
        for c in comps
    ]
    br = _BitReader(data, pos)
    pred = [0] * len(comps)
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                br.reset_at_marker()
                pred = [0] * len(comps)
            for ci, c in enumerate(comps):
                if c["id"] not in scan_tabs:
                    raise ValueError("scan does not cover frame component")
                dc_tab = htables.get((0, scan_tabs[c["id"]][0]))
                ac_tab = htables.get((1, scan_tabs[c["id"]][1]))
                qt = qtables.get(c["q"])
                if dc_tab is None or ac_tab is None or qt is None:
                    raise ValueError("missing Huffman or quantization table")
                for by in range(c["vs"]):
                    for bx in range(c["hs"]):
                        zz = np.zeros(64, dtype=np.int64)
                        size = _read_symbol(br, dc_tab)
                        if size > 11:  # T.81 table F.1: DC size 0-11 for 8-bit
                            raise ValueError("invalid DC size category")
                        diff = _extend(br.bits(size), size)
                        pred[ci] += diff
                        zz[0] = pred[ci]
                        k = 1
                        while k < 64:
                            rs = _read_symbol(br, ac_tab)
                            run, size = rs >> 4, rs & 0xF
                            if rs == 0x00:  # EOB
                                break
                            if rs == 0xF0:  # ZRL
                                k += 16
                                continue
                            k += run
                            if k > 63:
                                raise ValueError("AC run past block end")
                            zz[k] = _extend(br.bits(size), size)
                            k += 1
                        nat = np.zeros(64, dtype=np.int64)
                        nat[_Z] = zz
                        block = nat.reshape(8, 8) * qt
                        pix = _T.T @ block.astype(np.float64) @ _T
                        y0 = (my * c["vs"] + by) * 8
                        x0 = (mx * c["hs"] + bx) * 8
                        planes[ci][y0 : y0 + 8, x0 : x0 + 8] = pix
            mcu_count += 1
    # upsample each plane to full MCU-grid resolution, then crop
    full = []
    for c, p in zip(comps, planes):
        p = np.repeat(np.repeat(p, vmax // c["vs"], axis=0), hmax // c["hs"], axis=1)
        full.append(p[:h, :w])
    if len(comps) == 1:
        out = np.clip(np.round(full[0] + 128.0), 0, 255).astype(np.uint8)
        return out[:, :, None]
    if len(comps) == 3:
        y, cb, cr = full[0] + 128.0, full[1], full[2]
        r = y + 1.402 * cr
        g = y - 0.344136 * cb - 0.714136 * cr
        b = y + 1.772 * cb
        rgb = np.stack([r, g, b], axis=-1)
        return np.clip(np.round(rgb), 0, 255).astype(np.uint8)
    raise ValueError(f"{len(comps)}-component JPEG unsupported")
