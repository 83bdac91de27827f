"""WKB (Well-Known Binary) codec, pure numpy/struct.

Replaces the reference's WKT boundary serialization
(`duckpipe/core.py:143` ST_AsText / `Worker.py:36` ST_GeomFromText): the
engine keeps geometry as WKB ``BinaryType`` columns end-to-end (what Parquet
stores for DuckDB/GeoParquet GEOMETRY columns) and decodes to numpy only
inside kernels.

Supports Point/LineString/Polygon/Multi*/GeometryCollection, both byte
orders; tolerates EWKB SRID flags and accepts Z/M ordinates (ISO +1000
offsets or EWKB flags) by dropping them — the engine is planar. Output is
little-endian ISO 2D WKB.
"""

from __future__ import annotations

import struct

import numpy as np

_POINT, _LINESTRING, _POLYGON = 1, 2, 3
_MULTIPOINT, _MULTILINESTRING, _MULTIPOLYGON, _COLLECTION = 4, 5, 6, 7

_TYPE_NAMES = {
    _POINT: "Point",
    _LINESTRING: "LineString",
    _POLYGON: "Polygon",
    _MULTIPOINT: "MultiPoint",
    _MULTILINESTRING: "MultiLineString",
    _MULTIPOLYGON: "MultiPolygon",
    _COLLECTION: "GeometryCollection",
}
_NAME_TYPES = {v: k for k, v in _TYPE_NAMES.items()}

_EWKB_SRID_FLAG = 0x20000000
_EWKB_Z_FLAG = 0x80000000
_EWKB_M_FLAG = 0x40000000


class Geometry:
    """Lightweight planar geometry.

    ``data`` layout by ``gtype``:
      Point              -> np.ndarray (2,) or None (EMPTY)
      LineString         -> np.ndarray (n, 2)
      Polygon            -> list[np.ndarray (n, 2)] rings, exterior first
      Multi*/Collection  -> list[Geometry]
    """

    __slots__ = ("gtype", "data")

    def __init__(self, gtype: str, data):
        self.gtype = gtype
        self.data = data

    def __repr__(self) -> str:  # pragma: no cover
        return f"<Geometry {self.gtype}>"

    @property
    def is_empty(self) -> bool:
        if self.gtype == "Point":
            return self.data is None
        if self.gtype in ("LineString",):
            return len(self.data) == 0
        return len(self.data) == 0


def point(x: float, y: float) -> Geometry:
    return Geometry("Point", np.array([x, y], dtype=np.float64))


def linestring(coords) -> Geometry:
    return Geometry("LineString", np.asarray(coords, dtype=np.float64).reshape(-1, 2))


def polygon(rings) -> Geometry:
    return Geometry(
        "Polygon", [np.asarray(r, dtype=np.float64).reshape(-1, 2) for r in rings]
    )


def multi(gtype: str, geoms: list[Geometry]) -> Geometry:
    return Geometry(gtype, list(geoms))


# ---------------------------------------------------------------------------
# decode
# ---------------------------------------------------------------------------


class _Reader:
    __slots__ = ("buf", "pos")

    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 0

    def u8(self) -> int:
        if self.pos >= len(self.buf):
            raise ValueError("truncated WKB")
        v = self.buf[self.pos]
        self.pos += 1
        return v

    def u32(self, le: bool) -> int:
        try:
            v = struct.unpack_from("<I" if le else ">I", self.buf, self.pos)[0]
        except struct.error as e:
            raise ValueError(f"truncated WKB: {e}") from e
        self.pos += 4
        return v

    def check_count(self, n: int, min_bytes_each: int) -> int:
        """Sanity-bound an element count against the remaining buffer: a
        garbage count field (corrupt row) must fail fast instead of driving
        a multi-gigabyte allocation or a billion-iteration loop."""
        if n * min_bytes_each > len(self.buf) - self.pos:
            raise ValueError(
                f"malformed WKB: count {n} exceeds remaining buffer "
                f"({len(self.buf) - self.pos} bytes)"
            )
        return n

    def coords(self, n: int, le: bool, extra: int = 0) -> np.ndarray:
        """Read n points of (2 + extra) doubles each; Z/M ordinates (extra)
        are read and dropped — the engine is planar."""
        dims = 2 + extra
        self.check_count(n, 8 * dims)
        arr = np.frombuffer(
            self.buf, dtype="<f8" if le else ">f8", count=dims * n, offset=self.pos
        )
        self.pos += 8 * dims * n
        return arr.astype(np.float64).reshape(-1, dims)[:, :2]


def _read_geometry(r: _Reader) -> Geometry:
    le = r.u8() == 1
    type_word = r.u32(le)
    if type_word & _EWKB_SRID_FLAG:
        r.u32(le)  # skip SRID
    # Z/M ordinates are accepted and DROPPED (planar engine): EWKB flags or
    # the ISO +1000 (Z) / +2000 (M) / +3000 (ZM) type offsets
    extra = int(bool(type_word & _EWKB_Z_FLAG)) + int(bool(type_word & _EWKB_M_FLAG))
    base = type_word & 0x1FFFFFFF
    if extra == 0 and 1000 <= base < 4000:
        extra = 2 if base >= 3000 else 1
    base = base % 1000 if base < 4000 else base
    if base == _POINT:
        c = r.coords(1, le, extra)[0]
        if np.isnan(c).all():
            return Geometry("Point", None)  # POINT EMPTY convention
        return Geometry("Point", c)
    if base == _LINESTRING:
        n = r.u32(le)
        return Geometry("LineString", r.coords(n, le, extra))
    if base == _POLYGON:
        n_rings = r.check_count(r.u32(le), 4)  # each ring: at least a count
        rings = [r.coords(r.u32(le), le, extra) for _ in range(n_rings)]
        return Geometry("Polygon", rings)
    if base in (_MULTIPOINT, _MULTILINESTRING, _MULTIPOLYGON, _COLLECTION):
        n = r.check_count(r.u32(le), 5)  # each sub-geom: order byte + type
        return Geometry(_TYPE_NAMES[base], [_read_geometry(r) for _ in range(n)])
    raise ValueError(f"unsupported WKB type {base}")


def from_wkb(
    buf: bytes | bytearray | memoryview | None, tolerant: bool = False
) -> Geometry | None:
    """Decode one WKB buffer. ``tolerant=True`` returns None for malformed
    input (truncated buffer, garbage type word, absurd counts)
    instead of raising — corpus data at scale always contains garbage rows,
    and one corrupt geometry must not kill a 100 TB decode job. Callers
    that want the skip COUNTED use ``operators.features.wkb_decode_stats``.
    """
    if buf is None:
        return None
    try:
        return _read_geometry(_Reader(bytes(buf)))
    except ValueError:
        if tolerant:
            return None
        raise
    except (struct.error, IndexError, OverflowError, RecursionError) as e:  # defensive: garbage bytes
        if tolerant:
            return None
        raise ValueError(f"malformed WKB: {e}") from e


# ---------------------------------------------------------------------------
# encode (little-endian ISO WKB)
# ---------------------------------------------------------------------------


def _write_geometry(g: Geometry, out: bytearray) -> None:
    out.append(1)
    t = _NAME_TYPES[g.gtype]
    out += struct.pack("<I", t)
    if g.gtype == "Point":
        c = g.data if g.data is not None else np.array([np.nan, np.nan])
        out += struct.pack("<2d", float(c[0]), float(c[1]))
    elif g.gtype == "LineString":
        arr = np.ascontiguousarray(g.data, dtype="<f8")
        out += struct.pack("<I", len(arr))
        out += arr.tobytes()
    elif g.gtype == "Polygon":
        out += struct.pack("<I", len(g.data))
        for ring in g.data:
            arr = np.ascontiguousarray(ring, dtype="<f8")
            out += struct.pack("<I", len(arr))
            out += arr.tobytes()
    else:
        out += struct.pack("<I", len(g.data))
        for sub in g.data:
            _write_geometry(sub, out)


def to_wkb(g: Geometry | None) -> bytes | None:
    if g is None:
        return None
    out = bytearray()
    _write_geometry(g, out)
    return bytes(out)
