"""Property-based tests (SURVEY.md §5 item 4) over the geometry kernel and
the result-assembly contract."""

import math

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from duckpipe_spark.geo import geom, wkb
from duckpipe_spark.geo.crs import lonlat_to_tm, tm_to_lonlat
from duckpipe_spark.geo.hilbert import hilbert_d

coord = st.floats(-1e6, 1e6, allow_nan=False, width=64)


@given(st.lists(st.tuples(coord, coord), min_size=2, max_size=30))
@settings(max_examples=200, deadline=None)
def test_wkb_roundtrip_linestring(coords):
    g = wkb.linestring(coords)
    g2 = wkb.from_wkb(wkb.to_wkb(g))
    assert np.allclose(g2.data, np.asarray(coords), rtol=0, atol=0)


@given(st.binary(min_size=0, max_size=200))
@settings(max_examples=300, deadline=None)
def test_wkb_tolerant_never_raises_on_garbage(buf):
    """tolerant decode is total over arbitrary bytes: malformed input maps
    to None (or decodes, if the bytes happen to be valid WKB) — never an
    exception, never a huge allocation from a garbage count field."""
    g = wkb.from_wkb(buf, tolerant=True)
    assert g is None or isinstance(g, wkb.Geometry)


@given(st.lists(st.tuples(coord, coord), min_size=2, max_size=10), st.integers(1, 40))
@settings(max_examples=200, deadline=None)
def test_wkb_truncated_raises_strict_skips_tolerant(coords, cut):
    """Every strict prefix of a valid buffer is malformed: strict mode
    raises ValueError, tolerant mode returns None (a truncated buffer must
    never decode to a silently-shorter geometry)."""
    buf = wkb.to_wkb(wkb.linestring(coords))
    trunc = buf[: max(0, len(buf) - cut)]
    if not trunc or len(trunc) >= len(buf):
        return
    with pytest.raises(ValueError):
        wkb.from_wkb(trunc)
    assert wkb.from_wkb(trunc, tolerant=True) is None


@given(st.lists(st.tuples(coord, coord, coord), min_size=2, max_size=15))
@settings(max_examples=100, deadline=None)
def test_wkb_z_coords_dropped(coords3d):
    """ISO LineString Z (type 1002) and EWKB Z-flag both decode with the Z
    ordinate dropped (planar engine)."""
    import struct as _s

    n = len(coords3d)
    flat = [v for xyz in coords3d for v in xyz]
    body = _s.pack("<I", n) + _s.pack(f"<{3 * n}d", *flat)
    for type_word in (1002, 2 | 0x80000000):  # ISO +1000, EWKB Z flag
        buf = b"\x01" + _s.pack("<I", type_word) + body
        g = wkb.from_wkb(buf)
        assert g.gtype == "LineString"
        expect = np.asarray([(x, y) for x, y, _ in coords3d])
        assert np.array_equal(g.data, expect)


def test_wkb_garbage_count_fails_fast():
    """A corrupt count field (here: 2^31 points) must raise, not allocate."""
    import struct

    evil = b"\x01" + struct.pack("<I", 2) + struct.pack("<I", 1 << 31)  # linestring
    with pytest.raises(ValueError):
        wkb.from_wkb(evil)
    assert wkb.from_wkb(evil, tolerant=True) is None


@given(st.lists(st.tuples(coord, coord), min_size=3, max_size=20), coord, coord)
@settings(max_examples=200, deadline=None)
def test_distance_symmetry_point_vertices(coords, px, py):
    g = wkb.linestring(coords)
    d = geom.distance_point(px, py, g)
    assert d >= 0
    # distance to any vertex bounds the min distance from above
    v = np.asarray(coords)
    dmin_vertex = np.hypot(v[:, 0] - px, v[:, 1] - py).min()
    assert d <= dmin_vertex + 1e-9


@given(
    st.floats(1.0, 10000.0),
    st.floats(1.0, 10000.0),
    coord,
    coord,
)
@settings(max_examples=100, deadline=None)
def test_buffer_area_monotone(r1, r2, cx, cy):
    """Larger buffer ⇒ intersection area with a fixed polygon can't shrink."""
    ring = [(cx - 3000, cy - 3000), (cx + 3000, cy - 3000), (cx + 3000, cy + 3000), (cx - 3000, cy + 3000)]
    g = wkb.polygon([ring])
    lo, hi = sorted((r1, r2))
    a_lo = geom.circle_polygon_area(cx + 100, cy - 50, lo, g)
    a_hi = geom.circle_polygon_area(cx + 100, cy - 50, hi, g)
    # Tolerances are relative: shoelace area at |coord|~1e6 carries ~1e-4
    # absolute rounding, so a fixed 1e-6 slack misfires far from the origin.
    tol = 1e-9 * max(1.0, a_hi)
    assert a_hi >= a_lo - tol
    assert a_hi <= geom.circle_area(hi) + tol
    assert a_hi <= geom.area(g) + tol


@given(st.floats(100.0, 5000.0), coord, coord)
@settings(max_examples=100, deadline=None)
def test_circle_area_contained(r, cx, cy):
    """Circle fully inside a big polygon ⇒ intersection = πr² exactly."""
    ring = [
        (cx - 2 * r - 10, cy - 2 * r - 10),
        (cx + 2 * r + 10, cy - 2 * r - 10),
        (cx + 2 * r + 10, cy + 2 * r + 10),
        (cx - 2 * r - 10, cy + 2 * r + 10),
    ]
    a = geom.circle_polygon_area(cx, cy, r, wkb.polygon([ring]))
    assert a == pytest.approx(math.pi * r * r, rel=1e-9)


@given(
    st.floats(124.5, 131.5),
    st.floats(33.0, 39.0),
)
@settings(max_examples=300, deadline=None)
def test_crs_roundtrip_property(lon, lat):
    x, y = lonlat_to_tm(lon, lat)
    lon2, lat2 = tm_to_lonlat(x, y)
    assert abs(float(lon2) - lon) < 1e-9
    assert abs(float(lat2) - lat) < 1e-9


@given(st.integers(0, 2**16 - 1), st.integers(0, 2**16 - 1))
@settings(max_examples=300, deadline=None)
def test_hilbert_bijective_sample(x, y):
    d = hilbert_d(np.array([x]), np.array([y]), order=16)
    assert 0 <= int(d[0]) < 4**16


@given(
    st.lists(st.tuples(coord, coord), min_size=4, max_size=40),
    st.floats(0.1, 100.0),
)
@settings(max_examples=150, deadline=None)
def test_simplify_reduces_and_bounds(coords, tol):
    g = wkb.linestring(coords)
    s = geom.simplify(g, tol)
    assert 2 <= len(s.data) <= len(g.data)
    # every dropped vertex is within tol of the simplified line
    for x, y in np.asarray(coords):
        assert geom.distance_point(float(x), float(y), s) <= tol + 1e-6


def test_pivot_unpivot_roundtrip(spark):
    """pivot(unpivot(x)) == x for the result contract."""
    import pyspark.sql.functions as F

    from duckpipe_spark.operators.result import pivot_wide

    data = [(i, v, 2020, float(i * 10 + k)) for i in range(1, 6) for k, v in enumerate(["A", "B", "C"])]
    long = spark.createDataFrame(data, "id bigint, varname string, year int, value double")
    wide = pivot_wide(long)
    back = wide.unpivot(["id", "year"], ["A", "B", "C"], "varname", "value")
    a = long.orderBy("id", "varname").collect()
    b = back.orderBy("id", "varname").select("id", "varname", "year", "value").collect()
    assert a == b


def test_skeleton_cardinality(spark):
    """Skeleton densification always yields |ids|×|codes|×|buffers| rows
    (`LanduseCalculator.py:51-61`)."""
    import pyspark.sql.functions as F

    ids = spark.range(1, 8).select(F.col("id"))
    codes = spark.createDataFrame([(c,) for c in [110, 210]], "code int")
    buffers = spark.createDataFrame([(b,) for b in [100.0, 300.0, 500.0]], "buffer_size double")
    skeleton = ids.crossJoin(codes).crossJoin(buffers)
    assert skeleton.count() == 7 * 2 * 3
