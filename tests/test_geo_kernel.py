"""Unit tests for the pure-numpy geometry kernel against hand-computed
truths (SURVEY.md §5 strategy item 2)."""

import math

import numpy as np
import pytest

from duckpipe_spark.geo import geom, wkb
from duckpipe_spark.geo.crs import lonlat_to_tm, tm_to_lonlat, transform, _A_RECT
from duckpipe_spark.geo.hilbert import hilbert_d, hilbert_key

# ---------------------------------------------------------------------------
# WKB codec
# ---------------------------------------------------------------------------


def test_wkb_point_roundtrip():
    g = wkb.point(3.5, -2.25)
    g2 = wkb.from_wkb(wkb.to_wkb(g))
    assert g2.gtype == "Point"
    assert np.allclose(g2.data, [3.5, -2.25])


def test_wkb_known_bytes():
    # POINT(1 2) little-endian ISO WKB
    raw = bytes.fromhex("0101000000000000000000F03F0000000000000040")
    g = wkb.from_wkb(raw)
    assert g.gtype == "Point" and np.allclose(g.data, [1.0, 2.0])
    assert wkb.to_wkb(g) == raw


def test_wkb_big_endian():
    raw = bytes.fromhex("00000000013FF00000000000004000000000000000")
    g = wkb.from_wkb(raw)
    assert np.allclose(g.data, [1.0, 2.0])


def test_wkb_polygon_roundtrip():
    g = wkb.polygon([[(0, 0), (4, 0), (4, 4), (0, 4), (0, 0)], [(1, 1), (2, 1), (2, 2), (1, 2), (1, 1)]])
    g2 = wkb.from_wkb(wkb.to_wkb(g))
    assert g2.gtype == "Polygon" and len(g2.data) == 2
    assert geom.area(g2) == pytest.approx(16 - 1)


def test_wkb_multilinestring_roundtrip():
    g = wkb.multi(
        "MultiLineString",
        [wkb.linestring([(0, 0), (1, 0)]), wkb.linestring([(0, 1), (3, 1)])],
    )
    g2 = wkb.from_wkb(wkb.to_wkb(g))
    assert geom.length(g2) == pytest.approx(4.0)


def test_wkb_ewkb_srid_flag():
    # EWKB POINT(1 2) with SRID=5179
    raw = bytes.fromhex("01010000203B140000000000000000F03F0000000000000040")
    g = wkb.from_wkb(raw)
    assert np.allclose(g.data, [1.0, 2.0])


# ---------------------------------------------------------------------------
# measures
# ---------------------------------------------------------------------------


def test_area_with_hole_any_orientation():
    # hole stored CCW (same as exterior) must still subtract
    g = wkb.polygon([[(0, 0), (10, 0), (10, 10), (0, 10)], [(2, 2), (4, 2), (4, 4), (2, 4)]])
    assert geom.area(g) == pytest.approx(100 - 4)


def test_centroid_square():
    g = wkb.polygon([[(0, 0), (2, 0), (2, 2), (0, 2), (0, 0)]])
    assert geom.centroid(g) == pytest.approx((1.0, 1.0))


def test_centroid_line_weighted():
    g = wkb.linestring([(0, 0), (2, 0), (2, 1)])
    # segment lengths 2 and 1, midpoints (1,0) and (2,0.5)
    assert geom.centroid(g) == pytest.approx(((2 * 1 + 1 * 2) / 3, (0 + 0.5) / 3))


def test_point_on_surface_inside():
    g = wkb.polygon([[(0, 0), (10, 0), (10, 10), (0, 10)], [(4, 0.5), (6, 0.5), (6, 9.5), (4, 9.5)]])
    x, y = geom.point_on_surface(g)
    assert geom.contains_point(g, x, y)


def test_distance_point_to_segment():
    g = wkb.linestring([(0, 0), (10, 0)])
    assert geom.distance_point(5, 3, g) == pytest.approx(3.0)
    assert geom.distance_point(-4, 3, g) == pytest.approx(5.0)


def test_distance_inside_polygon_zero():
    g = wkb.polygon([[(0, 0), (4, 0), (4, 4), (0, 4)]])
    assert geom.distance_point(2, 2, g) == 0.0
    assert geom.distance_point(6, 2, g) == pytest.approx(2.0)


def test_distance_point_in_hole():
    g = wkb.polygon([[(0, 0), (10, 0), (10, 10), (0, 10)], [(4, 4), (6, 4), (6, 6), (4, 6)]])
    assert geom.distance_point(5, 5, g) == pytest.approx(1.0)


def test_distance_line_line():
    a = wkb.linestring([(0, 0), (10, 0)])
    b = wkb.linestring([(0, 5), (10, 5)])
    assert geom.distance(a, b) == pytest.approx(5.0)
    c = wkb.linestring([(5, -1), (5, 1)])  # crosses a
    assert geom.distance(a, c) == 0.0


def test_simplify_collinear():
    g = wkb.linestring([(0, 0), (5, 0.1), (10, 0)])
    s = geom.simplify(g, 1.0)
    assert len(s.data) == 2
    s2 = geom.simplify(g, 0.01)
    assert len(s2.data) == 3


def test_bounds():
    g = wkb.multi("MultiPoint", [wkb.point(1, 5), wkb.point(-2, 3)])
    assert geom.bounds(g) == pytest.approx((-2, 3, 1, 5))


# ---------------------------------------------------------------------------
# analytic circle kernels
# ---------------------------------------------------------------------------


def test_circle_polygon_area_contained_circle():
    g = wkb.polygon([[(-10, -10), (10, -10), (10, 10), (-10, 10)]])
    assert geom.circle_polygon_area(0, 0, 2, g) == pytest.approx(math.pi * 4, rel=1e-12)


def test_circle_polygon_area_contained_polygon():
    g = wkb.polygon([[(-1, -1), (1, -1), (1, 1), (-1, 1)]])
    assert geom.circle_polygon_area(0, 0, 100, g) == pytest.approx(4.0, rel=1e-12)


def test_circle_polygon_area_half_plane():
    # circle centered on the edge of a huge half-plane-ish rectangle → half circle
    g = wkb.polygon([[(0, -1000), (1000, -1000), (1000, 1000), (0, 1000)]])
    assert geom.circle_polygon_area(0, 0, 5, g) == pytest.approx(math.pi * 25 / 2, rel=1e-9)


def test_circle_polygon_area_disjoint():
    g = wkb.polygon([[(100, 100), (110, 100), (110, 110), (100, 110)]])
    assert geom.circle_polygon_area(0, 0, 5, g) == 0.0


def test_circle_polygon_area_quarter():
    # circle at a corner of a large square → quarter circle
    g = wkb.polygon([[(0, 0), (100, 0), (100, 100), (0, 100)]])
    assert geom.circle_polygon_area(0, 0, 7, g) == pytest.approx(math.pi * 49 / 4, rel=1e-9)


def test_circle_polygon_area_with_hole():
    g = wkb.polygon([[(-50, -50), (50, -50), (50, 50), (-50, 50)], [(-1, -1), (1, -1), (1, 1), (-1, 1)]])
    assert geom.circle_polygon_area(0, 0, 10, g) == pytest.approx(math.pi * 100 - 4, rel=1e-9)


def test_circle_line_clip_length():
    g = wkb.linestring([(-10, 0), (10, 0)])
    assert geom.circle_line_clip_length(0, 0, 3, g) == pytest.approx(6.0)
    # chord at height 4 in circle r=5 → half-width 3
    g2 = wkb.linestring([(-10, 4), (10, 4)])
    assert geom.circle_line_clip_length(0, 0, 5, g2) == pytest.approx(6.0)
    # fully outside
    g3 = wkb.linestring([(-10, 9), (10, 9)])
    assert geom.circle_line_clip_length(0, 0, 5, g3) == 0.0
    # segment entirely inside
    g4 = wkb.linestring([(-1, 0), (1, 0)])
    assert geom.circle_line_clip_length(0, 0, 5, g4) == pytest.approx(2.0)


def test_annulus_intersects():
    box = wkb.polygon([[(7, -1), (9, -1), (9, 1), (7, 1)]])  # between r=5 and r=10
    assert geom.annulus_intersects(0, 0, 5, 10, box)
    inner_box = wkb.polygon([[(-1, -1), (1, -1), (1, 1), (-1, 1)]])  # inside r=5
    assert not geom.annulus_intersects(0, 0, 5, 10, inner_box)
    far_box = wkb.polygon([[(20, 20), (21, 20), (21, 21), (20, 21)]])
    assert not geom.annulus_intersects(0, 0, 5, 10, far_box)
    spanning = wkb.polygon([[(-20, -20), (20, -20), (20, 20), (-20, 20)]])  # covers donut
    assert geom.annulus_intersects(0, 0, 5, 10, spanning)


def test_circle_intersects():
    g = wkb.linestring([(0, 4), (10, 4)])
    assert geom.circle_intersects(0, 0, 5, g)
    assert not geom.circle_intersects(0, 0, 3, g)


# ---------------------------------------------------------------------------
# CRS
# ---------------------------------------------------------------------------


def test_crs_origin_maps_to_false_origin():
    x, y = lonlat_to_tm(127.5, 38.0)
    assert float(x) == pytest.approx(1_000_000.0, abs=1e-6)
    assert float(y) == pytest.approx(2_000_000.0, abs=1e-6)


def test_crs_quarter_meridian():
    # rectifying radius: quarter meridian of GRS80 = A_RECT * pi/2
    assert _A_RECT * math.pi / 2 == pytest.approx(10_001_965.7293, abs=0.001)


def test_crs_roundtrip_precision():
    rng = np.random.default_rng(7)
    lon = rng.uniform(124.0, 132.0, 200)
    lat = rng.uniform(33.0, 39.5, 200)
    x, y = lonlat_to_tm(lon, lat)
    lon2, lat2 = tm_to_lonlat(x, y)
    assert np.abs(lon2 - lon).max() < 1e-10
    assert np.abs(lat2 - lat).max() < 1e-10


def test_crs_scale_at_central_meridian():
    # 1° of latitude along the central meridian ≈ 0.9996 * meridian arc
    x1, y1 = lonlat_to_tm(127.5, 37.0)
    x2, y2 = lonlat_to_tm(127.5, 38.0)
    arc = float(y2 - y1)
    # meridian arc per degree near 37.5N on GRS80 ≈ 110,954 m (±60 m window)
    assert 0.9996 * 110_900 < arc < 0.9996 * 111_010


def test_crs_eastward_distance_sanity():
    # near lat0, small lon offsets scale ≈ k0 * cos(lat) * R
    x1, y1 = lonlat_to_tm(127.5, 38.0)
    x2, y2 = lonlat_to_tm(127.51, 38.0)
    d = math.hypot(float(x2 - x1), float(y2 - y1))
    expected = 0.9996 * math.radians(0.01) * 6378137.0 * math.cos(math.radians(38.0))
    assert d == pytest.approx(expected, rel=2e-3)


def test_transform_dispatch():
    x, y = transform([127.5], [38.0], 4326, 5179)
    assert float(x[0]) == pytest.approx(1_000_000.0, abs=1e-6)
    with pytest.raises(ValueError):
        transform([0], [0], 4326, 3857)


# ---------------------------------------------------------------------------
# Hilbert
# ---------------------------------------------------------------------------


def test_hilbert_order1_square():
    # order=1: the 4 cells visit in (0,0),(0,1),(1,1),(1,0) order
    d = hilbert_d(np.array([0, 0, 1, 1]), np.array([0, 1, 1, 0]), order=1)
    assert sorted(d.tolist()) == [0, 1, 2, 3]


def test_hilbert_locality():
    # adjacent cells along the curve are adjacent in space
    n = 32
    xs, ys = np.meshgrid(np.arange(n), np.arange(n))
    d = hilbert_d(xs.ravel(), ys.ravel(), order=5)
    order_idx = np.argsort(d)
    px, py = xs.ravel()[order_idx], ys.ravel()[order_idx]
    steps = np.abs(np.diff(px)) + np.abs(np.diff(py))
    assert steps.max() == 1  # true Hilbert curve: every step is unit distance


def test_hilbert_key_scaling():
    k = hilbert_key([0.0, 100.0], [0.0, 100.0], 0, 0, 100, 100, order=8)
    assert k[0] != k[1]


def test_circle_polygon_area_batch_matches_scalar():
    """Vectorized batch kernel (r11) ≡ the scalar reference on every cut
    topology: contained circle, contained polygon, chord crossings,
    tangents, holes, disjoint, degenerate r<=0 — across a sweep of
    centers/radii against an L-shaped polygon with a hole."""
    import numpy as np

    outer = [(0, 0), (10, 0), (10, 4), (4, 4), (4, 10), (0, 10), (0, 0)]
    hole = [(1, 1), (2, 1), (2, 2), (1, 2), (1, 1)]
    g = wkb.polygon([outer, hole])
    rng = np.random.default_rng(3)
    cx = rng.uniform(-3, 13, 200)
    cy = rng.uniform(-3, 13, 200)
    r = np.concatenate([rng.uniform(0.1, 8, 198), [0.0, -1.0]])
    got = geom.circle_polygon_area_batch(cx, cy, r, g)
    for i in range(200):
        exp = geom.circle_polygon_area(float(cx[i]), float(cy[i]), float(r[i]), g)
        assert got[i] == pytest.approx(exp, rel=1e-12, abs=1e-12), (i, cx[i], cy[i], r[i])
