"""Planar geometry measures and predicates (pure numpy).

Kernel equivalents of the DuckDB-Spatial functions inventoried in SURVEY.md
§2.9 (G1-G17): distance (`ST_Distance`), length/area (`ST_Length`/`ST_Area`),
centroid / point-on-surface (`ST_Centroid`/`ST_PointOnSurface`), bounds
(`ST_XMin`..), Douglas-Peucker simplify (`ST_Simplify`), plus the analytic
circle kernels that implement the reference's point-buffer overlays
(`ST_Buffer`+`ST_Intersection`+`ST_Area`/`ST_Length` pipelines,
`LanduseCalculator.py:104-117`, `RoadLLWCalculator.py:77-97`,
`RelativeElevationCalculator.py:100-124`) without polygon clipping.

All coordinates are planar meters (EPSG:5179); all functions accept the
`wkb.Geometry` type.
"""

from __future__ import annotations

import math

import numpy as np

from duckpipe_spark.geo.wkb import Geometry

_TWO_PI = 2.0 * math.pi


# ---------------------------------------------------------------------------
# decomposition helpers
# ---------------------------------------------------------------------------


def iter_parts(g: Geometry):
    """Yield non-collection leaf geometries."""
    if g.gtype in ("MultiPoint", "MultiLineString", "MultiPolygon", "GeometryCollection"):
        for sub in g.data:
            yield from iter_parts(sub)
    else:
        yield g


def vertices(g: Geometry) -> np.ndarray:
    """All vertices as an (n,2) array."""
    chunks = []
    for part in iter_parts(g):
        if part.gtype == "Point":
            if part.data is not None:
                chunks.append(part.data.reshape(1, 2))
        elif part.gtype == "LineString":
            if len(part.data):
                chunks.append(part.data)
        elif part.gtype == "Polygon":
            chunks.extend(r for r in part.data if len(r))
    if not chunks:
        return np.empty((0, 2))
    return np.concatenate(chunks, axis=0)


def segments(g: Geometry) -> np.ndarray:
    """All line segments as an (m,4) array [x1,y1,x2,y2].

    Points become degenerate zero-length segments so that the vectorized
    point-segment distance covers every geometry type with one code path.
    """
    chunks = []
    for part in iter_parts(g):
        if part.gtype == "Point":
            if part.data is not None:
                c = part.data
                chunks.append(np.array([[c[0], c[1], c[0], c[1]]]))
        elif part.gtype == "LineString":
            a = part.data
            if len(a) == 1:
                chunks.append(np.array([[a[0, 0], a[0, 1], a[0, 0], a[0, 1]]]))
            elif len(a) >= 2:
                chunks.append(np.hstack([a[:-1], a[1:]]))
        elif part.gtype == "Polygon":
            for ring in part.data:
                r = _close_ring(ring)
                if len(r) >= 2:
                    chunks.append(np.hstack([r[:-1], r[1:]]))
    if not chunks:
        return np.empty((0, 4))
    return np.concatenate(chunks, axis=0)


def _close_ring(ring: np.ndarray) -> np.ndarray:
    if len(ring) >= 2 and not np.array_equal(ring[0], ring[-1]):
        return np.vstack([ring, ring[:1]])
    return ring


# ---------------------------------------------------------------------------
# bounds / measures
# ---------------------------------------------------------------------------


def bounds(g: Geometry) -> tuple[float, float, float, float]:
    """(xmin, ymin, xmax, ymax); NaNs when empty.  [G15]"""
    v = vertices(g)
    if not len(v):
        return (math.nan, math.nan, math.nan, math.nan)
    return (
        float(v[:, 0].min()),
        float(v[:, 1].min()),
        float(v[:, 0].max()),
        float(v[:, 1].max()),
    )


def length(g: Geometry) -> float:
    """Sum of LineString segment lengths (polygon rings excluded, like
    ST_Length).  [G11]"""
    total = 0.0
    for part in iter_parts(g):
        if part.gtype == "LineString" and len(part.data) >= 2:
            d = np.diff(part.data, axis=0)
            total += float(np.hypot(d[:, 0], d[:, 1]).sum())
    return total


def _ring_signed_area(ring: np.ndarray) -> float:
    r = _close_ring(ring)
    if len(r) < 3:
        return 0.0
    x, y = r[:, 0], r[:, 1]
    return 0.5 * float(np.dot(x[:-1], y[1:]) - np.dot(x[1:], y[:-1]))


def area(g: Geometry) -> float:
    """Polygon area; holes subtracted regardless of stored orientation.  [G10]"""
    total = 0.0
    for part in iter_parts(g):
        if part.gtype == "Polygon" and part.data:
            total += abs(_ring_signed_area(part.data[0]))
            for hole in part.data[1:]:
                total -= abs(_ring_signed_area(hole))
    return total


def centroid(g: Geometry) -> tuple[float, float]:
    """Centroid of the highest-dimension parts (area > length > points),
    mirroring GEOS semantics for uniform-type inputs.  [G4]"""
    # polygons
    a_sum = cx = cy = 0.0
    for part in iter_parts(g):
        if part.gtype == "Polygon" and part.data:
            for i, ring in enumerate(part.data):
                r = _close_ring(ring)
                if len(r) < 3:
                    continue
                x, y = r[:, 0], r[:, 1]
                cross = x[:-1] * y[1:] - x[1:] * y[:-1]
                sa = 0.5 * float(cross.sum())
                if sa == 0.0:
                    continue
                sx = float(((x[:-1] + x[1:]) * cross).sum()) / 6.0
                sy = float(((y[:-1] + y[1:]) * cross).sum()) / 6.0
                # exterior contributes +|area|, holes -|area|, regardless of
                # stored ring orientation
                want = 1.0 if i == 0 else -1.0
                flip = want * (1.0 if sa > 0 else -1.0)
                a_sum += flip * sa
                cx += flip * sx
                cy += flip * sy
    if a_sum != 0.0:
        return (cx / a_sum, cy / a_sum)
    # lines
    l_sum = lx = ly = 0.0
    for part in iter_parts(g):
        if part.gtype == "LineString" and len(part.data) >= 2:
            d = np.diff(part.data, axis=0)
            seg_len = np.hypot(d[:, 0], d[:, 1])
            mid = (part.data[:-1] + part.data[1:]) / 2.0
            l_sum += float(seg_len.sum())
            lx += float((mid[:, 0] * seg_len).sum())
            ly += float((mid[:, 1] * seg_len).sum())
    if l_sum > 0.0:
        return (lx / l_sum, ly / l_sum)
    # points
    v = vertices(g)
    if len(v):
        return (float(v[:, 0].mean()), float(v[:, 1].mean()))
    return (math.nan, math.nan)


def point_on_surface(g: Geometry) -> tuple[float, float]:
    """A point guaranteed on the geometry: polygons use the widest interval
    of a mid-height scanline (PostGIS-style); lines use a mid vertex.  [G4]"""
    for part in iter_parts(g):
        if part.gtype == "Polygon" and part.data:
            return _interior_point(part)
    for part in iter_parts(g):
        if part.gtype == "LineString" and len(part.data):
            return tuple(part.data[len(part.data) // 2])
    v = vertices(g)
    if len(v):
        return (float(v[0, 0]), float(v[0, 1]))
    return (math.nan, math.nan)


def _interior_point(poly: Geometry) -> tuple[float, float]:
    ext = poly.data[0]
    ymin, ymax = float(ext[:, 1].min()), float(ext[:, 1].max())
    ymid = (ymin + ymax) / 2.0
    xs: list[float] = []
    for ring in poly.data:
        r = _close_ring(ring)
        y1, y2 = r[:-1, 1], r[1:, 1]
        x1, x2 = r[:-1, 0], r[1:, 0]
        mask = ((y1 <= ymid) & (y2 > ymid)) | ((y2 <= ymid) & (y1 > ymid))
        if mask.any():
            t = (ymid - y1[mask]) / (y2[mask] - y1[mask])
            xs.extend((x1[mask] + t * (x2[mask] - x1[mask])).tolist())
    if len(xs) < 2:
        c = centroid(poly)
        return c
    xs.sort()
    # widest in-polygon interval between consecutive crossings
    best, bx = -1.0, xs[0]
    for i in range(0, len(xs) - 1, 2):
        w = xs[i + 1] - xs[i]
        if w > best:
            best, bx = w, (xs[i] + xs[i + 1]) / 2.0
    return (bx, ymid)


# ---------------------------------------------------------------------------
# distance
# ---------------------------------------------------------------------------


def point_segments_distance(px: float, py: float, segs: np.ndarray) -> float:
    """Min distance from (px,py) to segment set [m,4]; inf when empty."""
    if not len(segs):
        return math.inf
    x1, y1, x2, y2 = segs[:, 0], segs[:, 1], segs[:, 2], segs[:, 3]
    dx, dy = x2 - x1, y2 - y1
    len2 = dx * dx + dy * dy
    with np.errstate(divide="ignore", invalid="ignore"):
        t = ((px - x1) * dx + (py - y1) * dy) / len2
    t = np.where(len2 > 0.0, np.clip(t, 0.0, 1.0), 0.0)
    qx = x1 + t * dx
    qy = y1 + t * dy
    return float(np.hypot(px - qx, py - qy).min())


def point_in_polygon(px: float, py: float, poly: Geometry) -> bool:
    """Ray cast incl. holes (boundary counts as inside downstream because
    callers combine with boundary distance)."""
    inside = False
    for ring in poly.data:
        r = _close_ring(ring)
        x1, y1 = r[:-1, 0], r[:-1, 1]
        x2, y2 = r[1:, 0], r[1:, 1]
        mask = (y1 > py) != (y2 > py)
        if mask.any():
            xin = x1[mask] + (py - y1[mask]) / (y2[mask] - y1[mask]) * (x2[mask] - x1[mask])
            inside ^= bool(np.count_nonzero(xin > px) & 1)
    return inside


def contains_point(g: Geometry, px: float, py: float) -> bool:
    return any(
        part.gtype == "Polygon" and part.data and point_in_polygon(px, py, part)
        for part in iter_parts(g)
    )


def distance_point(px: float, py: float, g: Geometry) -> float:
    """ST_Distance(point, g): 0 inside polygons, else distance to the nearest
    boundary/vertex.  [G6]"""
    if contains_point(g, px, py):
        return 0.0
    return point_segments_distance(px, py, segments(g))


def _segments_min_distance(sa: np.ndarray, sb: np.ndarray) -> float:
    """Min distance between two segment sets (O(n*m) vectorized)."""
    if not len(sa) or not len(sb):
        return math.inf
    best = math.inf
    # endpoints of A vs segments of B, and vice versa — covers every
    # non-crossing minimum (closest pair involves at least one endpoint)
    for pts, segs in ((sa[:, :2], sb), (sa[:, 2:], sb), (sb[:, :2], sa), (sb[:, 2:], sa)):
        for x, y in pts:
            d = point_segments_distance(float(x), float(y), segs)
            if d < best:
                best = d
                if best == 0.0:
                    return 0.0
    # crossing check: any intersecting pair → 0
    if best > 0.0 and _any_segment_intersection(sa, sb):
        return 0.0
    return best


def _any_segment_intersection(sa: np.ndarray, sb: np.ndarray) -> bool:
    for x1, y1, x2, y2 in sa:
        d1x, d1y = x2 - x1, y2 - y1
        x3, y3, x4, y4 = sb[:, 0], sb[:, 1], sb[:, 2], sb[:, 3]
        d2x, d2y = x4 - x3, y4 - y3
        denom = d1x * d2y - d1y * d2x
        with np.errstate(divide="ignore", invalid="ignore"):
            t = ((x3 - x1) * d2y - (y3 - y1) * d2x) / denom
            u = ((x3 - x1) * d1y - (y3 - y1) * d1x) / denom
        hit = (denom != 0) & (t >= 0) & (t <= 1) & (u >= 0) & (u <= 1)
        if bool(hit.any()):
            return True
    return False


def distance(g1: Geometry, g2: Geometry) -> float:
    """General ST_Distance; fast path when either side is a point."""
    if g1.gtype == "Point" and g1.data is not None:
        return distance_point(float(g1.data[0]), float(g1.data[1]), g2)
    if g2.gtype == "Point" and g2.data is not None:
        return distance_point(float(g2.data[0]), float(g2.data[1]), g1)
    # polygon containment (one inside the other)
    v1, v2 = vertices(g1), vertices(g2)
    if len(v1) and contains_point(g2, float(v1[0, 0]), float(v1[0, 1])):
        return 0.0
    if len(v2) and contains_point(g1, float(v2[0, 0]), float(v2[0, 1])):
        return 0.0
    return _segments_min_distance(segments(g1), segments(g2))


def max_vertex_distance(px: float, py: float, g: Geometry) -> float:
    """Max distance from (px,py) to any vertex — exact farthest-point
    distance for lines/polygons (extrema lie on vertices)."""
    v = vertices(g)
    if not len(v):
        return -math.inf
    return float(np.hypot(v[:, 0] - px, v[:, 1] - py).max())


# ---------------------------------------------------------------------------
# simplification (Douglas-Peucker) — ST_Simplify [G8]
# ---------------------------------------------------------------------------


def _dp_mask(coords: np.ndarray, tol: float) -> np.ndarray:
    n = len(coords)
    keep = np.zeros(n, dtype=bool)
    keep[0] = keep[n - 1] = True
    stack = [(0, n - 1)]
    while stack:
        i0, i1 = stack.pop()
        if i1 <= i0 + 1:
            continue
        a, b = coords[i0], coords[i1]
        ab = b - a
        len2 = float(ab[0] * ab[0] + ab[1] * ab[1])
        pts = coords[i0 + 1 : i1]
        if len2 == 0.0:
            d = np.hypot(pts[:, 0] - a[0], pts[:, 1] - a[1])
        else:
            # clamped point-to-SEGMENT distance (GEOS semantics) — the
            # infinite-line distance would wrongly drop points beyond the
            # chord's endpoints
            t = np.clip(((pts[:, 0] - a[0]) * ab[0] + (pts[:, 1] - a[1]) * ab[1]) / len2, 0.0, 1.0)
            d = np.hypot(pts[:, 0] - (a[0] + t * ab[0]), pts[:, 1] - (a[1] + t * ab[1]))
        imax = int(d.argmax())
        if d[imax] > tol:
            k = i0 + 1 + imax
            keep[k] = True
            stack.append((i0, k))
            stack.append((k, i1))
    return keep


def simplify(g: Geometry, tol: float) -> Geometry:
    """Douglas-Peucker, matching ST_Simplify semantics (rings keep ≥4 pts)."""
    if g.gtype == "LineString":
        if len(g.data) <= 2:
            return g
        return Geometry("LineString", g.data[_dp_mask(g.data, tol)])
    if g.gtype == "Polygon":
        rings = []
        for ring in g.data:
            r = _close_ring(ring)
            if len(r) <= 4:
                rings.append(ring)
                continue
            rr = r[_dp_mask(r, tol)]
            if len(rr) >= 4:
                rings.append(rr)
        return Geometry("Polygon", rings)
    if g.gtype in ("MultiPoint", "MultiLineString", "MultiPolygon", "GeometryCollection"):
        return Geometry(g.gtype, [simplify(s, tol) for s in g.data])
    return g


# ---------------------------------------------------------------------------
# analytic circle kernels (exact point-buffer overlays)
# ---------------------------------------------------------------------------


def circle_area(r: float) -> float:
    return math.pi * r * r


def _edge_circle_area(ax, ay, bx, by, r: float) -> float:
    """Signed area contribution of triangle (O,a,b) clipped to the circle of
    radius r centered at O (Green's theorem formulation)."""
    # quadratic |a + t(b-a)|^2 = r^2
    dx, dy = bx - ax, by - ay
    seg2 = dx * dx + dy * dy
    if seg2 == 0.0:
        return 0.0
    r2 = r * r
    a2 = ax * ax + ay * ay
    cross = ax * by - ay * bx

    def tri(px, py, qx, qy):
        return 0.5 * (px * qy - py * qx)

    def sector(px, py, qx, qy):
        ang = math.atan2(px * qy - py * qx, px * qx + py * qy)
        return 0.5 * r2 * ang

    b_coef = ax * dx + ay * dy
    disc = b_coef * b_coef - seg2 * (a2 - r2)
    ts: list[float] = []
    if disc > 0.0:
        sq = math.sqrt(disc)
        t1 = (-b_coef - sq) / seg2
        t2 = (-b_coef + sq) / seg2
        for t in (t1, t2):
            if 0.0 < t < 1.0:
                ts.append(t)
    cuts = [0.0, *ts, 1.0]
    total = 0.0
    for i in range(len(cuts) - 1):
        t0, t1 = cuts[i], cuts[i + 1]
        tm = (t0 + t1) / 2.0
        mx, my = ax + tm * dx, ay + tm * dy
        px, py = ax + t0 * dx, ay + t0 * dy
        qx, qy = ax + t1 * dx, ay + t1 * dy
        if mx * mx + my * my <= r2:
            total += tri(px, py, qx, qy)
        else:
            total += sector(px, py, qx, qy)
    return total


def circle_polygon_area(cx: float, cy: float, r: float, g: Geometry) -> float:
    """Exact area of circle(c,r) ∩ polygon(s).  Implements the reference's
    `SUM(ST_Area(ST_Intersection(l.geometry, ST_Buffer(c, r))))` kernel
    (`LanduseCalculator.py:116`) analytically."""
    if r <= 0.0:
        return 0.0
    total = 0.0
    for part in iter_parts(g):
        if part.gtype != "Polygon" or not part.data:
            continue
        for i, ring in enumerate(part.data):
            rr = _close_ring(ring)
            if len(rr) < 3:
                continue
            s = 0.0
            for j in range(len(rr) - 1):
                s += _edge_circle_area(
                    rr[j, 0] - cx, rr[j, 1] - cy, rr[j + 1, 0] - cx, rr[j + 1, 1] - cy, r
                )
            # exterior adds, holes subtract, independent of stored orientation
            total += abs(s) if i == 0 else -abs(s)
    return max(total, 0.0)


def circle_polygon_area_batch(
    cx: np.ndarray, cy: np.ndarray, r: np.ndarray, g: Geometry
) -> np.ndarray:
    """``circle_polygon_area`` for a BATCH of circles against ONE decoded
    polygon (VERDICT r10 item 4): the per-(circle, edge) Green's-theorem
    contribution evaluates as (n_circles × n_edges) numpy arrays instead
    of a per-pair Python loop — the form the landuse Arrow kernel calls
    once per feature polygon per batch.

    Same cut structure as the scalar kernel, branch-freed: the two chord
    roots clip into [0, 1] (degenerate sub-segments contribute exactly 0,
    reproducing the scalar path's strict-interior cut filter), each of the
    three sub-segments resolves tri-vs-sector by its own midpoint test.
    Differences from the scalar path are summation order only (pairwise
    vs sequential — last-ulp), which every consumer rounds away."""
    cx = np.asarray(cx, dtype=np.float64)
    cy = np.asarray(cy, dtype=np.float64)
    r = np.asarray(r, dtype=np.float64)
    n = len(cx)
    total = np.zeros(n, dtype=np.float64)
    r2 = (r * r)[:, None]

    def _sub(ax, ay, dx, dy, t0, t1):
        px, py = ax + t0 * dx, ay + t0 * dy
        qx, qy = ax + t1 * dx, ay + t1 * dy
        tm = 0.5 * (t0 + t1)
        mx, my = ax + tm * dx, ay + tm * dy
        cross = px * qy - py * qx
        tri = 0.5 * cross
        sector = 0.5 * r2 * np.arctan2(cross, px * qx + py * qy)
        return np.where(mx * mx + my * my <= r2, tri, sector)

    for part in iter_parts(g):
        if part.gtype != "Polygon" or not part.data:
            continue
        for i, ring in enumerate(part.data):
            rr = _close_ring(ring)
            if len(rr) < 3:
                continue
            ax = rr[:-1, 0][None, :] - cx[:, None]
            ay = rr[:-1, 1][None, :] - cy[:, None]
            dx = np.diff(rr[:, 0])[None, :]
            dy = np.diff(rr[:, 1])[None, :]
            seg2 = dx * dx + dy * dy
            b_coef = ax * dx + ay * dy
            disc = b_coef * b_coef - seg2 * (ax * ax + ay * ay - r2)
            live = (seg2 > 0.0) & (disc > 0.0)
            sq = np.sqrt(np.where(live, disc, 0.0))
            den = np.where(seg2 > 0.0, seg2, 1.0)
            t1 = np.where(live, np.clip((-b_coef - sq) / den, 0.0, 1.0), 0.0)
            t2 = np.where(live, np.clip((-b_coef + sq) / den, 0.0, 1.0), 0.0)
            s = (
                _sub(ax, ay, dx, dy, np.zeros_like(t1), t1)
                + _sub(ax, ay, dx, dy, t1, t2)
                + _sub(ax, ay, dx, dy, t2, np.ones_like(t2))
            )
            ring_sum = np.where(seg2 > 0.0, s, 0.0).sum(axis=1)
            total += np.abs(ring_sum) if i == 0 else -np.abs(ring_sum)
    return np.where(r > 0.0, np.maximum(total, 0.0), 0.0)


def circle_line_clip_length(cx: float, cy: float, r: float, g: Geometry) -> float:
    """Exact length of line ∩ circle(c,r) — the reference's
    `SUM(ST_Length(ST_Intersection(ST_Buffer(c,r), road)))` kernel
    (`RoadLLWCalculator.py:95`)."""
    if r <= 0.0:
        return 0.0
    total = 0.0
    r2 = r * r
    for part in iter_parts(g):
        if part.gtype != "LineString" or len(part.data) < 2:
            continue
        a = part.data
        ax, ay = a[:-1, 0] - cx, a[:-1, 1] - cy
        dx, dy = np.diff(a[:, 0]), np.diff(a[:, 1])
        seg2 = dx * dx + dy * dy
        b_coef = ax * dx + ay * dy
        c_coef = ax * ax + ay * ay - r2
        disc = b_coef * b_coef - seg2 * c_coef
        ok = (seg2 > 0.0) & (disc > 0.0)
        if not ok.any():
            continue
        sq = np.sqrt(disc[ok])
        t1 = np.clip((-b_coef[ok] - sq) / seg2[ok], 0.0, 1.0)
        t2 = np.clip((-b_coef[ok] + sq) / seg2[ok], 0.0, 1.0)
        total += float(((t2 - t1) * np.sqrt(seg2[ok])).sum())
    return total


def circle_intersects(cx: float, cy: float, r: float, g: Geometry) -> bool:
    """ST_Intersects(buffer(c,r), g) for exact circles."""
    return distance_point(cx, cy, g) <= r


def annulus_intersects(
    cx: float, cy: float, r_in: float, r_out: float, g: Geometry
) -> bool:
    """ST_Intersects(donut, g) where donut = buffer(r_out) − buffer(r_in)
    (`RelativeElevationCalculator.py:106-110,123-124`): g must reach the outer
    disk and not lie strictly inside the inner disk."""
    if distance_point(cx, cy, g) > r_out:
        return False
    return max_vertex_distance(cx, cy, g) >= r_in
