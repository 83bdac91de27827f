"""Pure-numpy planar geometry kernel for the duckpipe-spark engine.

The reference delegates all spatial math to DuckDB-Spatial/GEOS
(`duckpipe/duckdb_utils.py:16`); this environment has no GEOS/shapely, so the
engine ships its own kernel: a WKB codec (`wkb`), planar measures and
predicates (`geom`), an EPSG:4326↔5179 Transverse-Mercator transform (`crs`),
and a Hilbert curve key (`hilbert`). All of it is driven from Arrow-batched
pandas UDFs (`udfs`) — geometry never round-trips through WKT and the per-row
hot paths stay in numpy.

Design note: buffers in the reference are always applied to *point*
geometries (`ST_Buffer(c.geometry, r)` with chunk = points), so the kernel
models point-buffers as exact circles and computes circle∩polygon area,
circle∩line clip length, and annulus predicates analytically — more accurate
than GEOS's 32-gon approximation and far cheaper than general polygon
clipping.
"""

from duckpipe_spark.geo.wkb import Geometry, from_wkb, to_wkb

__all__ = ["Geometry", "from_wkb", "to_wkb"]
