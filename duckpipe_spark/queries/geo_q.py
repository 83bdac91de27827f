"""Oracle-checked drives of the REAL geo operator pipeline.

The driver's testdata has no geometry tables, so these queries synthesize
WKB feature tables from the star schema in-flight (suppliers → point/line
features) and push them through the actual engine path — `decode_segments`
mapInPandas → grid-bin join → column-math kernels → skeleton fill → pivot —
while the DuckDB oracle recomputes the same values from the raw coordinates
with the same closed-form expressions. This closes the gap between the
fixture-based pytest coverage and the driver's oracle gate for the spatial
operator family (SURVEY.md §2 J1/J2/J6/A1/A3/U3/U4).

Determinism: distances are MINs of bit-identical doubles; clip-length sums
are rounded to 4 decimals (values O(10³), cross-engine fp drift O(10⁻⁹)).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from duckpipe_spark.geo import wkb
from duckpipe_spark.operators.distance import nearest_distance
from duckpipe_spark.operators.overlay import road_llw
from duckpipe_spark.operators.result import pivot_wide
from duckpipe_spark.queries.base import register
from duckpipe_spark.sources.tables import load_table

# same synthetic planar frame as spatial_proxy.py
_CX = "(c_acctbal * 7.0)"
_CY = "((c_custkey % 97) * 113.0)"
_SX = "(s_acctbal * 7.0)"
_SY = "((s_suppkey % 97) * 113.0)"

_SEG_DX, _SEG_DY = 1500.0, 800.0  # line features extend by this much
_YEAR = 2020


def _points(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("id"), F.expr(_CX).cast("double").alias("x"), F.expr(_CY).cast("double").alias("y")
    )


def _wkb_point_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """suppliers → (geometry WKB point, year) through the real codec."""
    supp = load_table(spark, sf_dir, "supplier").select(
        F.expr(_SX).cast("double").alias("fx"), F.expr(_SY).cast("double").alias("fy")
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "geometry": [
                        wkb.to_wkb(wkb.point(x, y)) for x, y in zip(pdf.fx, pdf.fy)
                    ],
                    "year": _YEAR,
                }
            )

    return supp.mapInPandas(gen, "geometry binary, year int")


def _wkb_line_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """suppliers → (geometry WKB 2-point line, lanes, width, year)."""
    supp = load_table(spark, sf_dir, "supplier").select(
        F.expr(_SX).cast("double").alias("fx"),
        F.expr(_SY).cast("double").alias("fy"),
        (F.col("s_suppkey") % 5 + 1).cast("int").alias("lanes"),
        (F.col("s_suppkey") % 7 + 3.0).cast("double").alias("width"),
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "geometry": [
                        wkb.to_wkb(wkb.linestring([(x, y), (x + _SEG_DX, y + _SEG_DY)]))
                        for x, y in zip(pdf.fx, pdf.fy)
                    ],
                    "lanes": pdf.lanes.astype("int32"),
                    "width": pdf.width,
                    "year": _YEAR,
                }
            )

    return supp.mapInPandas(gen, "geometry binary, lanes int, width double, year int")


_GEO_NEAREST_ORACLE = f"""
SELECT
  c_custkey AS id,
  'D_Feature' AS varname,
  {_YEAR} AS year,
  min(sqrt(({_CX} - {_SX}) * ({_CX} - {_SX}) + ({_CY} - {_SY}) * ({_CY} - {_SY}))) AS value
FROM customer CROSS JOIN supplier
GROUP BY c_custkey
"""


@register("geo_nearest_distance_pipeline", _GEO_NEAREST_ORACLE,
          "real WKB decode→broadcast→codegen distance operator vs closed-form oracle")
def geo_nearest_distance_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = _points(spark, sf_dir)
    feats = _wkb_point_features(spark, sf_dir)
    out = nearest_distance(pts, feats, "D_Feature", _YEAR)
    return out.select("id", "varname", F.col("year").cast("int").alias("year"), "value")


_BUFFERS = [3000.0, 10000.0]
_BUFFER_VALUES = ", ".join(f"({b})" for b in _BUFFERS)

# closed-form circle-segment clip length, mirrored from
# operators/spatial_join.py::circle_segment_clip_col
_CLIP_SQL = f"""
CASE WHEN seg_a > 0 AND disc > 0
     THEN (greatest(0.0, least(1.0, (-seg_b + sqrt(disc)) / seg_a))
         - greatest(0.0, least(1.0, (-seg_b - sqrt(disc)) / seg_a))) * sqrt(seg_a)
     ELSE 0.0 END
"""

_GEO_LLW_ORACLE = f"""
WITH pts AS (
  SELECT c_custkey AS id, {_CX} AS px, {_CY} AS py FROM customer
),
segs AS (
  SELECT {_SX} AS x1, {_SY} AS y1, {_SX} + {_SEG_DX} AS x2, {_SY} + {_SEG_DY} AS y2,
         CAST(s_suppkey % 5 + 1 AS INT) AS lanes, CAST(s_suppkey % 7 + 3.0 AS DOUBLE) AS width
  FROM supplier
),
quad AS (
  SELECT id, r, lanes, width,
         ((x2 - x1) * (x2 - x1) + (y2 - y1) * (y2 - y1)) AS seg_a,
         ((x1 - px) * (x2 - x1) + (y1 - py) * (y2 - y1)) AS seg_b,
         ((x1 - px) * (x1 - px) + (y1 - py) * (y1 - py) - r * r) AS seg_c
  FROM pts CROSS JOIN (VALUES {_BUFFER_VALUES}) AS t(r) CROSS JOIN segs
),
clip AS (
  SELECT id, r, lanes, width, seg_a, seg_b, seg_b * seg_b - seg_a * seg_c AS disc
  FROM quad
),
lens AS (
  SELECT id, r, lanes, width, {_CLIP_SQL} AS clen FROM clip
),
agg AS (
  SELECT id, r,
         round(sum(clen), 4) AS L,
         round(sum(clen * lanes), 4) AS LL,
         round(sum(clen * lanes * width), 4) AS LLW
  FROM lens GROUP BY id, r
),
unp AS (
  SELECT id, r, vartype, value
  FROM agg UNPIVOT (value FOR vartype IN (L, LL, LLW))
)
SELECT id,
       printf('%s_%s_%04d', 'Road', vartype, CAST(r AS INT)) AS varname,
       {_YEAR} AS year,
       value
FROM unp
"""


@register("geo_buffer_clip_pipeline", _GEO_LLW_ORACLE,
          "real grid-join + circle-clip LLW operator vs closed-form oracle")
def geo_buffer_clip_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = _points(spark, sf_dir)
    roads = _wkb_line_features(spark, sf_dir)
    out = road_llw(pts, roads, _BUFFERS, _YEAR, broadcast_features=True)
    # round AFTER the exact pipeline: clip sums are fp-order dependent
    return out.select(
        "id",
        "varname",
        F.col("year").cast("int").alias("year"),
        F.round("value", 4).alias("value"),
    )


_GEO_PIVOT_ORACLE = f"""
WITH a AS (
  SELECT c_custkey AS id,
         min(sqrt(({_CX} - {_SX}) * ({_CX} - {_SX}) + ({_CY} - {_SY}) * ({_CY} - {_SY}))) AS v
  FROM customer CROSS JOIN supplier WHERE s_suppkey % 2 = 0 GROUP BY c_custkey
),
b AS (
  SELECT c_custkey AS id,
         min(sqrt(({_CX} - {_SX}) * ({_CX} - {_SX}) + ({_CY} - {_SY}) * ({_CY} - {_SY}))) AS v
  FROM customer CROSS JOIN supplier WHERE s_suppkey % 2 = 1 GROUP BY c_custkey
)
SELECT a.id, {_YEAR} AS year, a.v AS D_FeatEven, b.v AS D_FeatOdd
FROM a JOIN b ON a.id = b.id
"""


@register("geo_pivot_pipeline", _GEO_PIVOT_ORACLE,
          "long-form union → engine pivot_wide vs conditional-agg oracle")
def geo_pivot_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    pts = _points(spark, sf_dir)
    supp = load_table(spark, sf_dir, "supplier")
    even = _wkb_points_from(supp.where(F.col("s_suppkey") % 2 == 0))
    odd = _wkb_points_from(supp.where(F.col("s_suppkey") % 2 == 1))
    long = nearest_distance(pts, even, "D_FeatEven", _YEAR).unionByName(
        nearest_distance(pts, odd, "D_FeatOdd", _YEAR)
    )
    return pivot_wide(long).select(
        "id", F.col("year").cast("int").alias("year"), "D_FeatEven", "D_FeatOdd"
    )


def _wkb_points_from(supp: DataFrame) -> DataFrame:
    supp = supp.select(F.expr(_SX).cast("double").alias("fx"), F.expr(_SY).cast("double").alias("fy"))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "geometry": [
                        wkb.to_wkb(wkb.point(x, y)) for x, y in zip(pdf.fx, pdf.fy)
                    ],
                    "year": _YEAR,
                }
            )

    return supp.mapInPandas(gen, "geometry binary, year int")
