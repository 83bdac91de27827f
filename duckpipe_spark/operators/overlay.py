"""Buffer-overlay operator family: road LLW, main-road LLW, land-use
area/ratio, intersecting-OA ratio.

Replaces the reference's per-chunk AOI temp table + RTREE + `ST_Intersects`
LEFT JOIN pipelines (`RoadLLWCalculator.py:60-106`,
`MainRoadLLWCalculator.py:85-143`, `LanduseCalculator.py:40-159`,
`_IntersectingOACalculator.py:19-92`) with grid-bin candidate joins and
exact kernels:

* Road metrics (L / LL / LLW) stay entirely in whole-stage codegen — the
  circle-segment clip length is column arithmetic; no Python at all.
* Land-use / OA areas need circular-arc integration → a single Arrow-batched
  pandas UDF over the candidate pairs, with per-batch WKB decode memoization.

Left-join + COALESCE(...,0) zero-fill semantics and the land-use result
skeleton (`LanduseCalculator.py:51-61,127-141`) are replicated exactly.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.functions import pandas_udf

from duckpipe_spark.geo import geom, wkb
from duckpipe_spark.operators.features import decode_bbox, decode_segments
from duckpipe_spark.operators.spatial_join import circle_segment_clip_col, grid_join


def _buffers_df(spark: SparkSession, buffer_sizes: list[float]) -> DataFrame:
    """Inline VALUES relation of buffer sizes (U5, `RoadLLWCalculator.py:67-70`)."""
    return spark.createDataFrame([(float(b),) for b in buffer_sizes], "buffer_size double")


def _points_buffered(points: DataFrame, buffers: DataFrame) -> DataFrame:
    """points × buffer sizes with the buffer's bbox (J2)."""
    pb = points.crossJoin(F.broadcast(buffers))
    return (
        pb.withColumn("pxmin", F.col("x") - F.col("buffer_size"))
        .withColumn("pymin", F.col("y") - F.col("buffer_size"))
        .withColumn("pxmax", F.col("x") + F.col("buffer_size"))
        .withColumn("pymax", F.col("y") + F.col("buffer_size"))
    )


def _seg_bbox(segs: DataFrame) -> DataFrame:
    return (
        segs.withColumn("sxmin", F.least("x1", "x2"))
        .withColumn("symin", F.least("y1", "y2"))
        .withColumn("sxmax", F.greatest("x1", "x2"))
        .withColumn("symax", F.greatest("y1", "y2"))
    )


# ---------------------------------------------------------------------------
# road LLW (L, LL, LLW) — `RoadLLWCalculator.py`
# ---------------------------------------------------------------------------


def road_llw(
    points: DataFrame,
    roads: DataFrame,
    buffer_sizes: list[float],
    year: int,
    var_prefix: str = "Road",
    year_filter: bool = True,
    broadcast_features: bool = True,
) -> DataFrame:
    """L/LL/LLW within each buffer, zero-filled per (id, buffer).

    `roads` needs columns (geometry, lanes, width[, year]).

    All buffer sizes aggregate over ONE candidate set: the grid join runs
    once per point at the LARGEST buffer and each buffer's clip length is
    its own aggregate expression over the same candidate rows (the clip
    kernel returns exactly 0.0 for a segment outside the circle, and
    adding IEEE +0.0 terms leaves a float sum bit-identical — verified by
    the unchanged oracle hash). The earlier formulation cross-joined
    points × buffers BEFORE candidate generation: n_buffers× the join
    volume for identical sums."""
    spark = points.sparkSession
    if year_filter:
        roads = roads.where(F.col("year") == year)
    segs = _seg_bbox(decode_segments(roads.select("geometry", "lanes", "width"), ["lanes", "width"]))
    bmax = max(buffer_sizes)
    pb = (
        points.withColumn("pxmin", F.col("x") - F.lit(bmax))
        .withColumn("pymin", F.col("y") - F.lit(bmax))
        .withColumn("pxmax", F.col("x") + F.lit(bmax))
        .withColumn("pymax", F.col("y") + F.lit(bmax))
    )

    cell = max(bmax * 2.0, 1e-9)
    cand = grid_join(
        pb,
        segs,
        ("pxmin", "pymin", "pxmax", "pymax"),
        ("sxmin", "symin", "sxmax", "symax"),
        cell_size=cell,
        broadcast_right=broadcast_features,
    )

    def _clip(b: float):
        return circle_segment_clip_col(
            F.col("x"), F.col("y"), F.lit(float(b)),
            F.col("x1"), F.col("y1"), F.col("x2"), F.col("y2"),
        )

    aggs = []
    for i, b in enumerate(buffer_sizes):
        clip = _clip(b)
        aggs += [
            F.sum(clip).alias(f"_L{i}"),
            F.sum(clip * F.col("lanes")).alias(f"_LL{i}"),
            F.sum(clip * F.col("lanes") * F.col("width")).alias(f"_LLW{i}"),
        ]
    per_id = cand.groupBy("id").agg(*aggs)
    stacked = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(float(b)).alias("buffer_size"),
                    F.coalesce(F.col(f"_L{i}"), F.lit(0.0)).alias("L"),
                    F.coalesce(F.col(f"_LL{i}"), F.lit(0.0)).alias("LL"),
                    F.coalesce(F.col(f"_LLW{i}"), F.lit(0.0)).alias("LLW"),
                )
                for i, b in enumerate(buffer_sizes)
            ]
        )
    )
    filled = (
        points.select("id")
        .join(per_id, "id", "left")
        .select("id", stacked.alias("s"))
        .select("id", "s.buffer_size", "s.L", "s.LL", "s.LLW")
    )
    long = filled.unpivot(["id", "buffer_size"], ["L", "LL", "LLW"], "vartype", "value")
    # varname('Road'|'MR1'|'MR2', vartype, buffer) = printf('%s_%s_%04d', ...)
    varname = F.format_string(
        "%s_%s_%04d", F.lit(var_prefix), F.col("vartype"), F.col("buffer_size").cast("int")
    )
    return long.select(
        "id",
        varname.alias("varname"),
        F.lit(year).cast("int").alias("year"),
        F.col("value").cast("double"),
    )


def main_road_llw(
    points: DataFrame,
    roads: DataFrame,
    mr: DataFrame,
    buffer_sizes: list[float],
    year: int,
    mr_label: str,
    broadcast_features: bool = True,
) -> DataFrame:
    """LLW restricted to main roads via the `roads_{year}_id` FK
    (`MainRoadLLWCalculator.py:90-99`). Mirrors the reference exactly: the
    roads side is NOT re-filtered by year; selection is purely the FK join."""
    fk = f"roads_{year}_id"
    mr_ids = mr.where(F.col(fk).isNotNull()).select(F.col(fk).alias("_mr_rid"))
    road_sel = roads.join(F.broadcast(mr_ids), roads["id"] == F.col("_mr_rid")).select(
        "geometry", "lanes", "width"
    )
    return road_llw(
        points,
        road_sel,
        buffer_sizes,
        year,
        var_prefix=mr_label.upper(),
        year_filter=False,
        broadcast_features=broadcast_features,
    )


# ---------------------------------------------------------------------------
# land-use area / ratio — `LanduseCalculator.py`
# ---------------------------------------------------------------------------


def _circle_poly_area_udf(*cols):
    """Exact circle∩polygon area pandas UDF (VERDICT r10 item 4): candidate
    pairs are GROUPED BY feature polygon inside each Arrow batch — the same
    polygon appears in many (point, buffer) pairs — then each polygon is
    decoded ONCE and all its circles evaluate through the vectorized
    ``circle_polygon_area_batch`` numpy kernel (one (circles × edges)
    array pass per polygon, no per-pair Python loop). Created lazily —
    pandas_udf needs an active SparkSession."""

    @pandas_udf("double")
    def _kernel(px: pd.Series, py: pd.Series, r: pd.Series, raw: pd.Series) -> pd.Series:
        import numpy as np

        out = np.zeros(len(px), dtype=np.float64)
        if len(px):
            keys = pd.Series([bytes(b) for b in raw.values], index=px.index)
            xv = px.values.astype(np.float64)
            yv = py.values.astype(np.float64)
            rv = r.values.astype(np.float64)
            pos = pd.RangeIndex(len(px))
            for key, idx in pd.Series(pos.values).groupby(keys.values).groups.items():
                g = wkb.from_wkb(key)
                ii = np.asarray(idx, dtype=np.int64)
                out[ii] = geom.circle_polygon_area_batch(xv[ii], yv[ii], rv[ii], g)
        return pd.Series(out, dtype="float64")

    return _kernel(*cols)


def landuse_area_ratio(
    points: DataFrame,
    landuse: DataFrame,
    buffer_sizes: list[float],
    year: int,
    broadcast_features: bool = True,
) -> DataFrame:
    """Per (id, code, buffer): a = Σ area(buffer ∩ landuse_polygon),
    p = a / area(buffer); zero-filled over the full id×code×buffer skeleton
    (`LanduseCalculator.py:51-61,100-141`)."""
    spark = points.sparkSession
    feats = decode_bbox(landuse.select("code", "geometry"), ["code"])
    pb = _points_buffered(points, _buffers_df(spark, buffer_sizes))

    cell = max(max(buffer_sizes) * 2.0, 1e-9)
    cand = grid_join(
        pb,
        feats,
        ("pxmin", "pymin", "pxmax", "pymax"),
        ("xmin", "ymin", "xmax", "ymax"),
        cell_size=cell,
        broadcast_right=broadcast_features,
    )
    inter_area = _circle_poly_area_udf(F.col("x"), F.col("y"), F.col("buffer_size"), F.col("geometry"))
    buf_area = F.lit(3.141592653589793) * F.col("buffer_size") * F.col("buffer_size")
    agg = (
        cand.select("id", "buffer_size", F.col("code"), inter_area.alias("ia"), buf_area.alias("ba"))
        .groupBy("id", "buffer_size", "code")
        .agg(F.sum("ia").alias("a"), F.sum(F.col("ia") / F.col("ba")).alias("p"))
    )
    # skeleton: all ids × distinct codes (full-table distinct, LanduseCalculator.py:53-57) × buffers
    codes = landuse.select("code").distinct()
    skeleton = (
        points.select("id")
        .crossJoin(F.broadcast(codes))
        .crossJoin(F.broadcast(_buffers_df(spark, buffer_sizes)))
    )
    filled = skeleton.join(agg, on=["id", "code", "buffer_size"], how="left").select(
        "id",
        "buffer_size",
        F.col("code").cast("string").alias("lu_code"),
        F.coalesce("a", F.lit(0.0)).alias("a"),
        F.coalesce("p", F.lit(0.0)).alias("p"),
    )
    long = filled.unpivot(["id", "buffer_size", "lu_code"], ["a", "p"], "stat_type", "value")
    varname = F.format_string(
        "%s%s_%04d_%s",
        F.lit("LS"),
        F.col("lu_code"),
        F.col("buffer_size").cast("int"),
        F.col("stat_type"),
    )
    return long.select(
        "id",
        varname.alias("varname"),
        F.lit(year).cast("int").alias("year"),
        F.col("value").cast("double"),
    )


# ---------------------------------------------------------------------------
# intersecting output areas — `_IntersectingOACalculator.py`
# ---------------------------------------------------------------------------


def intersecting_oa(
    points: DataFrame,
    oa: DataFrame,
    buffer_sizes: list[float],
    broadcast_features: bool = True,
) -> DataFrame:
    """Per (id, buffer, tot_reg_cd): area(buffer ∩ OA) / area(OA)
    (`_IntersectingOACalculator.py:64-86`). Returns the wide cache table the
    reference stashes in `oa_intersection_df` (left-join semantics: points
    whose buffer touches no OA still appear, with NULL tot_reg_cd and ratio 0)."""
    spark = points.sparkSession
    feats = decode_bbox(oa.select("tot_reg_cd", "geometry"), ["tot_reg_cd"], with_area=True)
    pb = _points_buffered(points, _buffers_df(spark, buffer_sizes))
    cell = max(max(buffer_sizes) * 2.0, 1e-9)
    cand = grid_join(
        pb,
        feats,
        ("pxmin", "pymin", "pxmax", "pymax"),
        ("xmin", "ymin", "xmax", "ymax"),
        cell_size=cell,
        broadcast_right=broadcast_features,
    )
    inter_area = _circle_poly_area_udf(F.col("x"), F.col("y"), F.col("buffer_size"), F.col("geometry"))
    pairs = cand.select(
        "id",
        "buffer_size",
        "tot_reg_cd",
        F.coalesce(inter_area / F.col("geom_area"), F.lit(0.0)).alias("intersection_ratio"),
    ).where(F.col("intersection_ratio") > 0.0)
    # LEFT JOIN semantics: keep every (id, buffer) even with zero matches
    skeleton = points.select("id").crossJoin(F.broadcast(_buffers_df(spark, buffer_sizes)))
    return skeleton.join(pairs, on=["id", "buffer_size"], how="left").select(
        "id",
        "buffer_size",
        "tot_reg_cd",
        F.coalesce("intersection_ratio", F.lit(0.0)).alias("intersection_ratio"),
    )
