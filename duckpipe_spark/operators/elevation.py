"""Relative-elevation operator over raster-as-table inputs.

Replicates `RelativeElevationCalculator.py` semantics: the dem/dsm tables
carry one row per raster cell with bbox columns (xmin,xmax,ymin,ymax) and a
`value`; per point we compute

* ``ref_elev`` — mean of COALESCE(value,0) over cells containing the point
  (LEFT JOIN: points in no cell get NULL, `RelativeElevationCalculator.py:88-98`);
* per (point, buffer) donut = buffer(r+30) − buffer(r): the fraction of
  intersecting cells whose elevation is >+20/−20/>+50/−50 relative to
  ref_elev (AVG of boolean casts, `RelativeElevationCalculator.py:113-124`);
* both emitted with NULL year (`RelativeElevationCalculator.py:137,144`).

Plan shape: cells are plain double columns, the donut∩box predicate is pure
column math (`box_annulus_intersects_col`) — this operator never leaves the
JVM. The cell side is grid-binned against point buffers, so the join is a
hash join on cell ids, not a nested loop over every (point, raster-cell)
pair — the property that matters when the raster is 10^9 cells.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from duckpipe_spark.operators.overlay import _buffers_df
from duckpipe_spark.operators.spatial_join import box_annulus_intersects_col, grid_join

DONUT_THICKNESS = 30.0
_REL_PREFIX = {"dem": "Alt_k", "dsm": "Alt_a"}
_REF_NAME = {"dem": "Altitude_k", "dsm": "Altitude_a"}


def relative_elevation(
    points: DataFrame,
    cells: DataFrame,
    buffer_sizes: list[float],
    elev_type: str,
    broadcast_cells: bool = False,
) -> DataFrame:
    """cells: (value, xmin, xmax, ymin, ymax)."""
    spark = points.sparkSession
    cells = cells.select(
        F.coalesce(F.col("value"), F.lit(0.0)).alias("elev"),
        F.col("xmin").cast("double"),
        F.col("ymin").cast("double"),
        F.col("xmax").cast("double"),
        F.col("ymax").cast("double"),
    )

    # --- ref_elev: mean elevation of cells containing the point ------------
    pts = points.select(
        "id",
        "x",
        "y",
        F.col("x").alias("p0x"),
        F.col("y").alias("p0y"),
    )
    cell_size = max(max(buffer_sizes) + DONUT_THICKNESS, 1.0) * 2.0
    containing = grid_join(
        pts.withColumn("bxmin", F.col("x"))
        .withColumn("bymin", F.col("y"))
        .withColumn("bxmax", F.col("x"))
        .withColumn("bymax", F.col("y")),
        cells,
        ("bxmin", "bymin", "bxmax", "bymax"),
        ("xmin", "ymin", "xmax", "ymax"),
        cell_size=cell_size,
        broadcast_right=broadcast_cells,
    ).where(
        (F.col("x") >= F.col("xmin"))
        & (F.col("x") <= F.col("xmax"))
        & (F.col("y") >= F.col("ymin"))
        & (F.col("y") <= F.col("ymax"))
    )
    ref = (
        points.select("id")
        .join(
            containing.groupBy("id").agg(F.avg("elev").alias("ref_elev")),
            on="id",
            how="left",
        )
    )

    # --- donut ratios ------------------------------------------------------
    buffers = _buffers_df(spark, buffer_sizes)
    pb = (
        points.crossJoin(F.broadcast(buffers))
        .withColumn("r_out", F.col("buffer_size") + F.lit(DONUT_THICKNESS))
        .withColumn("bxmin", F.col("x") - F.col("r_out"))
        .withColumn("bymin", F.col("y") - F.col("r_out"))
        .withColumn("bxmax", F.col("x") + F.col("r_out"))
        .withColumn("bymax", F.col("y") + F.col("r_out"))
    )
    cand = grid_join(
        pb,
        cells,
        ("bxmin", "bymin", "bxmax", "bymax"),
        ("xmin", "ymin", "xmax", "ymax"),
        cell_size=cell_size,
        broadcast_right=broadcast_cells,
    ).where(
        box_annulus_intersects_col(
            F.col("x"),
            F.col("y"),
            F.col("buffer_size"),
            F.col("r_out"),
            F.col("xmin"),
            F.col("ymin"),
            F.col("xmax"),
            F.col("ymax"),
        )
    )
    cand = cand.join(F.broadcast(ref), on="id")
    delta = F.col("elev") - F.col("ref_elev")
    ratios = cand.groupBy("id", "buffer_size").agg(
        F.avg((delta > 20.0).cast("int")).alias("above_20"),
        F.avg((delta < -20.0).cast("int")).alias("below_20"),
        F.avg((delta > 50.0).cast("int")).alias("above_50"),
        F.avg((delta < -50.0).cast("int")).alias("below_50"),
    )
    long = ratios.unpivot(
        ["id", "buffer_size"], ["above_20", "below_20", "above_50", "below_50"], "stat", "value"
    )
    # varname_rel: printf('%s_%s_%s', Alt_k|Alt_a, stat, buffer::VARCHAR)
    rel = long.select(
        "id",
        F.format_string(
            "%s_%s_%s",
            F.lit(_REL_PREFIX[elev_type]),
            F.col("stat"),
            F.col("buffer_size").cast("string"),
        ).alias("varname"),
        F.lit(None).cast("int").alias("year"),
        F.col("value").cast("double"),
    )
    ref_long = ref.select(
        "id",
        F.lit(_REF_NAME[elev_type]).alias("varname"),
        F.lit(None).cast("int").alias("year"),
        F.col("ref_elev").cast("double").alias("value"),
    )
    return rel.unionByName(ref_long)
