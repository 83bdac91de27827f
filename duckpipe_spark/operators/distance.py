"""Nearest-feature distance operator.

One parameterized implementation instance-configured for all 10 reference
distance calculators (SURVEY.md §7 step 4): Airport
(`AirportDistanceCalculator.py:36-56`), BusStop, Coastline (+simplify,
`CoastlineDistanceCalculator.py:18,40`), MDL, Port, Railstation, River, Road
(`RoadDistanceCalculator.py:35-63`), MainRoad mr1/mr2
(`MainRoadDistanceCalculator.py:55-87`).

Semantics (J1): inner cross join — a year with zero features yields no rows
for any id; those ids resurface as NULL after the final left join.

Plan shape (scale-first): the feature table is filtered on `year` (pushed to
the parquet scan), decoded ONCE to segments, and **broadcast**; each point
partition then computes min-distance with pure column math inside
whole-stage codegen and aggregates partially before the single shuffle on
`id`. Feature dims (airports, stations, simplified coastline) are small by
nature; for the rare huge side, pass broadcast=False to fall back to a
shuffle cross join.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from duckpipe_spark.operators.features import decode_segments
from duckpipe_spark.operators.result import LONG_SCHEMA
from duckpipe_spark.operators.spatial_join import point_segment_distance_col


def nearest_neighbor_grid(
    points: DataFrame,
    features: DataFrame,
    cell_size: float,
    id_col: str = "id",
) -> DataFrame:
    """Exact nearest-feature Euclidean distance via grid pruning, for POINT
    features → (id, value). Same inner semantics as the cross join (no
    features → no rows), ~density·(3g)² candidate pairs per point instead
    of |features|.

    Pass A: features are binned to ⌊coord/g⌋ cells and replicated onto
    their 3×3 neighborhood (replicating the SMALL side keeps each point at
    one row), then hash-joined on the point's single cell key. A candidate
    min ≤ g is provably the global min: any feature outside the 3×3
    neighborhood is > g away in some axis. Pass B: points that miss (empty
    neighborhood, or min > g) fall back to the brute-force broadcast cross
    join — exactness never depends on the density guess, only pass-A's hit
    rate does.

    At cluster scale pass A is a broadcast hash join + partial-agg (one
    shuffle on id), and pass B's anti-join input is a tiny id set; the
    O(n·m) cross join never materializes. Mirrors the candidate-then-exact
    structure of `grid_join` (spatial_join.py) for the nearest-neighbor
    aggregate instead of a radius predicate."""
    g = float(cell_size)
    feats = features.select(F.col("fx"), F.col("fy"))
    offsets = F.array(
        *[
            F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
        ]
    )
    fexp = (
        feats.select("fx", "fy", F.explode(offsets).alias("o"))
        .select(
            (F.floor(F.col("fx") / g) + F.col("o.dx")).alias("kx"),
            (F.floor(F.col("fy") / g) + F.col("o.dy")).alias("ky"),
            "fx",
            "fy",
        )
    )
    pts = points.select(
        F.col(id_col).alias("id"),
        "x",
        "y",
        F.floor(F.col("x") / g).alias("kx"),
        F.floor(F.col("y") / g).alias("ky"),
    )
    dist = F.sqrt(
        (F.col("x") - F.col("fx")) * (F.col("x") - F.col("fx"))
        + (F.col("y") - F.col("fy")) * (F.col("y") - F.col("fy"))
    )
    cand = (
        pts.join(F.broadcast(fexp), ["kx", "ky"])
        .groupBy("id")
        .agg(F.min(dist).alias("value"))
    )
    hit = cand.where(F.col("value") <= g)
    missed = pts.join(F.broadcast(hit.select("id")), "id", "left_anti")
    fallback = (
        missed.crossJoin(F.broadcast(feats))
        .groupBy("id")
        .agg(F.min(dist).alias("value"))
    )
    return hit.unionByName(fallback)


def nearest_distance(
    points: DataFrame,
    features: DataFrame,
    varname: str,
    year: int,
    simplify_tol: float | None = None,
    broadcast: bool = True,
) -> DataFrame:
    """points(id,x,y) × features(geometry WKB) → (id, varname, year, value=min dist)."""
    segs = decode_segments(
        features.where(F.col("year") == year).select("geometry"),
        simplify_tol=simplify_tol,
    )
    if broadcast:
        segs = F.broadcast(segs)
    d = point_segment_distance_col(
        F.col("x"), F.col("y"), F.col("x1"), F.col("y1"), F.col("x2"), F.col("y2")
    )
    return (
        points.crossJoin(segs)
        .select("id", d.alias("d"))
        .groupBy("id")
        .agg(F.min("d").alias("value"))
        .select(
            "id",
            F.lit(varname).alias("varname"),
            F.lit(year).cast("int").alias("year"),
            F.col("value").cast("double"),
        )
    )
