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
