"""Representative-coordinate operator (`CoordinateCalculator.py`).

Emits TM_X/TM_Y (EPSG:5179) and WGS_X/WGS_Y (EPSG:4326) per point with NULL
year, unpivoted to long form (`CoordinateCalculator.py:36-72`). Input points
are already representative coordinates (the ingest stores point geometry as
x/y doubles), so centroid/point-on-surface of a point is the point itself;
the inverse CRS transform runs in one Arrow-batched pandas UDF.
"""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.functions import pandas_udf

from duckpipe_spark.geo.crs import tm_to_lonlat


def _tm_to_lonlat_udf(*cols):
    """Lazy pandas UDF (needs an active SparkSession at creation time)."""

    @pandas_udf("struct<lon:double,lat:double>")
    def _kernel(x: pd.Series, y: pd.Series) -> pd.DataFrame:
        lon, lat = tm_to_lonlat(x.values, y.values)
        return pd.DataFrame({"lon": lon, "lat": lat})

    return _kernel(*cols)


def coordinates(points: DataFrame, mode: str = "centroid") -> DataFrame:
    """mode ∈ {centroid, representative_point}; for point inputs both are the
    identity (`SUPPORTED_MODE_FUNCS`, `CoordinateCalculator.py:11-14`)."""
    if mode not in ("centroid", "representative_point"):
        raise ValueError(
            "Invalid mode. Valid modes are: ['centroid', 'representative_point']"
        )
    wgs = points.withColumn("_wgs", _tm_to_lonlat_udf(F.col("x"), F.col("y")))
    wide = wgs.select(
        "id",
        F.col("x").alias("TM_X"),
        F.col("y").alias("TM_Y"),
        F.col("_wgs.lon").alias("WGS_X"),
        F.col("_wgs.lat").alias("WGS_Y"),
    )
    long = wide.unpivot(["id"], ["WGS_X", "WGS_Y", "TM_X", "TM_Y"], "varname", "value")
    return long.select(
        "id",
        "varname",
        F.lit(None).cast("int").alias("year"),
        F.col("value").cast("double"),
    )
