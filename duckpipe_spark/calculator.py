"""Fluent Calculator API — the reference's public surface
(`duckpipe/core.py:15-214`, `duckpipe/mixin.py`) re-architected for Spark.

A user of the reference writes::

    result = (
        dp.Calculator(data_dir=..., n_workers=2)
        .add_point_with_table(df, x_col="lon", y_col="lat", epsg=4326)
        .chunk_by_centroid(max_cluster_size=100, distance_threshold=10000)
        .calculate_airport_distance(years=[2000, 2005])
        .calculate_landuse_area_ratio(years=[2000], buffer_sizes=[100.0])
        .get_result(pivot=True)
    )

This class keeps that exact surface but composes *lazy DataFrames* instead of
SQL strings + worker queues: every ``calculate_*`` appends a long-form
``(id, varname, year, value)`` DataFrame, and ``get_result`` unions, pivots,
joins attributes, and collects — Spark's scheduler replaces the whole
`Worker.py` multiprocess scatter-gather (`Worker.py:49-208`), and
``chunk_by_*`` become partitioning hints instead of driver-side clustering
(`Clustering.py:53-188`).

Differences from the reference, by design:
* ids are stamped once and shared by geometry and attributes (the reference
  relies on two independent `ROW_NUMBER() OVER ()` passes agreeing on
  arrival order, `core.py:143,156` — a landmine Spark would trip).
* no worker modes: CHUNKED_MULTI/CHUNKED_SINGLE/TOTAL_SINGLE
  (`Worker.py:19-23`) collapse into one distributed plan; the ``mode`` and
  ``n_workers`` arguments are accepted and ignored for API compatibility.
"""

from __future__ import annotations

from datetime import datetime
from pathlib import Path

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from duckpipe_spark.geo.crs import transform
from duckpipe_spark.geo.hilbert import hilbert_key
from duckpipe_spark.operators.coordinate import coordinates
from duckpipe_spark.operators.distance import nearest_distance
from duckpipe_spark.operators.elevation import relative_elevation
from duckpipe_spark.operators.overlay import (
    intersecting_oa,
    landuse_area_ratio,
    main_road_llw,
    road_llw,
)
from duckpipe_spark.operators.result import assemble_result, union_results
from duckpipe_spark.session import get_spark

REF_EPSG = 5179  # `duckpipe/common.py:6`

# table name, varname, valid years — one row per reference distance calculator
_DISTANCE_SPECS = {
    "airport": ("airport", "D_Airport", [2000, 2005, 2010, 2015, 2020], None),
    "bus_stop": ("bus_stop", "D_Bus", [2020, 2021, 2023], None),
    "coastline": ("coastline", "D_Coast", [2000, 2005, 2010, 2015, 2020], 1.0),
    "mdl": ("mdl", "D_North", [2000, 2005, 2010, 2015, 2020, 2023], None),
    "port": ("ports", "D_Port", [2000, 2005, 2010, 2015, 2020], None),
    "railstation": ("railstation", "D_Rail", [2005, 2010, 2015, 2020], None),
    "river": ("river", "D_River", [2023], None),
    "road": ("roads", "D_Road", [2005, 2010, 2015, 2020], None),
}
_MR_YEARS = [2005, 2010, 2015, 2020]
_LANDUSE_YEARS = [2000, 2005, 2010, 2015, 2020]
_ELEV_TYPES = ["dem", "dsm"]


# Accepted scalar types per declared element type. int is acceptable where
# float is declared (a user writing buffer_sizes=100 means 100.0); bool is
# NEVER acceptable as a number (it is an int subclass, but years=True is a
# bug, not a year). The abstract numbers ABCs admit numpy scalars too —
# np.int64 registers as Integral, np.float64 as Real — so values sliced out
# of a pandas/numpy column normalize instead of raising.
import numbers

_SCALAR_OK = {
    int: (numbers.Integral,),
    float: (numbers.Integral, numbers.Real),
    str: (str,),
}


def _as_list(v, typ, label="argument"):
    """Runtime API type-check + scalar-or-list normalization — the Spark
    twin of the reference's ``@typechecked`` guards (`duckpipe/core.py:38`,
    `duckpipe/calculator/Worker.py:108`): a wrongly-typed argument raises
    ``TypeError`` naming the argument at the call site, instead of
    surfacing later as a deep Spark analysis error."""
    ok = _SCALAR_OK[typ]

    def _one(x):
        if isinstance(x, bool) or not isinstance(x, ok):
            raise TypeError(
                f"{label} must be {typ.__name__} or a sequence of "
                f"{typ.__name__}, got element {type(x).__name__}: {x!r}"
            )
        return typ(x)

    if not isinstance(v, bool) and isinstance(v, ok):
        return [typ(v)]
    if isinstance(v, (str, bytes)) or not hasattr(v, "__iter__"):
        raise TypeError(
            f"{label} must be {typ.__name__} or a sequence of "
            f"{typ.__name__}, got {type(v).__name__}: {v!r}"
        )
    return [_one(x) for x in v]


def _check_years(years, valid, label="year"):
    for y in years:
        if y not in valid:
            raise ValueError(f"Invalid {label} '{y}'. Valid {label}s are: {valid}")
    return sorted(years)


class Calculator:
    """Drop-in fluent API over Spark. See module docstring."""

    def __init__(
        self,
        data_dir: str | Path | None = None,
        spark: SparkSession | None = None,
        mode: str | None = None,  # accepted for reference API compat; unused
        n_workers: int = 8,  # idem
        verbose: bool = True,
    ):
        self.spark = spark or get_spark("duckpipe-spark-calculator")
        self.data_dir = str(data_dir) if data_dir is not None else None
        self.verbose = verbose
        self.start_time = datetime.now()
        self.points: DataFrame | None = None
        self.attrs: DataFrame | None = None
        self._results: list[DataFrame] = []
        self.oa_intersection_df: DataFrame | None = None
        self._n_partitions: int | None = None

    # ------------------------------------------------------------------ io

    def connect_local_database(self, data_dir: str | Path):
        """Path config (`core.py:71-84`); storage is plain Parquet."""
        self.data_dir = str(data_dir)
        return self

    def connect_cloud_storage(
        self, s3_key_id: str, s3_secret: str, s3_account_id: str, s3_bucket_name: str
    ):
        """R2/S3 via s3a (`core.py:87-115`)."""
        from duckpipe_spark.sources.tables import configure_s3

        endpoint = f"https://{s3_account_id}.r2.cloudflarestorage.com"
        configure_s3(self.spark, s3_key_id, s3_secret, endpoint)
        self.data_dir = f"s3a://{s3_bucket_name}/airhealth"
        return self

    def _table(self, name: str) -> DataFrame:
        if self.data_dir is None:
            raise ValueError("data_dir not set — pass data_dir= or connect_local_database()")
        return self.spark.read.parquet(f"{self.data_dir}/{name}.parquet")

    # --------------------------------------------------------------- ingest

    def add_point_with_table(
        self,
        df: pd.DataFrame | DataFrame,
        x_col: str = "longitude",
        y_col: str = "latitude",
        epsg: int = 4326,
    ):
        """Ingest points (`core.py:117-166`): stamp arrival-order ids 1..N,
        project to EPSG:5179, keep one cached DataFrame carrying id + x/y +
        original attributes (single source of truth for both the reference's
        `wkt_df` and `attr_df`)."""
        if not isinstance(df, (pd.DataFrame, DataFrame)):
            raise TypeError(
                "df must be a pandas DataFrame or a Spark DataFrame, "
                f"got {type(df).__name__}"
            )
        if not isinstance(x_col, str) or not isinstance(y_col, str):
            raise TypeError("x_col and y_col must be column-name strings")
        if isinstance(epsg, bool) or not isinstance(epsg, int):
            raise TypeError(f"epsg must be int, got {type(epsg).__name__}: {epsg!r}")
        missing = [c for c in (x_col, y_col) if c not in df.columns]
        if missing:
            raise ValueError(f"columns {missing} not in input (have: {list(df.columns)})")
        if isinstance(df, pd.DataFrame):
            pdf = df.reset_index(drop=True)
            x, y = transform(pdf[x_col].to_numpy(), pdf[y_col].to_numpy(), epsg, REF_EPSG)
            ingest = pdf.copy()
            ingest["_dp_id"] = np.arange(1, len(pdf) + 1, dtype=np.int64)
            ingest["_dp_x"] = x
            ingest["_dp_y"] = y
            sdf = self.spark.createDataFrame(ingest)
        else:
            # Distributed ingest: dense arrival-order ids 1..N, fully JVM-side
            # (df.rdd.zipWithIndex would round-trip every row through Python).
            # monotonically_increasing_id() = (partition_id << 33) | local_row,
            # so per-partition counts + a cumulative offset reproduce
            # zipWithIndex semantics with one metadata-sized aggregation and a
            # broadcast join — no global sort, no single-partition window.
            mid_df = df.withColumn("_mid", F.monotonically_increasing_id()).persist()
            sdf = mid_df
            pid = F.shiftrightunsigned(F.col("_mid"), 33)
            local = F.col("_mid") - F.shiftleft(pid, 33)
            pcounts = sorted(
                (r["_pid"], r["count"])
                for r in sdf.groupBy(pid.alias("_pid")).count().collect()
            )
            offsets, acc = [], 0
            for p, c in pcounts:
                offsets.append({"_pid": p, "_off": acc})
                acc += c
            # explicit schema: an empty source (offsets == []) must still
            # build — schema inference on a zero-row pandas frame fails on
            # sessions without Arrow enabled
            off_df = self.spark.createDataFrame(
                pd.DataFrame(offsets, columns=["_pid", "_off"], dtype=np.int64),
                schema="_pid long, _off long",
            )
            sdf = (
                sdf.withColumn("_pid", pid)
                .join(F.broadcast(off_df), "_pid")
                .withColumn("_dp_id", F.col("_off") + local + F.lit(1))
                .drop("_pid", "_off", "_mid")
            )

            from pyspark.sql.functions import pandas_udf

            @pandas_udf("struct<x:double,y:double>")
            def _fwd(xs: pd.Series, ys: pd.Series) -> pd.DataFrame:
                tx, ty = transform(xs.values, ys.values, epsg, REF_EPSG)
                return pd.DataFrame({"x": tx, "y": ty})

            sdf = (
                sdf.withColumn("_xy", _fwd(F.col(x_col), F.col(y_col)))
                .withColumn("_dp_x", F.col("_xy.x"))
                .withColumn("_dp_y", F.col("_xy.y"))
                .drop("_xy")
            )
        self.attrs = sdf.drop("_dp_x", "_dp_y").withColumnRenamed("_dp_id", "id").cache()
        self.points = (
            sdf.select(
                F.col("_dp_id").alias("id"),
                F.col("_dp_x").alias("x"),
                F.col("_dp_y").alias("y"),
            )
            .cache()
        )
        if not isinstance(df, pd.DataFrame):
            # Pin both caches with one action each, then release the
            # intermediate `_mid` persist — otherwise it stays referenced for
            # the whole session. Materializing here also freezes the assigned
            # ids: a later recompute of a nondeterministically-ordered source
            # can no longer hand different ids to attrs vs points.
            self.points.count()
            self.attrs.count()
            mid_df.unpersist()
        self._results = []
        return self

    # ------------------------------------------------------- chunking hints

    def chunk_by_order(self, max_cluster_size: int = 50):
        """`Clustering.py:127-153` → plain repartition (points arrive in
        arbitrary order per partition; count mirrors N/chunk_size)."""
        n = max(1, self.points.count() // max(max_cluster_size, 1))
        self._n_partitions = min(n, 2048)
        self.points = self.points.repartition(self._n_partitions).cache()
        return self

    def chunk_by_hilbert(self, max_cluster_size: int = 50):
        """`Clustering.py:155-188` → range partition on a Hilbert key: the
        scalable version of the reference's locality sort (O2)."""
        pts = self.points
        stats = pts.agg(
            F.min("x").alias("x0"), F.min("y").alias("y0"),
            F.max("x").alias("x1"), F.max("y").alias("y1"),
            F.count("*").alias("n"),
        ).collect()[0]

        from pyspark.sql.functions import pandas_udf

        @pandas_udf("long")
        def _hk(xs: pd.Series, ys: pd.Series) -> pd.Series:
            return pd.Series(
                hilbert_key(xs.values, ys.values, stats.x0, stats.y0, stats.x1, stats.y1)
            )

        n = max(1, int(stats.n) // max(max_cluster_size, 1))
        self._n_partitions = min(n, 2048)
        self.points = (
            pts.withColumn("_hk", _hk(F.col("x"), F.col("y")))
            .repartitionByRange(self._n_partitions, "_hk")
            .drop("_hk")
            .cache()
        )
        return self

    def chunk_by_centroid(
        self,
        max_cluster_size: int = 50,
        distance_threshold: float = 2000,
        max_rows: int = 20000,
        max_driver_rows: int = 200_000,
    ):
        """`Clustering.py:53-125`, faithful: arrival-order 20k blocks,
        complete-linkage clustering on centroids cut at distance_threshold,
        oversize clusters re-sliced, chunks ordered size-desc. The linkage is
        driver-side (so is the reference's); beyond ``max_driver_rows`` the
        O(block²) linkage stops being the right tool and we fall back to
        Hilbert range partitioning, which preserves the property the chunks
        exist for (spatial locality per partition) at any scale."""
        pts = self.points
        pdf = pts.select("id", "x", "y").orderBy("id").toPandas() if (
            pts.count() <= max_driver_rows
        ) else None
        if pdf is None:
            return self.chunk_by_hilbert(max_cluster_size=max_cluster_size)

        from duckpipe_spark.geo.cluster import chunk_rows

        chunks = chunk_rows(
            pdf["id"].to_numpy(),
            pdf["x"].to_numpy(),
            pdf["y"].to_numpy(),
            max_cluster_size=max_cluster_size,
            distance_threshold=distance_threshold,
            max_rows=max_rows,
        )
        self._chunk_ids = chunks
        assign = pd.DataFrame(
            {
                "id": np.concatenate(chunks) if chunks else np.array([], dtype=np.int64),
                "_chunk": np.repeat(
                    np.arange(len(chunks), dtype=np.int64),
                    [len(c) for c in chunks],
                ),
            }
        )
        # explicit schema so a zero-chunk (empty points) assignment still
        # builds on sessions without Arrow-based inference
        assign_df = self.spark.createDataFrame(assign, schema="id long, _chunk long")
        self._n_partitions = min(max(len(chunks), 1), 2048)
        self.points = (
            pts.join(F.broadcast(assign_df), "id")
            .repartitionByRange(self._n_partitions, "_chunk")
            .drop("_chunk")
            .cache()
        )
        return self

    def chunk_assignments(self) -> list[np.ndarray]:
        """Chunk membership (arrays of point ids, size-desc order) from the
        last `chunk_by_centroid` — mirrors the reference's `get_chunks()`
        list-of-DataFrames for parity tests."""
        return getattr(self, "_chunk_ids", [])

    def get_chunks(self) -> int:
        """`Clustering.py:34-51` — expose the partitioning plan."""
        return self.points.rdd.getNumPartitions() if self.points is not None else 0

    # ------------------------------------------------------------ operators

    def _append(self, df: DataFrame):
        self._results.append(df)

    def _calc_distance(self, key: str, years):
        table, varname, valid, simplify_tol = _DISTANCE_SPECS[key]
        years = _check_years(_as_list(years, int, "years"), valid)
        feats = self._table(table)
        for year in years:
            self._append(
                nearest_distance(self.points, feats, varname, year, simplify_tol=simplify_tol)
            )
        return self

    def calculate_airport_distance(self, years):
        return self._calc_distance("airport", years)

    def calculate_bus_stop_distance(self, years):
        return self._calc_distance("bus_stop", years)

    def calculate_coastline_distance(self, years):
        return self._calc_distance("coastline", years)

    def calculate_mdl_distance(self, years):
        return self._calc_distance("mdl", years)

    def calculate_port_distance(self, years):
        return self._calc_distance("port", years)

    def calculate_railstation_distance(self, years):
        return self._calc_distance("railstation", years)

    def calculate_river_distance(self, years):
        return self._calc_distance("river", years)

    def calculate_road_distance(self, years):
        return self._calc_distance("road", years)

    def calculate_main_road_distance(self, mr_types, years):
        mr_types = sorted(_as_list(mr_types, str, "mr_types"))
        years = _check_years(_as_list(years, int, "years"), _MR_YEARS)
        for mr in mr_types:
            if mr not in ("mr1", "mr2"):
                raise ValueError(f"Invalid mr_type '{mr}'. Valid mr_types are: ['mr1', 'mr2']")
            feats = self._table(mr)
            varname = {"mr1": "D_MR1", "mr2": "D_MR2"}[mr]
            for year in years:
                self._append(nearest_distance(self.points, feats, varname, year))
        return self

    def calculate_road_llw(self, buffer_sizes, years):
        buffer_sizes = sorted(_as_list(buffer_sizes, float, "buffer_sizes"))
        years = _check_years(_as_list(years, int, "years"), _MR_YEARS)
        roads = self._table("roads")
        for year in years:
            self._append(road_llw(self.points, roads, buffer_sizes, year))
        return self

    def calculate_main_road_llw(self, mr_types, buffer_sizes, years):
        mr_types = sorted(_as_list(mr_types, str, "mr_types"))
        buffer_sizes = sorted(_as_list(buffer_sizes, float, "buffer_sizes"))
        years = _check_years(_as_list(years, int, "years"), _MR_YEARS)
        roads = self._table("roads")
        for mr in mr_types:
            mr_df = self._table(mr)
            for year in years:
                self._append(
                    main_road_llw(self.points, roads, mr_df, buffer_sizes, year, mr.upper())
                )
        return self

    def calculate_landuse_area_ratio(self, years, buffer_sizes):
        years = _check_years(_as_list(years, int, "years"), _LANDUSE_YEARS)
        buffer_sizes = sorted(_as_list(buffer_sizes, float, "buffer_sizes")) if buffer_sizes is not None else [0.0]
        for year in years:
            lu = self._table(f"landuse_{year}")
            self._append(landuse_area_ratio(self.points, lu, buffer_sizes, year))
        return self

    def calculate_relative_elevation(self, elev_types, buffer_sizes):
        elev_types = sorted(_as_list(elev_types, str, "elev_types"))
        buffer_sizes = sorted(_as_list(buffer_sizes, float, "buffer_sizes"))
        for et in elev_types:
            if et not in _ELEV_TYPES:
                raise ValueError(
                    f"Invalid elevation type '{et}'. Valid types are: {_ELEV_TYPES}"
                )
            cells = self._table(et)
            self._append(relative_elevation(self.points, cells, buffer_sizes, et))
        return self

    def calculate_coordinate(self, mode: str = "centroid"):
        self._append(coordinates(self.points, mode))
        return self

    def calculate_intersecting_oa(self, buffer_sizes):
        """Cached separately, not in result_df
        (`_IntersectingOACalculator.py:100-113`)."""
        buffer_sizes = sorted(_as_list(buffer_sizes, float, "buffer_sizes"))
        oa = self._table("jgg_borders_2023")
        self.oa_intersection_df = intersecting_oa(self.points, oa, buffer_sizes)
        return self

    # -------------------------------------------------------------- results

    def result_long(self) -> DataFrame | None:
        """The lazy long-form union (engine-native access path)."""
        return union_results(self._results)

    def get_result_spark(self, pivot: bool = True) -> DataFrame:
        return assemble_result(self.attrs, self.result_long(), pivot=pivot)

    def get_result(self, pivot: bool = True) -> pd.DataFrame:
        """Reference-compatible: returns pandas (`core.py:169-214`)."""
        out = self.get_result_spark(pivot=pivot).toPandas()
        if self.verbose:
            print(f"Elapsed time: {datetime.now() - self.start_time}")
        return out
