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


def nearest_distance_from_array(
    points: DataFrame, seg_arr, varname: str, year: int
) -> DataFrame:
    """Arrow-kernel min-distance against a driver-held segment array
    ``(n,4) [x1,y1,x2,y2]``. The array ships once via sc.broadcast; each
    Arrow batch of points computes its min over all segments vectorized, so
    the O(points × segments) pair relation never materializes as rows —
    zero joins, zero exchanges, one output row per point. Distance math
    mirrors ``point_segment_distance_col`` bit-for-bit; min-then-sqrt equals
    sqrt-then-min (monotone). Callers with several variants from one feature
    scan (e.g. the pivot pipeline) decode+collect once and slice."""
    import numpy as np
    import pandas as pd

    spark = points.sparkSession
    if len(seg_arr) == 0:
        # inner-join semantics: a year with zero features yields no rows
        return spark.createDataFrame([], "id bigint, varname string, year int, value double")
    bc = spark.sparkContext.broadcast(np.asarray(seg_arr, dtype=np.float64))

    def gen(batches):
        A = bc.value
        x1, y1, x2, y2 = A[:, 0], A[:, 1], A[:, 2], A[:, 3]
        dx, dy = x2 - x1, y2 - y1
        len2 = dx * dx + dy * dy
        degen = len2 <= 0.0
        safe = np.where(degen, 1.0, len2)
        nseg = len(A)
        # Small scratch blocks, allocated once and reused in-place: fresh
        # multi-MB temps pay first-touch page faults per batch, which
        # dominates the arithmetic. ~256k elements ≈ 2 MB per buffer.
        block = max(1, 262_144 // nseg)
        t = np.empty((block, nseg))
        qx = np.empty((block, nseg))
        qy = np.empty((block, nseg))
        for pdf in batches:
            n = len(pdf)
            out = np.empty(n, dtype=np.float64)
            px_all = pdf["x"].to_numpy(dtype=np.float64)
            py_all = pdf["y"].to_numpy(dtype=np.float64)
            for i0 in range(0, n, block):
                i1 = min(i0 + block, n)
                m = i1 - i0
                px = px_all[i0:i1, None]
                py = py_all[i0:i1, None]
                tb, qxb, qyb = t[:m], qx[:m], qy[:m]
                # t = clamp01(((px-x1)·dx + (py-y1)·dy) / len2), 0 on degenerate
                np.subtract(px, x1, out=tb)
                tb *= dx
                np.subtract(py, y1, out=qxb)
                qxb *= dy
                tb += qxb
                tb /= safe
                np.clip(tb, 0.0, 1.0, out=tb)
                tb[:, degen] = 0.0
                # d² = (px - (x1 + t·dx))² + (py - (y1 + t·dy))²
                np.multiply(tb, dx, out=qxb)
                qxb += x1
                np.subtract(px, qxb, out=qxb)
                qxb *= qxb
                np.multiply(tb, dy, out=qyb)
                qyb += y1
                np.subtract(py, qyb, out=qyb)
                qyb *= qyb
                qxb += qyb
                np.sqrt(qxb.min(axis=1), out=out[i0:i1])
            yield pd.DataFrame({"id": pdf["id"], "value": out})

    return (
        points.select("id", "x", "y")
        .mapInPandas(gen, "id bigint, value double")
        .select(
            "id",
            F.lit(varname).alias("varname"),
            F.lit(year).cast("int").alias("year"),
            F.col("value").cast("double"),
        )
    )


# Max decoded segments the Arrow-kernel path will pull to the driver.
# 2M rows × 4 float64 ≈ 64 MB as a numpy broadcast — comfortably inside any
# driver; past that the shuffle cross join is the right plan anyway (the
# per-batch O(points·segments) kernel stops winning long before memory runs
# out). Road networks / unsimplified coastlines at national scale exceed this.
MAX_BROADCAST_SEGMENTS = 2_000_000


def nearest_distance(
    points: DataFrame,
    features: DataFrame,
    varname: str,
    year: int,
    simplify_tol: float | None = None,
    broadcast: bool = True,
) -> DataFrame:
    """points(id,x,y) × features(geometry WKB) → (id, varname, year, value=min dist).

    broadcast=True (feature dims are broadcast-small by nature): the decoded
    segments ship to executors as one numpy array (sc.broadcast) and each
    Arrow batch of points computes its min over all segments vectorized —
    the O(points × segments) pair relation is never materialized as rows, so
    the operator is a pure projection: zero joins, zero exchanges, one output
    row per point. Distance math mirrors ``point_segment_distance_col``
    bit-for-bit (both evaluate the same IEEE-double expression), and
    min-then-sqrt equals sqrt-then-min (monotone). The driver pull is capped
    at MAX_BROADCAST_SEGMENTS; past the cap the call transparently degrades
    to the shuffle plan below, so an unexpectedly huge feature side (full
    road network, unsimplified coastline) cannot OOM the driver. Note this
    path runs one eager Spark job (the decode+fetch) at pipeline-construction
    time; pass broadcast=False to stay fully lazy.

    broadcast=False (huge feature side): shuffle cross join + codegen
    distance + partial-agg min, one shuffle on id."""
    segs = decode_segments(
        features.where(F.col("year") == year).select("geometry"),
        simplify_tol=simplify_tol,
    )
    if broadcast:
        # Bounded driver pull: fetch at most MAX+1 rows (Arrow → float64,
        # ~32 B/row). If the cap is hit the feature side is not
        # broadcast-small — fall through to the shuffle cross join instead
        # of accumulating unbounded segment arrays on the driver.
        cap = MAX_BROADCAST_SEGMENTS
        pdf = segs.select("x1", "y1", "x2", "y2").limit(cap + 1).toPandas()
        if len(pdf) <= cap:
            arr = pdf.to_numpy(dtype="float64").reshape(-1, 4)
            return nearest_distance_from_array(points, arr, varname, year)

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
