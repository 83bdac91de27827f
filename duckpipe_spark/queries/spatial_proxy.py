"""Oracle-checkable analogs of the geospatial operator family.

The testdata has no geometry columns, so the distance/buffer operator classes
are exercised here on synthetic planar points derived deterministically from
the star schema; the *real* WKB geometry operators live in
``duckpipe_spark.geo`` / ``duckpipe_spark.calculator`` and are tested against
hand-computed fixtures in ``tests/``.

Coverage: J1 cross-join + per-id MIN distance
(`AirportDistanceCalculator.py:50-52` and 8 siblings), J2 cross-join against a
buffer-size VALUES list (`RoadLLWCalculator.py:85-86`), left-join zero-count
semantics (J6+A3), skeleton fill (J8).

Scale notes: the feature side (supplier) is broadcast — the per-point scan
never shuffles; distance math is pure column arithmetic inside whole-stage
codegen (no UDF). This is exactly the plan the real geo distance operator
produces after decoding feature geometry once on the broadcast side.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from duckpipe_spark.queries.base import register
from duckpipe_spark.sources.tables import load_table

# Synthetic planar coordinates (meters-ish), deterministic from keys.
_CX = "(c_acctbal * 7.0)"
_CY = "((c_custkey % 97) * 113.0)"
_SX = "(s_acctbal * 7.0)"
_SY = "((s_suppkey % 97) * 113.0)"

_NEAREST_ORACLE = f"""
SELECT
  c_custkey AS id,
  'D_Supplier' AS varname,
  round(min(sqrt(({_CX} - {_SX}) * ({_CX} - {_SX}) + ({_CY} - {_SY}) * ({_CY} - {_SY}))), 6) AS value
FROM customer
CROSS JOIN supplier
GROUP BY c_custkey
"""


def _points(df: DataFrame, x_expr: str, y_expr: str, id_col: str) -> DataFrame:
    return df.select(F.col(id_col).alias("id"), F.expr(x_expr).alias("x"), F.expr(y_expr).alias("y"))


@register("nearest_feature_distance", _NEAREST_ORACLE, "cross join + per-id MIN distance (J1/A1)")
def nearest_feature_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    from duckpipe_spark.operators.distance import nearest_neighbor_grid

    cust = _points(load_table(spark, sf_dir, "customer"), _CX, _CY, "c_custkey")
    supp = _points(load_table(spark, sf_dir, "supplier"), _SX, _SY, "s_suppkey").select(
        F.col("x").alias("fx"), F.col("y").alias("fy")
    )
    # grid-pruned exact NN (same values as the oracle's cross join): g=1000 m
    # ≈ 2× the mean nearest-supplier spacing at sf0.1, so pass A resolves
    # ~98% of points with ~10 candidates each instead of |supplier|
    nn = nearest_neighbor_grid(cust, supp, cell_size=1000.0)
    return nn.select(
        "id",
        F.lit("D_Supplier").alias("varname"),
        F.round(F.col("value"), 6).alias("value"),
    )


_RADII = [500.0, 1500.0, 4000.0]
_RADII_VALUES = ", ".join(f"({r})" for r in _RADII)

_RADIUS_ORACLE = f"""
SELECT
  c_custkey AS id,
  r AS radius,
  count(s_suppkey) AS n_within
FROM customer
CROSS JOIN (VALUES {_RADII_VALUES}) AS t(r)
LEFT JOIN supplier
  ON ({_CX} - {_SX}) * ({_CX} - {_SX}) + ({_CY} - {_SY}) * ({_CY} - {_SY}) < r * r
GROUP BY c_custkey, r
"""


@register("features_within_radius", _RADIUS_ORACLE, "buffer-size VALUES cross join + grid-bin radius count (J2/J6)")
def features_within_radius(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zero-filled radius counts via the engine's grid-bin join — a hash
    join on cell ids instead of an O(points × features) nested loop; the
    oracle's LEFT JOIN semantics are restored by the skeleton left join.

    All radii are counted from ONE candidate set: the grid join runs once
    per point at the LARGEST radius and every smaller radius is a
    conditional sum over the same candidate rows (the smaller-radius hits
    are a subset by construction). The earlier formulation cross-joined
    points × radii BEFORE candidate generation — 3× the grid-join volume
    and a 3×-wider groupBy key — for identical results."""
    from duckpipe_spark.operators.spatial_join import grid_join

    cust = _points(load_table(spark, sf_dir, "customer"), _CX, _CY, "c_custkey")
    supp = _points(load_table(spark, sf_dir, "supplier"), _SX, _SY, "s_suppkey").select(
        F.col("id").alias("fid"), F.col("x").alias("fx"), F.col("y").alias("fy")
    )
    rmax = max(_RADII)
    pb = (
        cust.withColumn("pxmin", F.col("x") - F.lit(rmax))
        .withColumn("pymin", F.col("y") - F.lit(rmax))
        .withColumn("pxmax", F.col("x") + F.lit(rmax))
        .withColumn("pymax", F.col("y") + F.lit(rmax))
    )
    sb = (
        supp.withColumn("sxmin", F.col("fx"))
        .withColumn("symin", F.col("fy"))
        .withColumn("sxmax", F.col("fx"))
        .withColumn("symax", F.col("fy"))
    )
    cand = grid_join(
        pb,
        sb,
        ("pxmin", "pymin", "pxmax", "pymax"),
        ("sxmin", "symin", "sxmax", "symax"),
        cell_size=2 * rmax,
        broadcast_right=True,
    )
    dist2 = (F.col("x") - F.col("fx")) * (F.col("x") - F.col("fx")) + (
        F.col("y") - F.col("fy")
    ) * (F.col("y") - F.col("fy"))
    per_id = cand.groupBy("id").agg(
        *[
            F.sum((dist2 < F.lit(r) * F.lit(r)).cast("bigint")).alias(f"_n{i}")
            for i, r in enumerate(_RADII)
        ]
    )
    stacked = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(r).alias("radius"),
                    F.coalesce(F.col(f"_n{i}"), F.lit(0)).cast("bigint").alias("n_within"),
                )
                for i, r in enumerate(_RADII)
            ]
        )
    )
    return (
        cust.select("id")
        .join(per_id, "id", "left")
        .select("id", stacked.alias("s"))
        .select("id", F.col("s.radius").alias("radius"), F.col("s.n_within").alias("n_within"))
    )
