"""Distributed graph analytics over edge DataFrames.

Companion to the dedup connected-components operator
(`functions/dedup.py`): where components tell you WHICH documents/parts
cluster together, triangle counts tell you how DENSE those clusters are
(clustering coefficient, community strength, co-occurrence mining).

`triangle_count` uses the degree-orientation algorithm (the standard
MapReduce formulation from Suri & Vassilvitskii's "Counting Triangles
and the Curse of the Last Reducer", WWW'11): orient every undirected
edge from its lower-(degree, id) endpoint to the higher one, build
wedges only from each node's OUT-neighbors, and close them against the
oriented edge list. Every node's out-degree is O(sqrt(m)), so wedge
volume is O(m^1.5) regardless of skew — a star node of degree 10^6
generates ZERO wedges from its center (all its edges point inward),
which is exactly the "last reducer" a naive u<v orientation dies on.

Shuffle shape: two groupBys for degrees, three equi-joins (degree
attach ×2, wedge build, wedge close) — all key-partitioned, no
cartesian, no driver state.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def cooccurrence_edges(df: DataFrame, group_col: str, item_col: str) -> DataFrame:
    """Distinct undirected co-occurrence edges (u < v): items sharing a
    group. The self-join is keyed on the group column — a group with k
    items emits k(k-1)/2 pairs, so cap pathological group sizes upstream
    (same df-cap reasoning as ngram_jaccard_pairs)."""
    a = df.select(F.col(group_col).alias("g"), F.col(item_col).alias("u"))
    b = df.select(F.col(group_col).alias("g"), F.col(item_col).alias("v"))
    return (
        a.join(b, "g")
        .where(F.col("u") < F.col("v"))
        .select("u", "v")
        .distinct()
    )


def triangle_count(edges: DataFrame) -> DataFrame:
    """Per-triangle rows `(a, b, c)` (ids ascending) for an undirected
    simple graph given as distinct `u < v` edge rows. Aggregate downstream
    (global count, per-vertex counts, clustering coefficient)."""
    deg = (
        edges.select(F.col("u").alias("n"))
        .unionAll(edges.select(F.col("v").alias("n")))
        .groupBy("n")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    e = (
        edges.join(deg.withColumnRenamed("n", "u").withColumnRenamed("d", "du"), "u")
        .join(deg.withColumnRenamed("n", "v").withColumnRenamed("d", "dv"), "v")
    )
    lower_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    oriented = e.select(
        F.when(lower_first, F.col("u")).otherwise(F.col("v")).alias("src"),
        F.when(lower_first, F.col("v")).otherwise(F.col("u")).alias("dst"),
        F.when(lower_first, F.col("dv")).otherwise(F.col("du")).alias("ddst"),
    )
    w1 = oriented.select("src", F.col("dst").alias("x"), F.col("ddst").alias("dx"))
    w2 = oriented.select("src", F.col("dst").alias("y"), F.col("ddst").alias("dy"))
    # out-neighbor pairs, ordered by the SAME (degree, id) total order the
    # orientation uses, so the closing edge — if present — is exactly x→y
    wedges = w1.join(w2, "src").where(
        (F.col("dx") < F.col("dy"))
        | ((F.col("dx") == F.col("dy")) & (F.col("x") < F.col("y")))
    )
    closed = wedges.join(
        oriented.select(F.col("src").alias("x"), F.col("dst").alias("y")),
        ["x", "y"],
        "left_semi",
    )
    return closed.select(
        F.least("src", "x", "y").alias("a"),
        # the middle id: total of the three minus min minus max
        (F.col("src") + F.col("x") + F.col("y")
         - F.least("src", "x", "y") - F.greatest("src", "x", "y")).alias("b"),
        F.greatest("src", "x", "y").alias("c"),
    )
