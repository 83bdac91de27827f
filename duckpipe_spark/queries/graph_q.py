"""Graph-analytics queries: co-occurrence edges + triangle counting.

Extends the dedup graph family (connected components in
`functions/dedup.py`) with density analytics — the market-basket
co-purchase graph over lineitem is the natural testdata workload.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from duckpipe_spark.functions.graph import cooccurrence_edges, triangle_count
from duckpipe_spark.queries.base import register
from duckpipe_spark.sources.tables import load_table

_TRIANGLE_ORACLE = """
WITH e AS (
  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
)
SELECT e1.u AS part, CAST(count(*) AS BIGINT) AS n_triangles
FROM e e1
JOIN e e2 ON e1.v = e2.u
JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v
GROUP BY 1
"""


@register(
    "parts_triangle_counts",
    _TRIANGLE_ORACLE,
    "degree-oriented triangle counting on the co-purchase part graph",
)
def parts_triangle_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangles in the parts-bought-together graph, grouped by the
    triangle's smallest part id.

    The Spark side counts with degree orientation (wedge volume O(m^1.5),
    skew-immune — see `functions/graph.py`); the oracle counts with the
    naive a<b<c three-way self-join DuckDB's optimizer handles fine at
    test scale. Identical triangle sets, structurally different plans —
    which is the point: the count is orientation-invariant, the worst-case
    reducer load is not."""
    li = load_table(spark, sf_dir, "lineitem")
    edges = cooccurrence_edges(li, "l_orderkey", "l_partkey")
    tris = triangle_count(edges)
    return tris.groupBy(F.col("a").alias("part")).agg(
        F.count(F.lit(1)).alias("n_triangles")
    )
