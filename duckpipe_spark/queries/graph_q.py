"""Graph-analytics queries: co-occurrence edges + triangle counting.

Extends the dedup graph family (connected components in
`functions/dedup.py`) with density analytics — the market-basket
co-purchase graph over lineitem is the natural testdata workload.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from duckpipe_spark.functions.graph import cooccurrence_edges, triangle_counts_by_min
from duckpipe_spark.queries.base import register
from duckpipe_spark.sources.tables import load_table

_TRIANGLE_ORACLE = """
WITH ok_orders AS (
  SELECT l_orderkey FROM lineitem GROUP BY 1
  HAVING count(DISTINCT l_partkey) <= 10000
), e AS (
  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  WHERE a.l_orderkey IN (SELECT l_orderkey FROM ok_orders)
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
    bench=True,  # VERDICT r4 item 1's done-criterion reads BENCH_r5
)
def parts_triangle_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangles in the parts-bought-together graph, grouped by the
    triangle's smallest part id.

    The Spark side counts with degree orientation (wedge volume O(m^1.5),
    skew-immune — see `functions/graph.py`) via the no-per-triangle-row
    aggregate `triangle_counts_by_min`; the oracle counts with the naive
    a<b<c three-way self-join DuckDB's optimizer handles fine at test
    scale. Identical triangle sets, structurally different plans — which
    is the point: the count is orientation-invariant, the worst-case
    reducer load is not. ``broadcast_adj=True`` because the part graph's
    node table (~20k·SF nodes) keeps the adjacency payload a few MB —
    the documented small-graph fast path, not the web-scale default."""
    li = load_table(spark, sf_dir, "lineitem")
    sym = cooccurrence_edges(
        li, "l_orderkey", "l_partkey", distinct=False, symmetric=True
    )
    return triangle_counts_by_min(sym=sym, broadcast_adj=True)


_PR_ITER, _PR_DAMP, _PR_SCALE = 6, 85, 10**12


def _pagerank_oracle() -> str:
    """Unrolled-CTE integer PageRank (same fixed-point arithmetic as
    `functions.graph.pagerank` — DuckDB `//` floor-div equals Spark `DIV`
    on the all-positive BIGINTs used here). Unrolled because recursive
    CTEs with aggregation in the recursive term are not portable; the
    same pattern as the k-means oracle in similarity_q."""
    base = f"({(100 - _PR_DAMP) * _PR_SCALE} // (100 * (SELECT n FROM nn)))"
    ctes = [
        """ok_orders AS (
  SELECT l_orderkey FROM lineitem GROUP BY 1
  HAVING count(DISTINCT l_partkey) <= 10000
), e0 AS (
  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
  FROM lineitem a JOIN lineitem b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  WHERE a.l_orderkey IN (SELECT l_orderkey FROM ok_orders)
)""",
        "e AS (SELECT u AS src, v AS dst FROM e0 UNION ALL SELECT v, u FROM e0)",
        "deg AS (SELECT src, count(*) AS od FROM e GROUP BY 1)",
        "nodes AS (SELECT DISTINCT src AS node FROM e)",
        "nn AS (SELECT count(*) AS n FROM nodes)",
        f"r0 AS (SELECT node, {_PR_SCALE} // (SELECT n FROM nn) AS r FROM nodes)",
    ]
    for i in range(_PR_ITER):
        ctes.append(
            f"c{i} AS (SELECT e.dst AS node, CAST(sum(r{i}.r // deg.od) AS BIGINT) AS s"
            f" FROM r{i} JOIN e ON r{i}.node = e.src JOIN deg ON deg.src = r{i}.node"
            f" GROUP BY 1)"
        )
        ctes.append(
            f"r{i + 1} AS (SELECT nodes.node,"
            f" {base} + ({_PR_DAMP} * COALESCE(c{i}.s, 0)) // 100 AS r"
            f" FROM nodes LEFT JOIN c{i} USING (node))"
        )
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT node AS part, r AS rank_int FROM r{_PR_ITER}"
    )


@register(
    "parts_pagerank",
    _pagerank_oracle(),
    "fixed-point integer PageRank on the co-purchase graph (exact iterative hash match)",
)
def parts_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the symmetrized parts-bought-together graph — an
    exact-integer iterative algorithm hash-compared against a 6-iteration
    unrolled-CTE oracle (see `functions.graph.pagerank`)."""
    from duckpipe_spark.functions.graph import pagerank, symmetrize

    li = load_table(spark, sf_dir, "lineitem")
    edges = symmetrize(cooccurrence_edges(li, "l_orderkey", "l_partkey"))
    pr = pagerank(edges, iterations=_PR_ITER, damping_pct=_PR_DAMP, scale=_PR_SCALE)
    return pr.select(F.col("node").alias("part"), "rank_int")
