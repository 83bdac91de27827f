"""Graph analytics walkthrough: co-occurrence edges → triangle density →
PageRank centrality on the parts-bought-together graph.

The three operators share one edge list, so the example also shows the
intended reuse pattern: build edges once, localCheckpoint, fan out.

    PYTHONPATH=. python examples/graph_analytics.py [sf_dir]
"""

import sys

sys.path.insert(0, ".")

import pyspark.sql.functions as F

from duckpipe_spark.functions.graph import (
    cooccurrence_edges,
    pagerank,
    symmetrize,
    triangle_count,
)
from duckpipe_spark.session import get_spark
from duckpipe_spark.sources.tables import load_table


def main(sf_dir: str = "/root/testdata/sf0.01") -> None:
    spark = get_spark("graph-analytics-example")
    li = load_table(spark, sf_dir, "lineitem")

    edges = cooccurrence_edges(li, "l_orderkey", "l_partkey").localCheckpoint()
    n_edges = edges.count()

    tris = triangle_count(edges)
    per_vertex = tris.select(F.explode(F.array("a", "b", "c")).alias("part")).groupBy(
        "part"
    ).agg(F.count(F.lit(1)).alias("n_triangles"))

    pr = pagerank(symmetrize(edges), iterations=6)

    top = (
        pr.join(per_vertex, pr.node == per_vertex.part, "left")
        .select(
            pr.node.alias("part"),
            "rank_int",
            F.coalesce("n_triangles", F.lit(0)).alias("n_triangles"),
        )
        .orderBy(F.col("rank_int").desc())
        .limit(10)
    )
    print(f"edges: {n_edges}")
    print("top-10 parts by PageRank (with triangle participation):")
    for r in top.collect():
        print(f"  part={r.part:>8}  rank={r.rank_int:>12}  triangles={r.n_triangles}")


if __name__ == "__main__":
    main(*sys.argv[1:2])
