"""Degree-oriented triangle counting vs brute force on known graphs."""

from itertools import combinations

import pytest

from duckpipe_spark.functions.graph import cooccurrence_edges, triangle_count


def _edges_df(spark, pairs):
    return spark.createDataFrame(
        [(min(u, v), max(u, v)) for u, v in pairs], "u bigint, v bigint"
    ).distinct()


def _brute(pairs):
    es = {(min(u, v), max(u, v)) for u, v in pairs}
    nodes = sorted({n for e in es for n in e})
    return sorted(
        (a, b, c)
        for a, b, c in combinations(nodes, 3)
        if (a, b) in es and (b, c) in es and (a, c) in es
    )


@pytest.mark.parametrize(
    "pairs",
    [
        [(1, 2), (2, 3), (1, 3)],                     # one triangle
        [(1, 2), (2, 3), (3, 4), (4, 1)],             # 4-cycle: none
        list(combinations(range(1, 6), 2)),           # K5: C(5,3)=10
        [(0, i) for i in range(1, 50)],               # star: none, and the
        # hot center generates zero wedges under degree orientation
        [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5), (3, 5), (1, 100)],
    ],
)
def test_matches_brute_force(spark, pairs):
    got = sorted(
        (r.a, r.b, r.c) for r in triangle_count(_edges_df(spark, pairs)).collect()
    )
    assert got == _brute(pairs)


def test_random_graph_property(spark):
    import random

    rng = random.Random(7)
    pairs = {(rng.randint(1, 40), rng.randint(1, 40)) for _ in range(200)}
    pairs = [(u, v) for u, v in pairs if u != v]
    got = sorted(
        (r.a, r.b, r.c) for r in triangle_count(_edges_df(spark, pairs)).collect()
    )
    assert got == _brute(pairs)
    assert len(got) == len(set(got)), "each triangle exactly once"


def test_cooccurrence_edges(spark):
    df = spark.createDataFrame(
        [(1, 10), (1, 11), (1, 12), (2, 11), (2, 10), (3, 99)],
        "g bigint, item bigint",
    )
    got = sorted((r.u, r.v) for r in cooccurrence_edges(df, "g", "item").collect())
    assert got == [(10, 11), (10, 12), (11, 12)]


def test_pagerank_uniform_on_regular_graph(spark):
    """On a vertex-transitive graph (a cycle) every node must end with the
    identical rank — and it must equal the fixed-point base case."""
    from duckpipe_spark.functions.graph import pagerank, symmetrize

    n = 6
    cyc = _edges_df(spark, [(i, (i + 1) % n) for i in range(n)])
    got = {r.node: r.rank_int for r in pagerank(symmetrize(cyc), iterations=4).collect()}
    assert len(set(got.values())) == 1 and len(got) == n
    # symmetric start SCALE//n, every iteration redistributes evenly:
    # r = (15*SCALE)//(100*n) + (85*r_prev)//100 converges near SCALE//n
    assert abs(next(iter(got.values())) - 10**12 // n) < 10**7


def test_pagerank_ranks_hub_highest(spark):
    from duckpipe_spark.functions.graph import pagerank, symmetrize

    star_plus = _edges_df(spark, [(0, i) for i in range(1, 8)] + [(1, 2)])
    got = {r.node: r.rank_int for r in pagerank(symmetrize(star_plus), iterations=6).collect()}
    assert got[0] == max(got.values())
    assert got[1] == got[2] > got[3]  # the extra edge lifts 1 and 2 equally
    assert got[3] == got[4] == got[5] == got[6] == got[7]


def test_pagerank_deterministic_across_partitionings(spark):
    from duckpipe_spark.functions.graph import pagerank, symmetrize

    import random

    rng = random.Random(11)
    pairs = [(u, v) for u, v in {(rng.randint(1, 30), rng.randint(1, 30)) for _ in range(120)} if u != v]
    e = symmetrize(_edges_df(spark, pairs))
    a = sorted((r.node, r.rank_int) for r in pagerank(e, iterations=5).collect())
    b = sorted((r.node, r.rank_int) for r in pagerank(e.repartition(17), iterations=5).collect())
    assert a == b


def test_group_size_cap_bounds_edge_blowup(spark):
    """One catch-all group must not quadratically dominate the edge list:
    with the cap it is dropped entirely; without, it emits C(50,2) pairs."""
    rows = [(1, i) for i in range(50)] + [(2, 10), (2, 11)]
    df = spark.createDataFrame(rows, "g bigint, item bigint")
    capped = cooccurrence_edges(df, "g", "item", max_group_size=10)
    assert sorted((r.u, r.v) for r in capped.collect()) == [(10, 11)]
    uncapped = cooccurrence_edges(df, "g", "item", max_group_size=None)
    # group 2's (10, 11) already exists inside group 1's C(50,2) pair set
    assert uncapped.count() == 50 * 49 // 2


def test_triangle_ids_near_int64_max_no_overflow(spark):
    """Hash-derived node ids span the full BIGINT range; the triple
    extraction must not do arithmetic that overflows (ANSI mode would
    raise; legacy mode would silently corrupt the middle id)."""
    big = 2**62
    pairs = [(big, big + 1), (big + 1, big + 2), (big, big + 2)]
    got = [(r.a, r.b, r.c) for r in triangle_count(_edges_df(spark, pairs)).collect()]
    assert got == [(big, big + 1, big + 2)]


def test_pagerank_includes_pure_sink_nodes(spark):
    """A genuinely directed edge list: node 3 has in-edges only. It must
    still appear in the output (base rank + received mass), and mass it
    receives is not redistributed (no dangling re-spread, by contract)."""
    from duckpipe_spark.functions.graph import pagerank

    e = spark.createDataFrame([(1, 3), (2, 3), (1, 2)], "src bigint, dst bigint")
    got = {r.node: r.rank_int for r in pagerank(e, iterations=4).collect()}
    assert set(got) == {1, 2, 3}
    assert got[3] == max(got.values())  # the sink absorbs the most mass


def test_counts_by_min_equals_explode_path(spark):
    """triangle_counts_by_min ≡ triangle_count(...).groupBy(min).count(),
    both broadcast and shuffle adjacency attach, on a random graph."""
    import random

    import pyspark.sql.functions as F

    from duckpipe_spark.functions.graph import triangle_counts_by_min

    rng = random.Random(23)
    pairs = [(u, v) for u, v in {(rng.randint(1, 60), rng.randint(1, 60)) for _ in range(500)} if u != v]
    e = _edges_df(spark, pairs)
    want = sorted(
        (r.part, r.n_triangles)
        for r in triangle_count(e)
        .groupBy(F.col("a").alias("part"))
        .agg(F.count(F.lit(1)).alias("n_triangles"))
        .collect()
    )
    for bc in (False, True):
        got = sorted(
            (r.part, r.n_triangles)
            for r in triangle_counts_by_min(e, broadcast_adj=bc).collect()
        )
        assert got == want, f"broadcast_adj={bc}"
