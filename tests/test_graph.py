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
