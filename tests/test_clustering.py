"""Parity tests for chunk_by_centroid vs the reference algorithm
(`duckpipe/calculator/Clustering.py:53-125`): complete-linkage hierarchical
clustering cut at a distance threshold, 20k-row arrival blocks, oversize
re-slicing, size-desc chunk order.

scipy isn't available here, so instead of calling scipy we pin the two
properties that uniquely determine fcluster(linkage(X,'complete'), t,
'distance') for points in general position:
  (1) every cluster's Euclidean diameter (max pairwise distance) is <= t;
  (2) the complete-linkage distance between any two clusters is > t
      (the dendrogram cut is maximal — no further merge at height <= t).
plus exact-output checks on constructed fixtures where the reference's
answer is known by hand.
"""

from __future__ import annotations

import numpy as np
import pytest

from duckpipe_spark.geo.cluster import chunk_rows, fcluster_distance

RNG = np.random.default_rng(7)


def _diameter(X):
    if len(X) < 2:
        return 0.0
    D = np.sqrt(((X[:, None, :] - X[None, :, :]) ** 2).sum(-1))
    return D.max()


def _linkage_between(A, B):
    return np.sqrt(((A[:, None, :] - B[None, :, :]) ** 2).sum(-1)).max()


@pytest.mark.parametrize("n,t", [(60, 0.5), (300, 1.2), (1000, 2.0)])
def test_fcluster_cut_properties(n, t):
    X = RNG.uniform(0, 10, size=(n, 2))
    labels = fcluster_distance(X, t)
    groups = [X[labels == g] for g in np.unique(labels)]
    for g in groups:
        assert _diameter(g) <= t + 1e-9
    for i in range(len(groups)):
        for j in range(i + 1, len(groups)):
            assert _linkage_between(groups[i], groups[j]) > t - 1e-9


def test_fcluster_well_separated_blobs():
    """Three blobs of radius << gap: the unique valid partition is the blobs
    themselves — exactly what the reference's scipy pipeline returns."""
    centers = np.array([[0.0, 0.0], [100.0, 0.0], [0.0, 100.0]])
    pts, want = [], []
    for k, c in enumerate(centers):
        pts.append(c + RNG.normal(scale=0.5, size=(40, 2)))
        want += [k] * 40
    X = np.vstack(pts)
    labels = fcluster_distance(X, t=10.0)
    # same partition as blob membership
    want = np.asarray(want)
    for k in range(3):
        blob_labels = labels[want == k]
        assert (blob_labels == blob_labels[0]).all()
    assert len(np.unique(labels)) == 3


def test_chunk_rows_slicing_and_order():
    """Oversize clusters are sliced into max_cluster_size pieces preserving
    row order; final list is size-desc (Clustering.py:111-125)."""
    # one tight mega-cluster of 120 points + one of 30, far apart
    ids = np.arange(1, 151)
    x = np.concatenate([np.full(120, 0.0) + RNG.normal(scale=0.1, size=120),
                        np.full(30, 1000.0) + RNG.normal(scale=0.1, size=30)])
    y = RNG.normal(scale=0.1, size=150)
    chunks = chunk_rows(ids, x, y, max_cluster_size=50, distance_threshold=10.0)
    sizes = [len(c) for c in chunks]
    assert sizes == sorted(sizes, reverse=True)
    # 120 -> slices of 50/50/20; 30 stays whole
    assert sorted(sizes, reverse=True) == [50, 50, 30, 20]
    # slices preserve arrival order: the two 50-slices are ids 1-50, 51-100
    fifties = [c for c in chunks if len(c) == 50]
    assert fifties[0].tolist() == list(range(1, 51))
    assert fifties[1].tolist() == list(range(51, 101))
    twenty = next(c for c in chunks if len(c) == 20)
    assert twenty.tolist() == list(range(101, 121))


def test_chunk_rows_blocking_is_per_block():
    """Blocks are clustered independently (Clustering.py:94-99): two nearby
    points in different max_rows blocks land in different chunks."""
    ids = np.arange(1, 7)
    x = np.array([0.0, 50.0, 0.1, 0.2, 50.1, 50.2])
    y = np.zeros(6)
    chunks = chunk_rows(ids, x, y, max_cluster_size=10, distance_threshold=1.0, max_rows=3)
    as_sets = sorted(tuple(sorted(c.tolist())) for c in chunks)
    # block 1 = rows 1..3 -> {1,3}, {2}; block 2 = rows 4..6 -> {4}, {5,6}
    assert as_sets == [(1, 3), (2,), (4,), (5, 6)]


def test_chunk_rows_edge_cases():
    assert chunk_rows(np.array([], dtype=np.int64), np.array([]), np.array([])) == []
    one = chunk_rows(np.array([7]), np.array([1.0]), np.array([2.0]))
    assert len(one) == 1 and one[0].tolist() == [7]


def test_calculator_chunk_by_centroid_e2e(spark):
    """End-to-end through the Calculator: assignments cover all ids exactly
    once, respect the cut properties, and the repartitioned points survive."""
    import pandas as pd

    from duckpipe_spark.calculator import Calculator

    n = 200
    pdf = pd.DataFrame(
        {
            "longitude": RNG.uniform(126.8, 127.2, n),
            "latitude": RNG.uniform(37.4, 37.7, n),
            "tag": np.arange(n),
        }
    )
    c = Calculator(data_dir="/tmp", spark=spark, verbose=False)
    c.add_point_with_table(pdf, x_col="longitude", y_col="latitude", epsg=4326)
    c.chunk_by_centroid(max_cluster_size=20, distance_threshold=3000.0)
    chunks = c.chunk_assignments()
    allids = np.concatenate(chunks)
    assert sorted(allids.tolist()) == list(range(1, n + 1))
    assert max(len(ch) for ch in chunks) <= 20
    sizes = [len(ch) for ch in chunks]
    assert sizes == sorted(sizes, reverse=True)
    # points DataFrame intact after the chunk repartition
    pts = c.points.toPandas()
    assert sorted(pts["id"].tolist()) == list(range(1, n + 1))
    assert c.get_chunks() == min(len(chunks), 2048)
