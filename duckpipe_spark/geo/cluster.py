"""Complete-linkage hierarchical clustering (pure numpy).

Re-implements the clustering the reference delegates to scipy
(`duckpipe/calculator/Clustering.py:103-105`: ``linkage(X, method="complete",
metric="euclidean")`` + ``fcluster(Z, t, criterion="distance")``) without the
scipy dependency. The nearest-neighbor-chain algorithm with the
Lance-Williams max-update builds the same dendrogram (complete linkage is
reducible, hence monotone and chain-safe); cutting it at height ``t`` via
union-find over merges with height <= t reproduces fcluster's flat clusters.

Properties that pin the semantics (see tests/test_clustering.py):
- every flat cluster has Euclidean diameter (max pairwise distance) <= t;
- the complete-linkage distance between any two distinct flat clusters is > t.
For point sets in general position (no exact linkage-distance ties) that
partition is unique, so it equals scipy's.
"""

from __future__ import annotations

import numpy as np


def _pairwise(X: np.ndarray) -> np.ndarray:
    """Dense Euclidean distance matrix, inf diagonal.

    Built blockwise into one preallocated (n,n) array: a whole-matrix
    ``X @ X.T`` would allocate a second n² temp and double peak memory
    (6.4 GB → 3.3 GB at the 20k-row default block). Values are identical —
    each block evaluates the same float64 expression."""
    n = len(X)
    sq = np.sum(X * X, axis=1)
    D = np.empty((n, n), dtype=np.float64)
    block = max(1, min(n, 2_048))
    T = np.empty((block, n), dtype=np.float64)
    for i0 in range(0, n, block):
        i1 = min(i0 + block, n)
        Db, Tb = D[i0:i1], T[: i1 - i0]
        np.dot(X[i0:i1], X.T, out=Tb)
        Tb *= 2.0
        # same float64 expression tree as the whole-matrix version:
        # (sq_i + sq_j) - 2·(X@X.T) — block order must not flip linkage ties
        np.add(sq[i0:i1, None], sq[None, :], out=Db)
        Db -= Tb
        np.maximum(Db, 0.0, out=Db)
        np.sqrt(Db, out=Db)
    np.fill_diagonal(D, np.inf)
    return D


def complete_linkage_merges(X: np.ndarray) -> list[tuple[int, int, float]]:
    """Full dendrogram as (rep_a, rep_b, height) merges via NN-chain.

    Cluster representatives are row indices; after a merge the smaller index
    represents the union. O(n^2) time and memory (same envelope as scipy's
    condensed-matrix linkage, which the reference runs per 20k-row block).
    """
    n = len(X)
    if n < 2:
        return []
    D = _pairwise(X.astype(np.float64))
    active = np.ones(n, dtype=bool)
    merges: list[tuple[int, int, float]] = []
    chain: list[int] = []
    n_active = n
    while n_active > 1:
        if not chain:
            chain.append(int(np.flatnonzero(active)[0]))
        while True:
            a = chain[-1]
            row = np.where(active, D[a], np.inf)
            row[a] = np.inf
            b = int(np.argmin(row))
            if len(chain) >= 2 and b == chain[-2]:
                break
            chain.append(b)
        b = chain.pop()
        a = chain.pop()
        keep, drop = (a, b) if a < b else (b, a)
        merges.append((keep, drop, float(D[a, b])))
        # Lance-Williams complete-linkage update: d(k, a∪b) = max(d(k,a), d(k,b))
        np.maximum(D[keep, :], D[drop, :], out=D[keep, :])
        D[:, keep] = D[keep, :]
        D[keep, keep] = np.inf
        active[drop] = False
        n_active -= 1
    return merges


def fcluster_distance(X: np.ndarray, t: float) -> np.ndarray:
    """Flat cluster labels equivalent to scipy
    ``fcluster(linkage(X, 'complete'), t, criterion='distance')``.

    Labels are arbitrary ints; callers group rows by label (the reference
    groups with ``sort=False``, i.e. first-appearance order, so numbering is
    irrelevant to chunk identity).
    """
    n = len(X)
    parent = np.arange(n)

    def find(i: int) -> int:
        while parent[i] != i:
            parent[i] = parent[parent[i]]
            i = parent[i]
        return i

    # Complete linkage is monotone, so the cut at t is exactly the union of
    # all merges with height <= t, in any order.
    for a, b, h in complete_linkage_merges(X):
        if h <= t:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
    return np.fromiter((find(i) for i in range(n)), dtype=np.int64, count=n)


def chunk_rows(
    ids: np.ndarray,
    x: np.ndarray,
    y: np.ndarray,
    max_cluster_size: int = 50,
    distance_threshold: float = 2000.0,
    max_rows: int = 20000,
) -> list[np.ndarray]:
    """Reference ``chunk_by_centroid`` chunk construction
    (`Clustering.py:94-125`): arrival-order blocks of ``max_rows``, flat
    complete-linkage clusters per block cut at ``distance_threshold``, groups
    emitted in first-appearance order, oversize clusters sliced into
    ``max_cluster_size`` pieces preserving row order, and the final chunk
    list sorted by size descending (stable).
    """
    n = len(ids)
    if n == 0:
        return []
    if n == 1:
        return [ids[:1]]
    chunks: list[np.ndarray] = []
    for i0 in range(0, n, max_rows):
        i1 = min(i0 + max_rows, n)
        block_ids = ids[i0:i1]
        X = np.column_stack([x[i0:i1], y[i0:i1]]).astype(np.float64)
        labels = fcluster_distance(X, float(distance_threshold))
        # first-appearance grouping, preserving row order within groups
        _, first_ix, inv = np.unique(labels, return_index=True, return_inverse=True)
        order = np.argsort(first_ix, kind="stable")
        rank = np.empty_like(order)
        rank[order] = np.arange(len(order))
        for lbl_rank in range(len(first_ix)):
            members = block_ids[rank[inv] == lbl_rank]
            if len(members) <= max_cluster_size:
                chunks.append(members)
            else:
                chunks.extend(
                    members[j : j + max_cluster_size]
                    for j in range(0, len(members), max_cluster_size)
                )
    chunks.sort(key=len, reverse=True)
    return chunks
