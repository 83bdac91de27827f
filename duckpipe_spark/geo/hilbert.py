"""Hilbert space-filling-curve key (vectorized numpy).

Replaces `ORDER BY ST_Hilbert(geometry, bounds)` (`Clustering.py:174-178`):
the engine uses the key with `repartitionByRange` to give partitions spatial
locality, which is what the reference's centroid/Hilbert chunkers achieve
with driver-side clustering (SURVEY.md §2.12 C2/C3, §4).

Standard public iterative bit-interleave formulation (rotation/reflection per
level, as in the classic Wikipedia `xy2d` routine), vectorized over arrays.
"""

from __future__ import annotations

import numpy as np


def hilbert_d(x, y, order: int = 16) -> np.ndarray:
    """Map integer grid coords in [0, 2**order) to Hilbert distance."""
    rx = np.zeros_like(np.asarray(x, dtype=np.int64))
    x = np.asarray(x, dtype=np.int64).copy()
    y = np.asarray(y, dtype=np.int64).copy()
    d = np.zeros_like(x)
    s = np.int64(1) << (order - 1)
    while s > 0:
        rx = ((x & s) > 0).astype(np.int64)
        ry = ((y & s) > 0).astype(np.int64)
        d += s * s * ((3 * rx) ^ ry)
        # rotate
        swap = ry == 0
        flip = swap & (rx == 1)
        x_f, y_f = x.copy(), y.copy()
        x = np.where(flip, s - 1 - x_f, x_f)
        y = np.where(flip, s - 1 - y_f, y_f)
        x2, y2 = x.copy(), y.copy()
        x = np.where(swap, y2, x2)
        y = np.where(swap, x2, y2)
        s >>= 1
    return d


def hilbert_key(
    xs,
    ys,
    xmin: float,
    ymin: float,
    xmax: float,
    ymax: float,
    order: int = 16,
) -> np.ndarray:
    """Hilbert distance of float coords scaled into the given bounds."""
    xs = np.asarray(xs, dtype=np.float64)
    ys = np.asarray(ys, dtype=np.float64)
    n = (np.int64(1) << order) - 1
    w = max(xmax - xmin, 1e-12)
    h = max(ymax - ymin, 1e-12)
    gx = np.clip(((xs - xmin) / w * n), 0, n).astype(np.int64)
    gy = np.clip(((ys - ymin) / h * n), 0, n).astype(np.int64)
    return hilbert_d(gx, gy, order)
