"""K-nearest-neighbor distances for point-cloud initialization.

TPU-native replacement for the reference's ``simple_knn._C.distCUDA2``
(SURVEY.md §2.11; call site /root/reference/scene/gaussian_model.py:163-167):
mean *squared* distance from each point to its 3 nearest neighbors, used
once per training run to set initial Gaussian log-scales.

This is one-shot host-side preprocessing, so the default path is a scipy
cKDTree (exact, fast, O(N log N)); a chunked brute-force JAX path exists
for environments without scipy and for gradient-free device-side use.
"""

from __future__ import annotations

import numpy as np

try:
    from scipy.spatial import cKDTree

    _HAVE_SCIPY = True
except Exception:  # pragma: no cover
    _HAVE_SCIPY = False


def mean_dist2_to_knn(points: np.ndarray, k: int = 3) -> np.ndarray:
    """Mean squared distance of each point to its k nearest neighbors.

    Args:
      points: (N, 3) float array (host numpy).
      k: neighbor count (the reference uses 3).

    Returns:
      (N,) float32 — mean over the k neighbors of squared euclidean distance.
    """
    points = np.asarray(points, dtype=np.float32)
    n = points.shape[0]
    if n <= 1:
        return np.full((n,), 1e-7, dtype=np.float32)
    kk = min(k, n - 1)
    if _HAVE_SCIPY:
        tree = cKDTree(points)
        # query returns the point itself at index 0
        d, _ = tree.query(points, k=kk + 1, workers=-1)
        d2 = (d[:, 1:] ** 2).mean(axis=1)
        return d2.astype(np.float32)
    return _brute_force_knn(points, kk)


def _brute_force_knn(points: np.ndarray, k: int, chunk: int = 4096) -> np.ndarray:
    """O(N^2) chunked fallback (numpy)."""
    n = points.shape[0]
    out = np.empty((n,), dtype=np.float32)
    for lo in range(0, n, chunk):
        hi = min(lo + chunk, n)
        d2 = ((points[lo:hi, None, :] - points[None, :, :]) ** 2).sum(-1)
        # exclude self (distance 0) by taking k+1 smallest and dropping col 0
        part = np.partition(d2, kth=k, axis=1)[:, 1 : k + 1]
        out[lo:hi] = part.mean(axis=1)
    return out
