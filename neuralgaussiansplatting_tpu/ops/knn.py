"""Init-time 3-nearest-neighbor mean squared distance.

Replaces the reference's ``simple-knn`` CUDA extension
(submodules/simple-knn/simple_knn.cu:185-220 ``distCUDA2``), which computes an
*approximate* KNN via Morton-sorted boxes. Used exactly once, at model init,
to seed Gaussian scales (scene/gaussian_model.py:160-161) — so this is host
code, and we use an exact KD-tree query (scipy) instead of porting the
approximation. A pure-JAX chunked brute-force fallback is provided for
environments without scipy.
"""

from __future__ import annotations

import numpy as np


def mean_sq_dist_3nn(points: np.ndarray) -> np.ndarray:
    """(N, 3) -> (N,) mean squared distance to the 3 nearest neighbors.

    Prefers the multithreaded native Morton-boxed implementation
    (native/ngs_native.cpp — the same pruning scheme as the reference's
    simple-knn, and exact: box pruning only skips boxes that provably cannot
    contain a closer neighbor), then scipy's KD-tree, then JAX brute force.
    """
    points = np.asarray(points, dtype=np.float32)
    if len(points) < 2:
        return np.zeros(len(points), np.float32)
    from neuralgaussiansplatting_tpu import native
    if len(points) > 4:
        res = native.knn_mean_dist3(points)
        if res is not None:
            return res
    try:
        from scipy.spatial import cKDTree
        tree = cKDTree(points)
        # k<=4: the first neighbor of each point is itself at distance 0.
        d, _ = tree.query(points, k=min(4, len(points)))
        d2 = np.atleast_2d(d)[:, 1:] ** 2
        return d2.mean(axis=1).astype(np.float32)
    except ImportError:
        return _brute_force_3nn(points)


def _brute_force_3nn(points: np.ndarray, chunk: int = 2048) -> np.ndarray:
    import jax.numpy as jnp
    import jax

    pts = jnp.asarray(points)

    @jax.jit
    def one_chunk(q):
        d2 = jnp.sum((q[:, None, :] - pts[None, :, :]) ** 2, axis=-1)
        # smallest is the point itself (0); take ranks 1..3
        top = -jax.lax.top_k(-d2, 4)[0]
        return top[:, 1:].mean(axis=1)

    out = []
    for i in range(0, len(points), chunk):
        out.append(np.asarray(one_chunk(pts[i:i + chunk])))
    return np.concatenate(out).astype(np.float32)
