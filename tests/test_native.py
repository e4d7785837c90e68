"""Native library tests: build, COLMAP bulk parse parity, KNN exactness."""

import os
import struct

import numpy as np
import pytest

from neuralgaussiansplatting_tpu import native


requires_native = pytest.mark.skipif(not native.available(),
                                     reason="native toolchain unavailable")


@requires_native
def test_points3d_native_matches_python(tmp_path):
    # craft a points3D.bin with variable-length tracks
    path = str(tmp_path / "points3D.bin")
    rng = np.random.default_rng(0)
    n = 500
    xyz = rng.normal(size=(n, 3))
    rgb = rng.integers(0, 256, (n, 3), dtype=np.uint8)
    err = rng.random(n)
    with open(path, "wb") as f:
        f.write(struct.pack("<Q", n))
        for i in range(n):
            f.write(struct.pack("<QdddBBBd", i, *xyz[i], *rgb[i], err[i]))
            track = int(rng.integers(0, 5))
            f.write(struct.pack("<Q", track))
            f.write(b"\x00" * (8 * track))

    out = native.read_points3d_binary(path)
    assert out is not None
    nxyz, nrgb, nerr = out
    np.testing.assert_allclose(nxyz, xyz)
    assert (nrgb == rgb).all()
    np.testing.assert_allclose(nerr, err)


@requires_native
def test_native_knn_exact():
    rng = np.random.default_rng(1)
    pts = rng.normal(size=(3000, 3)).astype(np.float32)
    got = native.knn_mean_dist3(pts)
    assert got is not None
    d2 = ((pts[:, None, :] - pts[None, :, :]) ** 2).sum(-1)
    np.fill_diagonal(d2, np.inf)
    want = np.sort(d2, axis=1)[:, :3].mean(axis=1)
    np.testing.assert_allclose(got, want, rtol=2e-4)


@requires_native
def test_native_knn_clustered():
    # clustered points stress the box pruning
    rng = np.random.default_rng(2)
    clusters = [rng.normal(loc=c, scale=0.01, size=(400, 3))
                for c in ([0, 0, 0], [5, 5, 5], [-3, 2, 9])]
    pts = np.concatenate(clusters).astype(np.float32)
    got = native.knn_mean_dist3(pts)
    d2 = ((pts[:, None, :] - pts[None, :, :]) ** 2).sum(-1)
    np.fill_diagonal(d2, np.inf)
    want = np.sort(d2, axis=1)[:, :3].mean(axis=1)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-10)
