"""Shared tiny random scene + camera builders for tests."""

import math

import numpy as np

from neuralgaussiansplatting_tpu.ops import projection as proj
from neuralgaussiansplatting_tpu.ops.preprocess import CameraParams


def make_camera(W=40, H=24, fovx_deg=60.0, dist=4.0, angle=0.0,
                znear=0.01, zfar=100.0):
    """Camera on a circle of radius ``dist`` in the z=0 plane, looking at the
    origin, reference matrix conventions."""
    fovx = math.radians(fovx_deg)
    fovy = proj.focal2fov(proj.fov2focal(fovx, W), H)

    # cam-to-world rotation: camera looks along +z (reference convention),
    # positioned at angle on the circle.
    fwd = -np.array([math.cos(angle), math.sin(angle), 0.0])  # toward origin
    up = np.array([0.0, 0.0, 1.0])
    right = np.cross(up, fwd)
    right /= np.linalg.norm(right)
    true_up = np.cross(fwd, right)
    R = np.stack([right, true_up, fwd], axis=1)  # cam-to-world (cols = axes)
    cam_pos = -fwd * dist
    t = -R.T @ cam_pos  # world-to-cam translation

    view = proj.get_world_to_view(R, t)
    projm = proj.get_projection_matrix(znear, zfar, fovx, fovy)
    full = (projm @ view).astype(np.float32)
    return CameraParams(
        view=view, full_proj=full, campos=cam_pos.astype(np.float32),
        tan_fovx=math.tan(fovx / 2), tan_fovy=math.tan(fovy / 2),
        width=W, height=H,
    )


def random_gaussians(n=300, deg=2, seed=0, spread=1.2, scale_lo=0.02,
                     scale_hi=0.12):
    rng = np.random.default_rng(seed)
    k = (deg + 1) ** 2
    means = rng.uniform(-spread, spread, (n, 3)).astype(np.float32)
    scales = rng.uniform(scale_lo, scale_hi, (n, 3)).astype(np.float32)
    rot = rng.normal(size=(n, 4)).astype(np.float32)
    rot /= np.linalg.norm(rot, axis=1, keepdims=True)
    opac = rng.uniform(0.2, 0.95, (n,)).astype(np.float32)
    shs = (rng.normal(size=(n, k, 3)) * 0.3).astype(np.float32)
    shs[:, 0, :] = rng.uniform(-0.5, 1.5, (n, 3))
    return means, scales, rot, opac, shs
