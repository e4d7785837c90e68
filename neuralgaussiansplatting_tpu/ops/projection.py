"""Camera matrices, perspective projection and EWA 2D covariance.

Behavioral parity targets (reference, /root/reference):
- utils/graphics_utils.py:38-77 (``getWorld2View2``, ``getProjectionMatrix``,
  fov<->focal). The reference stores these matrices *transposed* and applies
  them as row-vector products (transformPoint4x4, auxiliary.h:58-80). We store
  them untransposed and apply them as ``M @ p`` — numerically identical.
- forward.cu:74-113 (``computeCov2D``: EWA J·W conjugation, 1.3*tan_fov
  clamping, +0.3 px low-pass) and 216-232 (radius & rect from eigenvalues).
- auxiliary.h:41-56 (``ndc2Pix``, ``getRect``), :139-162 (``in_frustum``:
  cull at view-space z <= 0.2).
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# Camera matrices (host-side numpy, built once per camera)
# ---------------------------------------------------------------------------

def fov2focal(fov: float, pixels: float) -> float:
    return pixels / (2.0 * math.tan(fov / 2.0))


def focal2fov(focal: float, pixels: float) -> float:
    return 2.0 * math.atan(pixels / (2.0 * focal))


def get_world_to_view(R: np.ndarray, t: np.ndarray,
                      translate: np.ndarray = np.zeros(3),
                      scale: float = 1.0) -> np.ndarray:
    """World->view 4x4 (applied as M @ p). Reference getWorld2View2.

    ``R`` is the COLMAP cam-to-world rotation (the reference stores it
    transposed into the matrix), ``t`` the world-to-cam translation.
    """
    Rt = np.zeros((4, 4), dtype=np.float64)
    Rt[:3, :3] = R.transpose()
    Rt[:3, 3] = t
    Rt[3, 3] = 1.0
    C2W = np.linalg.inv(Rt)
    cam_center = (C2W[:3, 3] + translate) * scale
    C2W[:3, 3] = cam_center
    return np.linalg.inv(C2W).astype(np.float32)


def get_projection_matrix(znear: float, zfar: float,
                          fovx: float, fovy: float) -> np.ndarray:
    """OpenGL-style z in [0, 1] perspective matrix (applied as M @ p).

    Reference utils/graphics_utils.py:51-71.
    """
    tan_half_fovy = math.tan(fovy / 2.0)
    tan_half_fovx = math.tan(fovx / 2.0)
    top = tan_half_fovy * znear
    right = tan_half_fovx * znear
    P = np.zeros((4, 4), dtype=np.float32)
    P[0, 0] = znear / right
    P[1, 1] = znear / top
    P[3, 2] = 1.0
    P[2, 2] = zfar / (zfar - znear)
    P[2, 3] = -(zfar * znear) / (zfar - znear)
    return P


# ---------------------------------------------------------------------------
# Batched point projection (device-side JAX)
# ---------------------------------------------------------------------------

def transform_points_4x3(points: jnp.ndarray, view: jnp.ndarray) -> jnp.ndarray:
    """(N, 3) world points -> (N, 3) view-space points; view is M @ p 4x4."""
    return points @ view[:3, :3].T + view[:3, 3]


def transform_points_4x4(points: jnp.ndarray, mat: jnp.ndarray) -> jnp.ndarray:
    """(N, 3) points -> (N, 4) homogeneous transform by 4x4 (M @ p)."""
    return points @ mat[:, :3].T + mat[:, 3]


def project_points(points: jnp.ndarray, full_proj: jnp.ndarray) -> jnp.ndarray:
    """(N, 3) world -> (N, 3) NDC with the reference's +1e-7 w-guard.

    Reference forward.cu:198-201 (p_hom / (p_hom.w + 1e-7)).
    """
    p_hom = transform_points_4x4(points, full_proj)
    denom = p_hom[..., 3:4] + 1e-7
    # magnitude floor: points on the camera plane (w ~ 0) are near-plane
    # culled, but an unguarded divide makes their *gradients* NaN
    denom = jnp.where(jnp.abs(denom) < 1e-6,
                      jnp.where(denom < 0, -1e-6, 1e-6), denom)
    return p_hom[..., :3] / denom


def ndc2pix(v: jnp.ndarray, size: int) -> jnp.ndarray:
    """Reference auxiliary.h:41-44."""
    return ((v + 1.0) * size - 1.0) * 0.5


def compute_cov2d(
    means3d: jnp.ndarray,
    cov3d: jnp.ndarray,
    view: jnp.ndarray,
    focal_x: float,
    focal_y: float,
    tan_fovx: float,
    tan_fovy: float,
    limit_x: float | None = None,
    limit_y: float | None = None,
) -> jnp.ndarray:
    """EWA projection of (N, 3, 3) world covariances to (N, 3) packed 2D
    covariances (cxx, cxy, cyy), including the reference's frustum clamping
    and +0.3 pixel low-pass filter. Reference forward.cu:74-113.
    ``limit_*`` override the clamp bounds (viewport strips of a larger frame
    pass the full frame's 1.3*tan_fov).
    """
    t = transform_points_4x3(means3d, view)
    # z magnitude floor well below the 0.2 near-plane cull: rows with
    # |z| < 0.01 are culled anyway, and flooring keeps 1/z^2 products from
    # overflowing f32 into inf (inf - inf => NaN downstream, and NaN in a
    # culled row's *gradient* poisons the row under Adam)
    tz = jnp.where(jnp.abs(t[..., 2]) < 0.01,
                   jnp.where(t[..., 2] < 0, -0.01, 0.01), t[..., 2])
    limx = 1.3 * tan_fovx if limit_x is None else limit_x
    limy = 1.3 * tan_fovy if limit_y is None else limit_y
    tx = jnp.clip(t[..., 0] / tz, -limx, limx) * tz
    ty = jnp.clip(t[..., 1] / tz, -limy, limy) * tz

    # J is the affine approximation of the perspective map at (tx, ty, tz).
    zero = jnp.zeros_like(tz)
    J = jnp.stack(
        [
            jnp.stack([focal_x / tz, zero, -(focal_x * tx) / (tz * tz)], -1),
            jnp.stack([zero, focal_y / tz, -(focal_y * ty) / (tz * tz)], -1),
        ],
        axis=-2,
    )  # (N, 2, 3)
    W = view[:3, :3]  # rotation part of world->view
    T = J @ W  # (N, 2, 3)
    cov = T @ cov3d @ jnp.swapaxes(T, -1, -2)  # (N, 2, 2)
    cxx = cov[..., 0, 0] + 0.3
    cyy = cov[..., 1, 1] + 0.3
    cxy = cov[..., 0, 1]
    return jnp.stack([cxx, cxy, cyy], axis=-1)


def conic_and_radius(cov2d: jnp.ndarray):
    """Invert packed 2D covariance and compute the 3-sigma pixel radius.

    Reference forward.cu:219-232. Returns (conic (N,3), radius (N,), det (N,)).
    Radius is the reference's ceil(3*sqrt(max eigenvalue)).
    """
    cxx, cxy, cyy = cov2d[..., 0], cov2d[..., 1], cov2d[..., 2]
    det = cxx * cyy - cxy * cxy
    det_inv = jnp.where(det != 0.0, 1.0 / det, 0.0)
    conic = jnp.stack([cyy * det_inv, -cxy * det_inv, cxx * det_inv], axis=-1)
    mid = 0.5 * (cxx + cyy)
    # inf - inf (overflown covariances of degenerate rows) would be NaN;
    # such rows render garbage in the CUDA reference too — just keep finite
    d2 = mid * mid - det
    d2 = jnp.where(jnp.isfinite(d2), d2, 0.1)
    disc = jnp.sqrt(jnp.maximum(0.1, d2))
    lambda1 = mid + disc
    radius = jnp.ceil(3.0 * jnp.sqrt(jnp.maximum(lambda1, mid - disc)))
    return conic, radius, det


def tile_rect(point_image: jnp.ndarray, radius: jnp.ndarray,
              tiles_x: int, tiles_y: int, block_x: int, block_y: int,
              radius_y: jnp.ndarray | None = None):
    """Tile-space bounding rect of a splat. Reference auxiliary.h:46-56.

    Returns (rect_min (N,2) int32, rect_max (N,2) int32), exclusive max,
    clipped to the tile grid; matches CUDA int-division semantics for
    non-negative operands after the clamping. ``radius_y`` allows per-axis
    extents (tight culling); default is the reference's square rect.
    """
    x, y = point_image[..., 0], point_image[..., 1]
    ry = radius if radius_y is None else radius_y
    rmin_x = jnp.clip(jnp.floor((x - radius) / block_x), 0, tiles_x).astype(jnp.int32)
    rmin_y = jnp.clip(jnp.floor((y - ry) / block_y), 0, tiles_y).astype(jnp.int32)
    rmax_x = jnp.clip(jnp.floor((x + radius + block_x - 1) / block_x), 0, tiles_x).astype(jnp.int32)
    rmax_y = jnp.clip(jnp.floor((y + ry + block_y - 1) / block_y), 0, tiles_y).astype(jnp.int32)
    return (jnp.stack([rmin_x, rmin_y], -1), jnp.stack([rmax_x, rmax_y], -1))


def geom_transform_points(points: jnp.ndarray, transf_matrix: jnp.ndarray) -> jnp.ndarray:
    """Homogeneous-transform points with the +1e-7 w-guard (reference
    utils/graphics_utils.py:22-29; that version takes the transposed matrix —
    ours is M @ p)."""
    out = transform_points_4x4(points, transf_matrix)
    return out[..., :3] / (out[..., 3:4] + 1e-7)
