"""Per-Gaussian screen-space preprocessing (project, EWA, SH->RGB, culling).

This is the TPU-native analog of the reference's ``preprocessCUDA``
(diff-gaussian-rasterization/cuda_rasterizer/forward.cu:156-260): instead of a
per-Gaussian CUDA thread, the whole pass is batched vectorized JAX — dense
(N, ...) arithmetic that XLA maps onto the VPU/MXU. Culled Gaussians are not
compacted (static shapes); they carry ``radii == 0`` and ``tiles_touched == 0``
exactly like the reference, and downstream binning masks them out.

Gradients flow through everything (autodiff replaces the reference's
handwritten backward.cu:144-398 kernels).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from neuralgaussiansplatting_tpu.ops import projection as proj
from neuralgaussiansplatting_tpu.ops import sh as sh_ops
from neuralgaussiansplatting_tpu.ops import transforms


@jax.tree_util.register_pytree_node_class
class CameraParams:
    """Camera bundle passed into jitted render fns.

    ``view`` and ``full_proj`` are (4, 4) applied as ``M @ p`` (see
    ops/projection.py for the convention note vs the reference's transposed
    storage); ``campos`` is the world-space camera center. These three are
    pytree leaves (dynamic — switching cameras does not retrigger
    compilation), while ``tan_fov*``/``width``/``height`` are static aux data
    (shapes and tile grids depend on them).
    """

    __slots__ = ("view", "full_proj", "campos", "tan_fovx", "tan_fovy",
                 "width", "height", "limit_x", "limit_y")

    def __init__(self, view, full_proj, campos, tan_fovx, tan_fovy,
                 width, height, limit_x=None, limit_y=None):
        self.view = view
        self.full_proj = full_proj
        self.campos = campos
        self.tan_fovx = float(tan_fovx)
        self.tan_fovy = float(tan_fovy)
        self.width = int(width)
        self.height = int(height)
        # EWA frustum-clamp limits (forward.cu:84-85: 1.3 * tan_fov). A
        # viewport strip of a larger frame passes the FULL frame's limits so
        # a strip-sharded render is bit-identical to the monolithic one.
        self.limit_x = float(limit_x) if limit_x is not None else 1.3 * self.tan_fovx
        self.limit_y = float(limit_y) if limit_y is not None else 1.3 * self.tan_fovy

    def tree_flatten(self):
        return ((self.view, self.full_proj, self.campos),
                (self.tan_fovx, self.tan_fovy, self.width, self.height,
                 self.limit_x, self.limit_y))

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = object.__new__(cls)
        obj.view, obj.full_proj, obj.campos = children
        (obj.tan_fovx, obj.tan_fovy, obj.width, obj.height,
         obj.limit_x, obj.limit_y) = aux
        return obj

    def __repr__(self):
        return (f"CameraParams({self.width}x{self.height}, "
                f"tan_fov=({self.tan_fovx:.4f},{self.tan_fovy:.4f}))")


def _cov2d_components(means3d, scales, rotations, view, focal_x, focal_y,
                      limit_x, limit_y, scale_modifier):
    """Fused component-wise EWA pipeline: quat+scale -> Sigma3D -> conic.

    Mathematically identical to transforms.build_covariance_3d +
    projection.compute_cov2d, but written as scalar-column arithmetic so XLA
    keeps everything in one elementwise fusion over N instead of
    materializing (N, 3, 3) intermediates in HBM.
    """
    q = rotations / jnp.sqrt(jnp.maximum(
        jnp.sum(rotations * rotations, axis=-1, keepdims=True), 1e-16))
    r, x, y, z = q[:, 0], q[:, 1], q[:, 2], q[:, 3]
    R00 = 1 - 2 * (y * y + z * z)
    R01 = 2 * (x * y - r * z)
    R02 = 2 * (x * z + r * y)
    R10 = 2 * (x * y + r * z)
    R11 = 1 - 2 * (x * x + z * z)
    R12 = 2 * (y * z - r * x)
    R20 = 2 * (x * z - r * y)
    R21 = 2 * (y * z + r * x)
    R22 = 1 - 2 * (x * x + y * y)
    s2 = (scales * scale_modifier) ** 2
    s0, s1, s2_ = s2[:, 0], s2[:, 1], s2[:, 2]
    # Sigma = R diag(s^2) R^T
    Sxx = R00 * R00 * s0 + R01 * R01 * s1 + R02 * R02 * s2_
    Sxy = R00 * R10 * s0 + R01 * R11 * s1 + R02 * R12 * s2_
    Sxz = R00 * R20 * s0 + R01 * R21 * s1 + R02 * R22 * s2_
    Syy = R10 * R10 * s0 + R11 * R11 * s1 + R12 * R12 * s2_
    Syz = R10 * R20 * s0 + R11 * R21 * s1 + R12 * R22 * s2_
    Szz = R20 * R20 * s0 + R21 * R21 * s1 + R22 * R22 * s2_

    W = view[:3, :3]
    tx_ = means3d @ W[0] + view[0, 3]
    ty_ = means3d @ W[1] + view[1, 3]
    tz_raw = means3d @ W[2] + view[2, 3]
    # z floor well below the 0.2 cull (see projection.compute_cov2d note)
    tz_ = jnp.where(jnp.abs(tz_raw) < 0.01,
                    jnp.where(tz_raw < 0, -0.01, 0.01), tz_raw)
    txz = jnp.clip(tx_ / tz_, -limit_x, limit_x) * tz_
    tyz = jnp.clip(ty_ / tz_, -limit_y, limit_y) * tz_

    inv_z = 1.0 / tz_
    inv_z2 = inv_z * inv_z
    # T = J W rows (2, 3) per gaussian
    a0 = focal_x * inv_z
    c0 = -focal_x * txz * inv_z2
    b1 = focal_y * inv_z
    c1 = -focal_y * tyz * inv_z2
    T00 = a0 * W[0, 0] + c0 * W[2, 0]
    T01 = a0 * W[0, 1] + c0 * W[2, 1]
    T02 = a0 * W[0, 2] + c0 * W[2, 2]
    T10 = b1 * W[1, 0] + c1 * W[2, 0]
    T11 = b1 * W[1, 1] + c1 * W[2, 1]
    T12 = b1 * W[1, 2] + c1 * W[2, 2]

    # cov2d = T Sigma T^T
    u0 = T00 * Sxx + T01 * Sxy + T02 * Sxz
    u1 = T00 * Sxy + T01 * Syy + T02 * Syz
    u2 = T00 * Sxz + T01 * Syz + T02 * Szz
    v0 = T10 * Sxx + T11 * Sxy + T12 * Sxz
    v1 = T10 * Sxy + T11 * Syy + T12 * Syz
    v2 = T10 * Sxz + T11 * Syz + T12 * Szz
    cxx = u0 * T00 + u1 * T01 + u2 * T02 + 0.3
    cxy = u0 * T10 + u1 * T11 + u2 * T12
    cyy = v0 * T10 + v1 * T11 + v2 * T12 + 0.3
    return cxx, cxy, cyy, tz_


class Preprocessed(NamedTuple):
    means2d: jnp.ndarray        # (N, 2) pixel-space centers
    depths: jnp.ndarray         # (N,) view-space z
    radii: jnp.ndarray          # (N,) int32, 0 => culled
    conic: jnp.ndarray          # (N, 3) inverse 2D covariance (A, B, C)
    opacity: jnp.ndarray        # (N,) activated opacity
    rgb: jnp.ndarray            # (N, 3) view-dependent color
    rect_min: jnp.ndarray       # (N, 2) int32 tile rect (x, y), inclusive
    rect_max: jnp.ndarray       # (N, 2) int32 tile rect, exclusive
    tiles_touched: jnp.ndarray  # (N,) int32


def preprocess_gaussians(
    means3d: jnp.ndarray,
    scales: jnp.ndarray,
    rotations: jnp.ndarray,
    opacities: jnp.ndarray,
    shs: jnp.ndarray,
    sh_degree: int,
    cam: CameraParams,
    block_x: int,
    block_y: int,
    scale_modifier: float = 1.0,
    cov3d_precomp: jnp.ndarray | None = None,
    colors_precomp: jnp.ndarray | None = None,
    tight: bool = False,
) -> Preprocessed:
    """Vectorized preprocess of N Gaussians for one camera.

    Args mirror the reference rasterizer inputs; ``scales``/``opacities`` are
    already activated (exp / sigmoid applied by the model layer).
    """
    n = means3d.shape[0]
    tiles_x = (cam.width + block_x - 1) // block_x
    tiles_y = (cam.height + block_y - 1) // block_y

    # Near-plane cull (auxiliary.h:139-162: view z <= 0.2).
    p_view = proj.transform_points_4x3(means3d, cam.view)
    depths = p_view[..., 2]
    in_front = depths > 0.2

    # Project to NDC then pixels (forward.cu:198-201, 217).
    p_ndc = proj.project_points(means3d, cam.full_proj)
    means2d = jnp.stack(
        [proj.ndc2pix(p_ndc[..., 0], cam.width),
         proj.ndc2pix(p_ndc[..., 1], cam.height)],
        axis=-1,
    )

    # 3D covariance -> EWA 2D covariance -> conic + radius.
    focal_x = cam.width / (2.0 * cam.tan_fovx)
    focal_y = cam.height / (2.0 * cam.tan_fovy)
    if cov3d_precomp is not None:
        cov3d = transforms.unstrip_symmetric(cov3d_precomp)
        cov2d = proj.compute_cov2d(
            means3d, cov3d, cam.view, focal_x, focal_y, cam.tan_fovx,
            cam.tan_fovy, cam.limit_x, cam.limit_y,
        )
    else:
        cxx, cxy, cyy, _ = _cov2d_components(
            means3d, scales, rotations, cam.view, focal_x, focal_y,
            cam.limit_x, cam.limit_y, scale_modifier)
        cov2d = jnp.stack([cxx, cxy, cyy], axis=-1)
    conic, radius, det = proj.conic_and_radius(cov2d)

    # Validity / radii always use the reference's square 3-sigma rect so the
    # public radii/visibility semantics match the CUDA implementation
    # (forward.cu:190-236) regardless of the tight-culling optimization.
    rect_min, rect_max = proj.tile_rect(
        means2d, radius, tiles_x, tiles_y, block_x, block_y
    )
    rect_w = rect_max[..., 0] - rect_min[..., 0]
    rect_h = rect_max[..., 1] - rect_min[..., 1]

    # Reference cull chain: near plane, det == 0, empty rect (forward.cu
    # 190-236). radii = 0 encodes "culled" downstream, as in the reference.
    # Additionally cull exactly-zero opacity: the reference can't produce it
    # (sigmoid > 0), but this framework's dead capacity-padding slots carry
    # opacity == 0 — without this they bin as full-size phantom instances
    # that waste capacity and evict real Gaussians from per-tile caps.
    valid = (in_front & (det != 0.0) & (rect_w * rect_h > 0)
             & (opacities > 0.0))
    radii = jnp.where(valid, radius, 0.0).astype(jnp.int32)

    if tight:
        # Opacity-adaptive per-axis extents (image- and gradient-exact).
        # The blend kernel zeroes any contribution with alpha < 1/255
        # (forward.cu:351), and the largest |dx| on the alpha = 1/255 level
        # set of alpha = op*exp(-0.5 d^T Sigma^{-1} d) is
        # sqrt(2*ln(255*op) * Sigma_xx) (bbox of an ellipse from its
        # covariance diagonal). Any pixel outside the per-axis box therefore
        # contributes exactly zero in forward AND backward, so intersecting
        # the reference's square rect with this box drops only dead
        # instances. Only the diagnostic n_contrib (an index into the
        # per-tile list, reference backward.cu's `contributor`) and the
        # num_rendered/max_per_tile monitors shrink.
        two_l = 2.0 * jnp.log(jnp.maximum(opacities, 1e-12) * 255.0)
        pos = two_l > 0.0
        two_l = jnp.maximum(two_l, 0.0)
        ext_x = jnp.where(
            pos, jnp.minimum(radius, jnp.ceil(
                jnp.sqrt(jnp.maximum(two_l * cov2d[..., 0], 0.0)))),
            0.0)
        ext_y = jnp.where(
            pos, jnp.minimum(radius, jnp.ceil(
                jnp.sqrt(jnp.maximum(two_l * cov2d[..., 2], 0.0)))),
            0.0)
        # Exact-coverage rect of the per-axis box, intersected with the
        # reference rect. (The reference's own +BLOCK-1 exclusive-max formula
        # under-covers pixels at |d| <= r when floor(p+r) lands on a tile
        # boundary — harmless there because it defines ground truth, but our
        # ext is fractional, so use floor(p+ext)+1 which covers every integer
        # pixel with |pix - p| <= ext, then clip into the reference rect.)
        x, y = means2d[..., 0], means2d[..., 1]
        tmin_x = jnp.maximum(rect_min[..., 0], jnp.clip(
            jnp.floor((x - ext_x) / block_x), 0, tiles_x).astype(jnp.int32))
        tmin_y = jnp.maximum(rect_min[..., 1], jnp.clip(
            jnp.floor((y - ext_y) / block_y), 0, tiles_y).astype(jnp.int32))
        tmax_x = jnp.minimum(rect_max[..., 0], jnp.clip(
            jnp.floor((x + ext_x) / block_x) + 1, 0, tiles_x).astype(jnp.int32))
        tmax_y = jnp.minimum(rect_max[..., 1], jnp.clip(
            jnp.floor((y + ext_y) / block_y) + 1, 0, tiles_y).astype(jnp.int32))
        rect_min = jnp.stack([tmin_x, tmin_y], axis=-1)
        rect_max = jnp.stack([tmax_x, tmax_y], axis=-1)
        rect_w = jnp.maximum(tmax_x - tmin_x, 0)
        rect_h = jnp.maximum(tmax_y - tmin_y, 0)
        tiles = jnp.where(valid & pos, rect_w * rect_h, 0).astype(jnp.int32)
    else:
        tiles = jnp.where(valid, rect_w * rect_h, 0).astype(jnp.int32)

    if colors_precomp is not None:
        rgb = colors_precomp
    else:
        rgb = sh_ops.sh_to_rgb_color(sh_degree, shs, means3d, cam.campos)

    assert rgb.shape == (n, 3)
    return Preprocessed(
        means2d=means2d,
        depths=depths,
        radii=radii,
        conic=conic,
        opacity=opacities,
        rgb=rgb,
        rect_min=rect_min,
        rect_max=rect_max,
        tiles_touched=tiles,
    )
