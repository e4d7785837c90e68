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
    if cov3d_precomp is not None:
        cov3d = transforms.unstrip_symmetric(cov3d_precomp)
    else:
        cov3d = transforms.build_covariance_3d(scales, scale_modifier, rotations)
    focal_x = cam.width / (2.0 * cam.tan_fovx)
    focal_y = cam.height / (2.0 * cam.tan_fovy)
    cov2d = proj.compute_cov2d(
        means3d, cov3d, cam.view, focal_x, focal_y, cam.tan_fovx,
        cam.tan_fovy, cam.limit_x, cam.limit_y,
    )
    conic, radius, det = proj.conic_and_radius(cov2d)

    rect_min, rect_max = proj.tile_rect(
        means2d, radius, tiles_x, tiles_y, block_x, block_y
    )
    rect_w = rect_max[..., 0] - rect_min[..., 0]
    rect_h = rect_max[..., 1] - rect_min[..., 1]

    # Reference cull chain: near plane, det == 0, empty rect (forward.cu
    # 190-236). radii = 0 encodes "culled" downstream, as in the reference.
    valid = in_front & (det != 0.0) & (rect_w * rect_h > 0)
    radii = jnp.where(valid, radius, 0.0).astype(jnp.int32)
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
