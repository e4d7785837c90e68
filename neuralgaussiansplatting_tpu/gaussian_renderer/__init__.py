"""Render API mirroring the reference ``gaussian_renderer`` package.

``render`` is the classic 3DGS path (reference gaussian_renderer/__init__.py:
19-101); ``render1``/``render2``/``render3`` are the fork's neural-feature
paths (:104-434), built on the per-pixel z-buffer op in ops/idxmap.py.

All functions are pure and jit-friendly: they take parameter pytrees plus a
``CameraParams`` bundle and return a dict of arrays (the reference returns
autograd tensors; here gradients flow through ``jax.grad`` over these
functions instead).
"""

from __future__ import annotations

import jax.numpy as jnp

from neuralgaussiansplatting_tpu.models import gaussians as gm
from neuralgaussiansplatting_tpu.ops import rasterize as rast
from neuralgaussiansplatting_tpu.ops.preprocess import CameraParams


def render(
    cam: CameraParams,
    params: gm.GaussianParams,
    alive: jnp.ndarray,
    active_sh_degree: int,
    bg_color: jnp.ndarray,
    settings: rast.RasterizeSettings = rast.RasterizeSettings(),
    scaling_modifier: float = 1.0,
    means2d_offset: jnp.ndarray | None = None,
    override_color: jnp.ndarray | None = None,
):
    """Classic differentiable 3DGS render (reference render, :19-101).

    Returns a dict with the reference's keys: "render" (3, H, W),
    "visibility_filter", "radii"; plus overflow monitors. The reference's
    ``viewspace_points`` grad-retention trick is replaced by the
    ``means2d_offset`` argument — pass zeros (N, 2) and take its gradient.
    """
    if scaling_modifier != 1.0:
        settings = rast.RasterizeSettings(
            **{**settings.__dict__, "scale_modifier": scaling_modifier})
    out = rast.rasterize(
        means3d=params.xyz,
        scales=gm.get_scaling(params),
        rotations=gm.get_rotation(params),
        opacities=gm.get_opacity(params, alive),
        shs=gm.get_features(params),
        sh_degree=active_sh_degree,
        cam=cam,
        bg=bg_color,
        settings=settings,
        means2d_offset=means2d_offset,
        colors_precomp=override_color,
    )
    return {
        "render": out.color,
        "visibility_filter": out.radii > 0,
        "radii": out.radii,
        "final_t": out.final_t,
        "n_contrib": out.n_contrib,
        "num_rendered": out.num_rendered,
        "max_per_tile": out.max_per_tile,
    }
