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
from neuralgaussiansplatting_tpu.models import nets
from neuralgaussiansplatting_tpu.ops import idxmap as idxmap_ops
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
    convert_shs_python: bool = False,
    compute_cov3d_python: bool = False,
):
    """Classic differentiable 3DGS render (reference render, :19-101).

    Returns a dict with the reference's keys: "render" (3, H, W),
    "visibility_filter", "radii"; plus overflow monitors. The reference's
    ``viewspace_points`` grad-retention trick is replaced by the
    ``means2d_offset`` argument — pass zeros (N, 2) and take its gradient.

    ``convert_shs_python`` / ``compute_cov3d_python`` mirror the reference's
    cross-implementation A/B flags (gaussian_renderer/__init__.py:63-83):
    they route SH->RGB / covariance through the model-layer helpers and feed
    the rasterizer via its ``*_precomp`` inputs, exercising the same
    alternate code path the reference uses as its kernel oracle.
    """
    if scaling_modifier != 1.0:
        settings = rast.RasterizeSettings(
            **{**settings.__dict__, "scale_modifier": scaling_modifier})

    colors_precomp = override_color
    if override_color is None and convert_shs_python:
        from neuralgaussiansplatting_tpu.ops import sh as sh_ops
        colors_precomp = sh_ops.sh_to_rgb_color(
            active_sh_degree, gm.get_features(params), params.xyz, cam.campos)
    cov3d_precomp = None
    if compute_cov3d_python:
        cov3d_precomp = gm.get_covariance(params, scaling_modifier)

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
        colors_precomp=colors_precomp,
        cov3d_precomp=cov3d_precomp,
    )
    n = params.xyz.shape[0]
    return {
        "render": out.color,
        # reference parity: the ``screenspace_points`` grad-retention dummy
        # (gaussian_renderer/__init__.py:27-31,99). Densification stats come
        # from d loss / d means2d_offset instead (see ops/rasterize.py), so
        # this is the offset actually rendered (zeros unless supplied).
        "viewspace_points": (means2d_offset if means2d_offset is not None
                             else jnp.zeros((n, 2), jnp.float32)),
        "visibility_filter": out.radii > 0,
        "radii": out.radii,
        "final_t": out.final_t,
        "n_contrib": out.n_contrib,
        "num_rendered": out.num_rendered,
        "max_per_tile": out.max_per_tile,
        "aligned_demand": out.aligned_demand,
        "dropped": out.dropped,
        "culled": out.culled,
    }


# ---------------------------------------------------------------------------
# Neural-feature render paths (the fork's render1/render2/render3)
# ---------------------------------------------------------------------------

def init_decoders(key):
    """Initialize all screen-space decoder parameters (reference
    ``GaussianModel._init_networks``, scene/gaussian_model.py:185-196).

    Returns a dict pytree {mlp, unet, cnn, pure_cnn} of Flax variables; the
    Denoiser is parameter-free (models/nets.py:denoise).
    """
    import jax

    k1, k2, k3, k4 = jax.random.split(key, 4)
    dummy = jnp.zeros((16, 16, idxmap_ops.NUM_FEATURES), jnp.float32)
    return {
        "mlp": nets.FeatureToRGBMLP().init(k1, dummy),
        "unet": nets.UNet().init(k2, dummy),
        "cnn": nets.CNN().init(k3, dummy),
        "pure_cnn": nets.PureCNN().init(k4, dummy),
    }


def _idx_common(cam, params, capacity, alive=None):
    return idxmap_ops.render_idxmaps(
        params.xyz, params.features, cam, capacity, alive)


def render1(cam: CameraParams, params: gm.GaussianParams, net_params,
            capacity: int = 1 << 21, dtype=jnp.float32, alive=None):
    """idxmap -> per-pixel MLP decode (reference render1, :104-210).

    Returns the reference's keys; ``radii`` is the all-ones placeholder and
    visibility comes from idxmap>0 exactly as the reference does (:189-192).
    """
    maps = _idx_common(cam, params, capacity, alive)
    mlp_out = nets.FeatureToRGBMLP(dtype=dtype).apply(
        net_params["mlp"], maps.featuremap)
    return {
        "render": jnp.transpose(mlp_out, (2, 0, 1)),
        "viewspace_points": jnp.zeros((params.xyz.shape[0], 2), jnp.float32),
        "num_inst": maps.num_inst,
        "idxmap": maps.idxmap,
        "colmap": maps.colmap,
        "depthmap": maps.depthmap,
        "featuremap": maps.featuremap,
        "visibility_filter": maps.idxmap > 0,
        "radii": jnp.ones(params.xyz.shape[0], jnp.int32),
    }


def render2(cam: CameraParams, params: gm.GaussianParams, net_params,
            capacity: int = 1 << 21, dtype=jnp.float32, alive=None):
    """idxmap -> UNet RGB + CNN dynamic 9x9 kernels -> Denoiser
    (reference render2, :214-323)."""
    maps = _idx_common(cam, params, capacity, alive)
    denoiser_kernels = nets.CNN(dtype=dtype).apply(
        net_params["cnn"], maps.featuremap)
    unet_output = nets.UNet(dtype=dtype).apply(
        net_params["unet"], maps.featuremap)
    final = nets.denoise(unet_output, denoiser_kernels)
    return {
        "render": jnp.transpose(final, (2, 0, 1)),
        # reference key/layout parity: the UNet RGB is returned as
        # "aggregation" [H, W, 3] (gaussian_renderer/__init__.py:323)
        "aggregation": unet_output,
        "viewspace_points": jnp.zeros((params.xyz.shape[0], 2), jnp.float32),
        "num_inst": maps.num_inst,
        "idxmap": maps.idxmap,
        "colmap": maps.colmap,
        "depthmap": maps.depthmap,
        "featuremap": maps.featuremap,
        "denoiser": denoiser_kernels,
        "visibility_filter": maps.idxmap > 0,
        "radii": jnp.ones(params.xyz.shape[0], jnp.int32),
    }


def render3(cam: CameraParams, params: gm.GaussianParams, net_params,
            capacity: int = 1 << 21, dtype=jnp.float32, alive=None):
    """idxmap -> MLP aggregation + CNN kernels -> Denoiser
    (reference render3, :326-434)."""
    maps = _idx_common(cam, params, capacity, alive)
    aggregation = nets.FeatureToRGBMLP(dtype=dtype).apply(
        net_params["mlp"], maps.featuremap)
    denoiser_kernels = nets.CNN(dtype=dtype).apply(
        net_params["cnn"], maps.featuremap)
    final = nets.denoise(aggregation, denoiser_kernels)
    return {
        "render": jnp.transpose(final, (2, 0, 1)),
        "aggregation": aggregation,
        "viewspace_points": jnp.zeros((params.xyz.shape[0], 2), jnp.float32),
        "num_inst": maps.num_inst,
        "idxmap": maps.idxmap,
        "colmap": maps.colmap,
        "depthmap": maps.depthmap,
        "featuremap": maps.featuremap,
        "denoiser": denoiser_kernels,
        "visibility_filter": maps.idxmap > 0,
        "radii": jnp.ones(params.xyz.shape[0], jnp.int32),
    }
