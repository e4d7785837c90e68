"""Public differentiable rasterization API (preprocess -> bin -> blend).

TPU-native counterpart of the reference ``GaussianRasterizer``
(diff_gaussian_rasterization/__init__.py:171-218 + rasterizer_impl.cu
``Rasterizer::forward/backward``). Differences by design:

- Static shapes end to end: instance capacity and per-tile caps are settings
  (with true counts reported for monitoring) instead of per-frame realloc.
- Gradients come from JAX autodiff through the whole pipeline (the Pallas
  production kernel plugs in underneath with a custom VJP of identical
  contract); there are no atomics anywhere — per-Gaussian gradient reduction
  is the transpose of the instance gather, which XLA emits as a deterministic
  scatter-add.
- Densification statistics: the reference reads ``.grad`` of a dummy
  ``screenspace_points`` tensor scaled to half-image units
  (backward.cu ddelx_dx = 0.5*W; scene/gaussian_model.py:550-552). Here the
  same quantity is exposed as the gradient of the ``means2d_offset`` argument
  (an all-zeros (N, 2) array added in NDC before the pixel mapping, so
  d/d offset == dL/dpix * W/2 — identical scale to the reference).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax.numpy as jnp

from neuralgaussiansplatting_tpu.ops import binning
from neuralgaussiansplatting_tpu.ops import blend as blend_xla
from neuralgaussiansplatting_tpu.ops import preprocess as pp
from neuralgaussiansplatting_tpu.ops import projection as proj


@dataclasses.dataclass(frozen=True)
class RasterizeSettings:
    """Static rasterizer configuration (hashable; safe as a jit static arg)."""

    block_x: int = 32
    block_y: int = 32
    capacity: int = 1 << 18        # global instance buffer (CUDA: dynamic)
    max_per_tile: int = 1024       # per-tile blend cap
    chunk: int = 128               # instances blended per scan step
    backend: str = "seq"           # "seq" (32x32 sequential-instance
                                   # production kernels, ops/blend_seq.py;
                                   # requires block_x=block_y=32, chunk=128 —
                                   # other shapes fall back to "pallas") |
                                   # "pallas" (16x16 lane-layout kernels,
                                   # the first-generation cross-check path) |
                                   # "xla" (scan oracle)
    scale_modifier: float = 1.0
    fast_sort: bool = False        # packed [tile|depth] key (see binning)
    tight_culling: bool = False    # opacity-adaptive per-axis rects (see
                                   # ops/preprocess.py; image/grad-exact, only
                                   # n_contrib + demand monitors shrink)
    track_contrib: bool = True     # False => skip per-pixel n_contrib
                                   # bookkeeping in the Pallas forward kernel
                                   # (inference fast path; n_contrib output is
                                   # zeros, gradients stay exact)
    packed_capacity: int | None = None  # aligned output buffer size; the
                                   # sort domain pads to pow2 internally, so
                                   # sizing this to true aligned demand cuts
                                   # the gather/kernel/scatter stages (see
                                   # ops/binning.py). None => capacity.
    precise_cull: bool = True      # per-instance diagonal-SAT coverage cull
                                   # (image/grad-exact: drops only instances
                                   # whose every pixel alpha < 1/255; see
                                   # ops/binning.py). Shrinks pack/kernel/
                                   # grad-reduce work ~proportionally to the
                                   # corner-tile waste of rect binning.
    expand: str = "scatter"        # instance expansion: "scatter"
                                   # (run-length diff-scatter; O(N) serial
                                   # scatter cost — right below ~1M
                                   # gaussians) | "dense" (every gaussian
                                   # owns dense_cap static slots, no
                                   # scatter; the garden-regime choice —
                                   # see ops/binning.py) | "auto" (dense
                                   # when the padded gaussian count is
                                   # >= 2^20, scatter below — resolved per
                                   # jit shape in ``rasterize``)
    dense_cap: int = 16            # per-gaussian slot cap in dense mode
    grad_reduce: str = "auto"      # backward per-Gaussian reduction:
                                   # "sort" (expansion-order cumsum-diff),
                                   # "scatter" (XLA scatter-add), or "auto"
                                   # (sort when no instances dropped; see
                                   # blend_pallas.pack_gather).
                                   # Numerics: "scatter" sums each Gaussian's
                                   # per-instance gradients sequentially and
                                   # deterministically; "sort" takes them as
                                   # differences of a blocked global cumsum,
                                   # whose cancellation error is ABSOLUTE in
                                   # the running-prefix magnitude (~1e-5 rel
                                   # in practice, but a tiny-gradient Gaussian
                                   # sitting after large-magnitude instances
                                   # can see large RELATIVE error). "sort" is
                                   # only valid when dropped == 0 (run
                                   # boundaries assume the full expansion
                                   # set); "auto" enforces that guard.

    @property
    def tiles(self):
        raise AttributeError("tile counts depend on the camera; use tiles_for")

    def tiles_for(self, width: int, height: int):
        return (
            (width + self.block_x - 1) // self.block_x,
            (height + self.block_y - 1) // self.block_y,
        )


def make_settings(backend: str = "seq", **kw) -> "RasterizeSettings":
    """Backend-appropriate settings: the seq path fixes its tile/chunk shape
    (32x32 tiles, 128-wide chunks); pallas uses 16x16 tiles with 128-wide
    chunks; the XLA oracle scans 32 instances at a time."""
    if backend == "seq":
        kw.setdefault("block_x", 32)
        kw.setdefault("block_y", 32)
        kw.setdefault("chunk", 128)
    else:
        kw.setdefault("block_x", 16)
        kw.setdefault("block_y", 16)
        kw.setdefault("chunk", 128 if backend == "pallas" else 32)
    return RasterizeSettings(backend=backend, **kw)


class RenderOutput(NamedTuple):
    color: jnp.ndarray        # (3, H, W) composited image (reference layout)
    final_t: jnp.ndarray      # (H, W)
    n_contrib: jnp.ndarray    # (H, W) int32
    radii: jnp.ndarray        # (N,) int32 (0 => culled); visibility = radii > 0
    num_rendered: jnp.ndarray # () int32 true instance count (overflow monitor)
    max_per_tile: jnp.ndarray # () int32 max true per-tile load (cap monitor)
    aligned_demand: jnp.ndarray  # () int32 packed-buffer demand (sizes
                                 # settings.packed_capacity)
    dropped: jnp.ndarray      # () int32 instances lost to caps/truncation;
                              # 0 => backward takes the fast sort-reduce path
                              # (the drop-tolerant sort variant otherwise)
    culled: jnp.ndarray       # () int32 instances removed exactly by the
                              # precise coverage cull (zero contribution)


def mark_visible(means3d: jnp.ndarray, cam: pp.CameraParams) -> jnp.ndarray:
    """Frustum visibility check (reference ``markVisible``,
    diff_gaussian_rasterization/__init__.py:171-186 ->
    rasterizer_impl.cu:141-162: view-space z > 0.2)."""
    p_view = proj.transform_points_4x3(means3d, cam.view)
    return p_view[..., 2] > 0.2


def rasterize(
    means3d: jnp.ndarray,
    scales: jnp.ndarray,
    rotations: jnp.ndarray,
    opacities: jnp.ndarray,
    shs: jnp.ndarray,
    sh_degree: int,
    cam: pp.CameraParams,
    bg: jnp.ndarray,
    settings: RasterizeSettings = RasterizeSettings(),
    means2d_offset: jnp.ndarray | None = None,
    cov3d_precomp: jnp.ndarray | None = None,
    colors_precomp: jnp.ndarray | None = None,
) -> RenderOutput:
    """Differentiable render of N Gaussians for one camera.

    ``opacities`` is (N,) activated; ``scales`` (N, 3) activated; ``shs``
    (N, K, 3); ``bg`` (3,). See module docstring for ``means2d_offset``.
    """
    tiles_x, tiles_y = settings.tiles_for(cam.width, cam.height)

    pre = pp.preprocess_gaussians(
        means3d, scales, rotations, opacities, shs, sh_degree, cam,
        settings.block_x, settings.block_y, settings.scale_modifier,
        cov3d_precomp=cov3d_precomp, colors_precomp=colors_precomp,
        tight=settings.tight_culling,
    )
    if means2d_offset is not None:
        # NDC-scale offset => pixel shift of offset * size / 2 (see docstring).
        shift = means2d_offset * jnp.array(
            [cam.width * 0.5, cam.height * 0.5], jnp.float32
        )
        pre = pre._replace(means2d=pre.means2d + shift)

    expand = settings.expand
    if expand == "auto":
        # Round-5 re-measurement: the run-length expansion now costs one
        # SINGLE-column scatter + cumsum + row gather (ops/binning.
        # _expand_rows) instead of the historical multi-column diff-scatter
        # whose O(N) serialization motivated dense mode. At 5M/1080p the
        # scatter expansion's smaller sort domain (true capacity vs
        # n*dense_cap) wins outright: fwd 324 ms vs 420 ms dense
        # (tools/bench_garden.py --seqscatter) — and it never drops
        # instances at a dense_cap. Dense remains an explicit opt-in.
        expand = "scatter"
    inst = binning.bin_gaussians(
        pre, tiles_x, tiles_y, settings.capacity, settings.max_per_tile,
        settings.chunk, pack_keys=settings.fast_sort,
        packed_capacity=settings.packed_capacity,
        precise_cull=settings.precise_cull,
        block_x=settings.block_x, block_y=settings.block_y,
        width=cam.width, height=cam.height,
        expand=expand, dense_cap=settings.dense_cap)

    # Effective backend: "seq" has a fixed kernel layout (full-vreg 32x32
    # pixel blocks, 128-lane DMA chunks). Settings carrying other shapes
    # (tests and tools pick small blocks/chunks deliberately) fall back to
    # the shape-generic pallas kernels rather than asserting — so "seq" can
    # be the default without constraining every construction site.
    backend = settings.backend
    if backend == "seq" and (settings.block_x != 32 or settings.block_y != 32
                             or settings.chunk != 128):
        backend = "pallas"

    if backend == "pallas":
        from neuralgaussiansplatting_tpu.ops import blend_pallas
        res = blend_pallas.blend_tiles(
            inst, pre.means2d, pre.conic, pre.opacity, pre.rgb,
            tiles_x, tiles_y, settings.block_x, settings.block_y,
            settings.max_per_tile, settings.chunk,
            track_contrib=settings.track_contrib,
            grad_reduce=settings.grad_reduce,
        )
    elif backend == "seq":
        from neuralgaussiansplatting_tpu.ops import blend_seq
        res = blend_seq.blend_tiles_seq(
            inst, pre.means2d, pre.conic, pre.opacity, pre.rgb,
            tiles_x, tiles_y, settings.block_x, settings.block_y,
            settings.max_per_tile, settings.chunk,
            track_contrib=settings.track_contrib,
            grad_reduce=settings.grad_reduce,
        )
    else:
        res = blend_xla.blend_tiles(
            inst, pre.means2d, pre.conic, pre.opacity, pre.rgb,
            tiles_x, tiles_y, settings.block_x, settings.block_y,
            settings.max_per_tile, settings.chunk,
        )

    color = res.color + res.final_t[..., None] * bg[None, None, :]
    img = blend_xla.assemble_image(
        color, tiles_x, tiles_y, settings.block_x, settings.block_y,
        cam.width, cam.height,
    )
    final_t = blend_xla.assemble_image(
        res.final_t, tiles_x, tiles_y, settings.block_x, settings.block_y,
        cam.width, cam.height,
    )
    n_contrib = blend_xla.assemble_image(
        res.n_contrib, tiles_x, tiles_y, settings.block_x, settings.block_y,
        cam.width, cam.height,
    )
    return RenderOutput(
        color=jnp.transpose(img, (2, 0, 1)),
        final_t=final_t,
        n_contrib=n_contrib,
        radii=pre.radii,
        num_rendered=inst.num_rendered,
        max_per_tile=inst.max_tile_load,
        aligned_demand=inst.aligned_demand,
        dropped=inst.dropped,
        culled=inst.culled,
    )
