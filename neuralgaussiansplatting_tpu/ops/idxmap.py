"""Per-pixel hard z-buffer ("idxmap") + feature map for the neural pipeline.

TPU-native re-design of the fork's ``rasterizer2`` CUDA extension:
- preprocess (raster.cu:10-98): project each Gaussian to a point, pixel
  footprint = square of radius S/z with S=3.0; cull if view z <= 0.2 or the
  center pixel is off screen.
- duplicateIdxDepthImg + 63-bit [x|y|depth] radix sort + identifyPixelRanges
  (rasterizer_impl.cu:578-727): here the same searchsorted expansion as tile
  binning but at *pixel* granularity, followed by a (pixel, depth) two-key
  sort; the winner of pixel p is the first instance of its run.
- GETMAP (rasterizer_impl.cu:731-817): featuremap[0]=depth, [1..24] =
  sin/cos positional encoding of the normalized view direction (4 freqs x 3
  dims, dim-major), [25..63] = the winner's feature_vector[25..63]; colmap =
  raw view dir; depthmap = depth; idxmap = winner id (-1 for misses).
- backward: the reference's ``CopyFeature`` scatters dL/dfeaturemap[25..63]
  with a *non-atomic* += — a data race when one Gaussian wins several pixels
  (rasterizer_impl.cu:844-846). Here the feature map is built by a JAX
  gather, whose transpose is a deterministic scatter-add — the race is fixed
  by construction. Geometry gradients are intentionally zero exactly like the
  reference (rasterizer2/__init__.py:109-137 returns zeros for
  means3D/normal/means2D/sh/scales/rotations): positions enter through
  ``stop_gradient``.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp

from neuralgaussiansplatting_tpu.ops import projection as proj
from neuralgaussiansplatting_tpu.ops.preprocess import CameraParams

NUM_FEATURES = 64          # rasterizer2 config.h:3
NUM_FREQUENCIES = 4        # rasterizer2 auxiliary.h:33
PE_DIMS = 24               # rasterizer2 auxiliary.h:34
POINT_SIZE = 3.0           # raster.cu:82 (S)


class IdxMaps(NamedTuple):
    idxmap: jnp.ndarray      # (H, W) int32, -1 = miss
    colmap: jnp.ndarray      # (H, W, 3) raw view directions
    depthmap: jnp.ndarray    # (H, W)
    featuremap: jnp.ndarray  # (H, W, 64)
    num_inst: jnp.ndarray    # () int32 true pixel-instance demand; if this
                             # exceeds the static ``capacity`` the deepest
                             # instances were silently truncated — monitor it
                             # and re-bucket capacity (the CUDA reference
                             # reallocates per frame, rasterize_points.cu)


def positional_encoding_3d(dirs: jnp.ndarray) -> jnp.ndarray:
    """(..., 3) -> (..., 24): sin/cos of 2^f * pi * x, dim-major ordering
    [dim][freq][sin, cos] (rasterizer_impl.cu:26-42)."""
    freqs = (2.0 ** jnp.arange(NUM_FREQUENCIES)) * math.pi   # (4,)
    scaled = dirs[..., :, None] * freqs                      # (..., 3, 4)
    enc = jnp.stack([jnp.sin(scaled), jnp.cos(scaled)], axis=-1)  # (...,3,4,2)
    return enc.reshape(dirs.shape[:-1] + (PE_DIMS,))


def compute_idxmap(
    means3d: jnp.ndarray,
    cam: CameraParams,
    capacity: int,
    alive: jnp.ndarray | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Closest-Gaussian index per pixel.

    Returns (idx (H*W,) int32 with -1 misses, depth (N,) view-space z,
    num_inst () int32 true demand). When ``num_inst > capacity`` the
    expansion buffer truncates (instances of high-index Gaussians drop, which
    can corrupt z-buffer winners) — callers must monitor the returned demand
    and grow ``capacity``. Geometry is non-differentiable here by reference
    semantics. ``alive`` masks out capacity-padding slots (they sit at the
    origin and would win z-buffer pixels).
    """
    means3d = jax.lax.stop_gradient(means3d)
    n = means3d.shape[0]
    w, h = cam.width, cam.height

    p_view = proj.transform_points_4x3(means3d, cam.view)
    depth = p_view[..., 2]
    ndc = proj.project_points(means3d, cam.full_proj)
    fx = proj.ndc2pix(ndc[..., 0], w)
    fy = proj.ndc2pix(ndc[..., 1], h)
    cx = fx.astype(jnp.int32)   # trunc like the CUDA int cast (coords >= 0
    cy = fy.astype(jnp.int32)   # when on screen, where it matters)
    radius = POINT_SIZE / depth

    # footprint rect in pixels (raster.cu:51-52)
    x0 = jnp.maximum(0.0, fx - radius).astype(jnp.int32)
    y0 = jnp.maximum(0.0, fy - radius).astype(jnp.int32)
    x1 = jnp.minimum(float(w), fx + radius + 1.0).astype(jnp.int32)
    y1 = jnp.minimum(float(h), fy + radius + 1.0).astype(jnp.int32)

    valid = (depth > 0.2) & (cx >= 0) & (cx < w) & (cy >= 0) & (cy < h)
    if alive is not None:
        valid = valid & alive
    touched = jnp.where(valid, (x1 - x0) * (y1 - y0), 0)

    offsets = jnp.cumsum(touched)
    num_inst = offsets[-1]
    starts = offsets - touched

    # run-length expansion (see ops/binning.py:_expand_runs — a searchsorted
    # here costs ~17 full-capacity gathers)
    from neuralgaussiansplatting_tpu.ops.binning import _expand_runs
    depth_bits = jax.lax.bitcast_convert_type(
        depth.astype(jnp.float32), jnp.int32)
    # x0/y0 pack into one column (expansion traffic is per-column; pixel
    # coords fit 12 bits each up to 4K frames)
    assert w <= 4096 and h <= 4096
    fields = jnp.stack([
        jnp.arange(n, dtype=jnp.int32), starts, x0 * 4096 + y0,
        jnp.maximum(x1 - x0, 1), depth_bits,
    ], axis=1).astype(jnp.int32)
    ex = _expand_runs(fields, starts, capacity)

    slots = jnp.arange(capacity, dtype=jnp.int32)
    in_range = slots < num_inst
    local = slots - ex[:, 1]
    rw = jnp.maximum(ex[:, 3], 1)
    px = jax.lax.shift_right_logical(ex[:, 2], 12) + local % rw
    py = (ex[:, 2] & 4095) + local // rw
    pixel = jnp.where(in_range, py * w + px, w * h).astype(jnp.int32)
    dkey = jnp.where(in_range, ex[:, 4], jnp.iinfo(jnp.int32).max)
    gid_slot = jnp.where(in_range, ex[:, 0], n)

    sorted_pix, _, sorted_gid = jax.lax.sort((pixel, dkey, gid_slot),
                                             num_keys=2)

    # winner of pixel p = the first instance of its run: scatter run heads
    # (unique destinations) instead of a searchsorted over W*H queries
    prev = jnp.concatenate(
        [jnp.full((1,), -1, jnp.int32), sorted_pix[:-1]])
    is_head = (sorted_pix != prev) & (sorted_pix < w * h)
    dest = jnp.where(is_head, sorted_pix, w * h)
    idx = jnp.full(w * h, -1, jnp.int32).at[dest].set(
        sorted_gid, mode="drop", unique_indices=True)
    return idx, depth, num_inst


def render_idxmaps(
    means3d: jnp.ndarray,
    features: jnp.ndarray,
    cam: CameraParams,
    capacity: int = 1 << 21,
    alive: jnp.ndarray | None = None,
    backend: str = "tiled",
) -> IdxMaps:
    """Full GETMAP-equivalent: z-buffer winner + 64-d feature map.

    ``features`` (N, 64); only dims 25..63 reach the output (0..24 are depth
    + view-dir PE, replicating GETMAP's overwrite of the first 25 dims).
    Gradients flow to ``features`` alone.

    ``backend``: "tiled" (production — the 32×32-tile binning + Pallas
    argmin kernel in ops/zbuffer_pallas.py; ``capacity`` counts TILE
    instances, ~25x fewer than pixel instances) or "xla" (the direct port
    of the reference's per-pixel sort design — the correctness oracle;
    ``capacity`` counts PIXEL instances).
    """
    w, h = cam.width, cam.height
    if backend == "tiled":
        from neuralgaussiansplatting_tpu.ops.zbuffer_pallas import (
            compute_idxmap_tiled)
        idx, depth, num_inst = compute_idxmap_tiled(
            means3d, cam, capacity, alive)
    else:
        idx, depth, num_inst = compute_idxmap(means3d, cam, capacity, alive)
    hit = idx >= 0
    safe = jnp.clip(idx, 0, means3d.shape[0] - 1)

    # ONE per-pixel row gather of everything the winner contributes
    # [pos(3), depth(1), feature_tail(39)]: TPU row gathers pay a serial
    # per-row cost, so six separate gathers (pos, depth, features, ...)
    # cost ~6x one packed gather. (Also: the combined features[safe, 25:]
    # advanced-index lowers to a catastrophically slow XLA gather on TPU
    # (~230x) — slice first, then gather.)
    # Negative result (round 5): replacing this gather's autodiff
    # transpose with a sort-based per-winner segment reduction (2-op sort
    # + row gather + blocked cumsum + histogram boundaries) measured
    # 155.9 ms/step vs 139.2 ms for XLA's own scatter-add transpose — the
    # multi-column-scatter serialization model (~45 ns/row) does NOT apply
    # to this f32 row pattern; don't re-add it.
    table = jnp.concatenate([
        jax.lax.stop_gradient(means3d),
        jax.lax.stop_gradient(depth)[:, None],
        features[:, PE_DIMS + 1:],
    ], axis=1)                                             # (N, 43)
    row = table[safe]                                      # (P, 43)
    pos = row[:, :3]
    d = row[:, 3]
    feat_tail = row[:, 4:]                                 # (P, 39) — grads!

    dirs = pos - cam.campos[None, :]
    dirs = dirs / jnp.sqrt(jnp.maximum(
        jnp.sum(dirs * dirs, axis=-1, keepdims=True), 1e-16))
    pe = positional_encoding_3d(dirs)                      # (P, 24)

    fmap = jnp.concatenate([d[:, None], pe, feat_tail], axis=1)
    fmap = jnp.where(hit[:, None], fmap, 0.0)

    colmap = jnp.where(hit[:, None], dirs, 0.0)
    return IdxMaps(
        idxmap=idx.reshape(h, w),
        colmap=colmap.reshape(h, w, 3),
        depthmap=jnp.where(hit, d, 0.0).reshape(h, w),
        featuremap=fmap.reshape(h, w, NUM_FEATURES),
        num_inst=num_inst,
    )
