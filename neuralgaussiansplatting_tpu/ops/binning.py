"""Tile binning: per-Gaussian tile duplication, depth sort, per-tile ranges.

TPU-native replacement for the reference's CUB pipeline
(diff-gaussian-rasterization/cuda_rasterizer/rasterizer_impl.cu:70-139,
274-338): ``InclusiveSum`` -> ``jnp.cumsum``; ``duplicateWithKeys`` -> a
vectorized searchsorted expansion over a *static-capacity* instance buffer
(XLA needs static shapes; the CUDA code instead reallocates per frame,
rasterize_points.cu:18-24); ``RadixSort`` over [tile|depth] keys ->
``jax.lax.sort`` with two key operands; ``identifyTileRanges`` ->
``searchsorted`` of each tile id into the sorted tile column.

Overflow policy: if the true number of instances exceeds ``capacity``, the
surplus (instances of the highest-index Gaussians) is dropped and
``num_rendered`` still reports the true count so callers can monitor and
re-bucket capacity. This replaces dynamic reallocation under jit.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from neuralgaussiansplatting_tpu.ops.preprocess import Preprocessed


class Instances(NamedTuple):
    """Depth-sorted, tile-partitioned Gaussian instances (static capacity K).

    The layout is *chunk-aligned*: each tile's segment begins at a multiple of
    the blend chunk size, so per-chunk reads/writes of [start + c*CH, CH) in
    the Pallas kernels never cross tile boundaries (race-free per-instance
    gradient emission, megacore-safe). Slots between ``tile_count`` and the
    segment end are padding with ``gid == N`` (callers clamp + mask).
    """

    gid: jnp.ndarray          # (K,) int32 gaussian index (== N for padding)
    valid: jnp.ndarray        # (K,) bool
    tile_start: jnp.ndarray   # (T,) int32 aligned start offset per tile
    tile_count: jnp.ndarray   # (T,) int32 effective instance count per tile
    num_rendered: jnp.ndarray # () int32 true demand (may exceed K)
    max_tile_load: jnp.ndarray  # () int32 max true per-tile demand


def bin_gaussians(pre: Preprocessed, tiles_x: int, tiles_y: int,
                  capacity: int, max_per_tile: int, align: int) -> Instances:
    """Expand Gaussians into depth-sorted, chunk-aligned per-tile instances.

    Each Gaussian occupies ``tiles_touched`` consecutive slots in an implicit
    concatenated list; slot -> Gaussian resolution is a vectorized
    ``searchsorted`` over the inclusive prefix sum (the inverse of the CUDA
    ``duplicateWithKeys`` scatter, chosen because it is gather-shaped and
    therefore race-free and XLA-friendly). After the (tile, depth) sort the
    list is re-packed into the aligned layout with a second searchsorted pass.

    Overflow policy (two static caps, both monitored via the returned true
    counts): per-tile loads cap at ``max_per_tile`` (deepest instances drop);
    tiles whose aligned segment would overrun ``capacity`` drop entirely.
    """
    n = pre.tiles_touched.shape[0]
    num_tiles = tiles_x * tiles_y

    tiles_touched = pre.tiles_touched
    offsets = jnp.cumsum(tiles_touched)          # inclusive prefix sum
    num_rendered = offsets[-1]
    starts = offsets - tiles_touched             # exclusive prefix sum

    slots = jnp.arange(capacity, dtype=jnp.int32)
    gid = jnp.searchsorted(offsets, slots, side="right").astype(jnp.int32)
    in_range = slots < num_rendered
    gid_c = jnp.clip(gid, 0, n - 1)

    local = slots - starts[gid_c]
    rect_min = pre.rect_min[gid_c]
    rect_w = jnp.maximum(pre.rect_max[gid_c, 0] - rect_min[..., 0], 1)
    tx = rect_min[..., 0] + local % rect_w
    ty = rect_min[..., 1] + local // rect_w
    tile = ty * tiles_x + tx

    # Padding slots get tile id == num_tiles so they sort to the very end
    # (the CUDA path uses an "invalid" high key the same way).
    tile = jnp.where(in_range, tile, num_tiles).astype(jnp.int32)
    depth = jnp.where(in_range, pre.depths[gid_c], jnp.inf).astype(jnp.float32)

    # Lexicographic (tile, depth) sort == the CUDA 64-bit [tile|depth-bits]
    # radix sort for positive float depths.
    sorted_tile, _, sorted_gid = jax.lax.sort(
        (tile, depth, gid_c), num_keys=2
    )

    tile_ids = jnp.arange(num_tiles, dtype=jnp.int32)
    raw_start = jnp.searchsorted(sorted_tile, tile_ids, side="left").astype(jnp.int32)
    raw_end = jnp.searchsorted(sorted_tile, tile_ids, side="right").astype(jnp.int32)
    raw_count = raw_end - raw_start

    # --- aligned re-pack ---------------------------------------------------
    count_eff = jnp.minimum(raw_count, max_per_tile)
    seg = ((count_eff + align - 1) // align) * align
    seg_end = jnp.cumsum(seg)
    aligned_start = seg_end - seg
    drop = seg_end > capacity          # conservative whole-tile drop
    count_eff = jnp.where(drop, 0, count_eff)
    seg = jnp.where(drop, 0, seg)
    seg_end = jnp.cumsum(seg)
    aligned_start = seg_end - seg

    t_of = jnp.searchsorted(seg_end, slots, side="right").astype(jnp.int32)
    t_c = jnp.clip(t_of, 0, num_tiles - 1)
    loc = slots - aligned_start[t_c]
    valid = (t_of < num_tiles) & (loc < count_eff[t_c])
    src = jnp.clip(raw_start[t_c] + loc, 0, capacity - 1)
    gid_aligned = jnp.where(valid, sorted_gid[src], n).astype(jnp.int32)

    return Instances(
        gid=gid_aligned,
        valid=valid,
        tile_start=aligned_start,
        tile_count=count_eff,
        num_rendered=num_rendered,
        max_tile_load=jnp.max(raw_count),
    )
