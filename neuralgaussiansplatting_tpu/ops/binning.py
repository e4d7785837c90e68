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
    """Depth-sorted, tile-partitioned Gaussian instances (static capacity K)."""

    gid: jnp.ndarray          # (K,) int32 gaussian index per instance
    tile: jnp.ndarray         # (K,) int32 tile id (== num_tiles for padding)
    valid: jnp.ndarray        # (K,) bool
    tile_start: jnp.ndarray   # (T,) int32 start offset per tile
    tile_count: jnp.ndarray   # (T,) int32 instance count per tile
    num_rendered: jnp.ndarray # () int32 true instance count (may exceed K)


def bin_gaussians(pre: Preprocessed, tiles_x: int, tiles_y: int,
                  capacity: int) -> Instances:
    """Expand Gaussians into depth-sorted per-tile instances.

    Each Gaussian occupies ``tiles_touched`` consecutive slots in an implicit
    concatenated list; slot -> Gaussian resolution is a vectorized
    ``searchsorted`` over the inclusive prefix sum (the inverse of the CUDA
    ``duplicateWithKeys`` scatter, chosen because it is gather-shaped and
    therefore race-free and XLA-friendly).
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
    tile_start = jnp.searchsorted(sorted_tile, tile_ids, side="left").astype(jnp.int32)
    tile_end = jnp.searchsorted(sorted_tile, tile_ids, side="right").astype(jnp.int32)

    return Instances(
        gid=sorted_gid,
        tile=sorted_tile,
        valid=sorted_tile < num_tiles,
        tile_start=tile_start,
        tile_count=tile_end - tile_start,
        num_rendered=num_rendered,
    )
