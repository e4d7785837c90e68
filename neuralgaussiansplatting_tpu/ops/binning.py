"""Tile binning: per-Gaussian tile duplication, depth sort, per-tile ranges.

TPU-native replacement for the reference's CUB pipeline
(diff-gaussian-rasterization/cuda_rasterizer/rasterizer_impl.cu:70-139,
274-338): ``InclusiveSum`` -> ``jnp.cumsum``; ``duplicateWithKeys`` -> a
*run-length expansion* over a static-capacity instance buffer;
``RadixSort`` over [tile|depth] keys -> ``jax.lax.sort`` with two key
operands; ``identifyTileRanges`` -> ``searchsorted`` of each tile id into the
sorted tile column (T queries only).

Run-length expansion trick (the perf-critical piece): per-slot values that
are constant over each Gaussian's run of slots are materialized by
scatter-adding *successive differences* at run starts and taking a wrapping
int32 cumulative sum — the telescoping sum reconstructs every field exactly
(including bit-cast floats), with one small scatter + one cumsum instead of a
binary search whose every probe is a full-capacity gather (a searchsorted
over 2M slots costs ~17 full gathers ≈ 300ms on v5e; this path is ~5ms).

The output layout is *chunk-aligned*: each tile's segment begins at a
multiple of the blend chunk size, so per-chunk reads/writes of
[start + c*CH, CH) in the Pallas kernels never cross tile boundaries
(race-free per-instance gradient emission, megacore-safe).

Overflow policy (two static caps, both monitored via returned true counts):
per-tile loads cap at ``max_per_tile`` (deepest instances drop); tiles whose
aligned segment would overrun ``capacity`` drop entirely.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from neuralgaussiansplatting_tpu.ops.preprocess import Preprocessed


class Instances(NamedTuple):
    """Depth-sorted, tile-partitioned Gaussian instances (static capacity K).

    Slots between ``tile_count`` and the segment end are padding with
    ``gid == N`` (callers clamp + mask via ``valid``).
    """

    gid: jnp.ndarray          # (K,) int32 gaussian index (== N for padding)
    valid: jnp.ndarray        # (K,) bool
    tile_start: jnp.ndarray   # (T,) int32 aligned start offset per tile
    tile_count: jnp.ndarray   # (T,) int32 effective instance count per tile
    num_rendered: jnp.ndarray # () int32 true demand (may exceed K)
    max_tile_load: jnp.ndarray  # () int32 max true per-tile demand
    aligned_demand: jnp.ndarray  # () int32 aligned packed-buffer demand
                                 # (pre-drop; sizes packed_capacity)
    eid: jnp.ndarray          # (K,) int32 kept-rank slot per packed slot
                              # (== capacity for padding/invalid): the rank
                              # of the instance among all kept (non-culled)
                              # instances in expansion order — the backward
                              # grad reduction sorts on this
    gstart: jnp.ndarray       # (N,) int32 kept-run start per gaussian
    gcount: jnp.ndarray       # (N,) int32 kept-run length per gaussian
    dropped: jnp.ndarray      # () int32 kept instances lost to caps/drops/
                              # truncation; 0 => the packed set is the
                              # complete kept set (enables the fast
                              # sort-based backward reduction; the
                              # drop-tolerant variant covers dropped > 0)
    culled: jnp.ndarray       # () int32 instances dropped *exactly* by the
                              # precise per-instance coverage test (their
                              # contribution is identically zero)


def _blocked_cumsum(x: jnp.ndarray, block: int = 1024) -> jnp.ndarray:
    """Blocked inclusive cumsum along axis 0, two-level, dtype-generic.

    XLA lowers a flat (K, F) cumsum to ~log2(K) full-array shift passes; the
    two-level decomposition (in-block scan + tiny block-prefix scan) does
    ~log2(block) passes over the data plus negligible block math.

    Exactness depends on dtype: integer addition wraps associatively, so
    int32 results are bit-exact regardless of blocking (the run-length
    expansion relies on this). Float use reassociates the summation — the
    two-level order keeps roundoff near the sqrt(num_blocks) scale, but it
    is NOT bit-identical to a sequential cumsum (see blend_pallas
    ``_reduce_sorted`` for where that tradeoff is taken deliberately).
    """
    k = x.shape[0]
    nb = -(-k // block)
    pad = nb * block - k
    if pad:
        x = jnp.concatenate(
            [x, jnp.zeros((pad,) + x.shape[1:], x.dtype)], axis=0)
    xb = x.reshape((nb, block) + x.shape[1:])
    # In-block scan as explicit log-shift (Hillis-Steele) doubling: XLA
    # lowers lax.cumsum to a reduce-window on TPU (~0.65 ms for a 640k i32
    # scan, ~1.1 ms for a (512k, 9) f32 one); the pad-shift-add ladder
    # fuses into one cheap loop fusion (~0.04 ms for the same shapes).
    # Integer adds wrap associatively (bit-exact); float prefixes
    # reassociate into log-depth trees — a DIFFERENT (generally tighter)
    # error profile than the sequential scan, not a worse one.
    within = xb
    sh = 1
    while sh < block:
        shifted = jnp.pad(within[:, :-sh],
                          [(0, 0), (sh, 0)] + [(0, 0)] * (x.ndim - 1))
        within = within + shifted
        sh *= 2
    totals = within[:, -1]
    prefix = jnp.cumsum(totals, axis=0) - totals
    out = within + prefix[:, None]
    return out.reshape((nb * block,) + x.shape[1:])[:k]


def _gather_aligned_runs(values: jnp.ndarray, base: jnp.ndarray,
                         block: int) -> jnp.ndarray:
    """Blocked gather for piecewise-contiguous indices.

    out[i*block + m] = values[base[i] + m] for m in [0, block). Requires that
    each output block of ``block`` slots reads a *consecutive* run of source
    slots (true for the aligned repack: every tile segment starts at a
    multiple of the alignment, and block divides it).

    A generic XLA minor-axis gather pays a serial per-index cost (~7 ns/elem
    on v5e => 34 ms for a 4.6M int32 gather at 1080p); fetching whole
    ``block``-wide rows and aligning with a log2(block) barrel shift
    amortizes that to ~1 ms for the same volume (measured 31x).
    """
    b = block
    npad = (-values.shape[0]) % b + 2 * b
    v = jnp.concatenate(
        [values, jnp.zeros((npad,), values.dtype)]).reshape(-1, b)
    nrows = v.shape[0]
    base_c = jnp.clip(base, 0, (nrows - 2) * b)
    r = base_c // b
    o = base_c % b
    buf = jnp.concatenate([v[r], v[r + 1]], axis=1)       # (nb, 2b)
    sh = 1
    while sh < b:
        rolled = jnp.roll(buf, -sh, axis=1)
        buf = jnp.where((o & sh).astype(bool)[:, None], rolled, buf)
        sh *= 2
    return buf[:, :b].reshape(base.shape[0] * b)


def _expand_rows(fields: jnp.ndarray, starts: jnp.ndarray,
                 capacity: int) -> jnp.ndarray:
    """Per-run rows -> per-slot rows via owner-gid telescoping + row gather.

    The owner of slot s is the LARGEST g with starts[g] <= s: starts are
    non-decreasing, so any g' > g with starts[g'] <= s would need
    starts[g'] >= starts[g+1] = starts[g] + len[g] > s — impossible while g
    owns s. The owner index itself telescopes (scatter +1 at every run
    start past the first; wrapping cumsum — ties from zero-length runs
    absorb exactly), so one SINGLE-column scatter-add suffices — the only
    scatter shape XLA:TPU vectorizes (~0.7 ms at 100k rows vs ~4.5 ms for
    any multi-column scatter, which serializes at ~45 ns/row) — and every
    field column rides one 2-D ROW gather (~2.6 ns/row on the current
    toolchain). Replaces the historical all-columns diff-scatter.
    Slots past the last run repeat the final row (callers mask with their
    in-range predicate).

    Layout note: the gather runs on the TRANSPOSED (F, N) table and emits
    (F, K) — consumers read whole contiguous rows. A (K, F) row gather is
    equally fast but every per-column consumer then pays a ~0.5 ms strided
    relayout (measured: +3 ms across 6 columns at 640k).
    """
    n = fields.shape[1]
    ones = jnp.ones((n - 1,), jnp.int32)
    seed = jnp.zeros((capacity,), jnp.int32).at[starts[1:]].add(
        ones, mode="drop")
    gid = _blocked_cumsum(seed)
    # Barrier: ex has ~6 downstream consumers, and XLA freely DUPLICATES
    # gathers into each consumer fusion — materialize exactly once.
    return jax.lax.optimization_barrier(fields[:, gid]), gid


def _expand_runs(fields: jnp.ndarray, starts: jnp.ndarray,
                 capacity: int) -> jnp.ndarray:
    """Expand per-run constant rows to per-slot rows (see module docstring).

    fields: (R, F) int32 — value rows, one per run (run r owns slots
    [starts[r], starts[r+1])); starts: (R,) int32 non-decreasing. Rows of
    zero-length runs are absorbed exactly by telescoping. Slots after the
    last run keep the last row's values (callers mask).
    """
    diffs = jnp.concatenate([fields[:1], fields[1:] - fields[:-1]], axis=0)
    buf = jnp.zeros((capacity,) + fields.shape[1:], jnp.int32)
    buf = buf.at[starts].add(diffs, mode="drop")
    return _blocked_cumsum(buf)  # wrapping int32 => exact telescoping


def bin_gaussians(pre: Preprocessed, tiles_x: int, tiles_y: int,
                  capacity: int, max_per_tile: int, align: int,
                  pack_keys: bool = False,
                  packed_capacity: int | None = None,
                  precise_cull: bool = False,
                  block_x: int = 16, block_y: int = 16,
                  width: int | None = None,
                  height: int | None = None,
                  expand: str = "scatter",
                  dense_cap: int = 16) -> Instances:
    """Expand Gaussians into depth-sorted, chunk-aligned per-tile instances.

    ``pack_keys``: pack [tile | quantized-depth] into a single int32 sort key
    (2 sort operands instead of 3, ~35%% less sort traffic). Depth keeps its
    top (31 - ceil_log2(T+1)) bits — nearly-coincident splats may swap blend
    order vs the exact path (sub-1e-3 image differences); leave False for
    reference-exact ordering.

    ``packed_capacity``: size of the *output* (aligned, tile-packed) buffer.
    ``capacity`` sizes the expansion/sort domain, whose sort pads to the next
    power of two internally anyway; the packed buffer feeds the gather,
    blend kernels, and the gradient scatter, which all scale linearly with
    its true size — so a tighter (aligned-demand-sized) packed buffer is
    pure savings. Defaults to ``capacity`` (the historical single-buffer
    layout).

    ``expand``: "scatter" (run-length diff-scatter expansion over a
    ``capacity``-slot domain; cost O(N gaussians) from the serial TPU
    scatter) or "dense" (every Gaussian owns ``dense_cap`` static slots —
    no scatter at all; instances past the cap are dropped and counted.
    The right choice is workload-shaped: "dense" wins when runs are short
    relative to N — the garden regime's 5M gaussians average <2 tiles each
    and the scatter alone costs ~220 ms there — while "scatter" wins at
    800p-class scenes whose 100k gaussians average ~11 tiles). In dense
    mode the expansion/sort domain is N * dense_cap and ``capacity`` is
    ignored.

    ``precise_cull``: per-INSTANCE exact-coverage culling. The rect-based
    duplication (reference ``duplicateWithKeys``) emits every tile of the
    ellipse's bounding box, but corner tiles often lie wholly outside the
    alpha >= 1/255 level-set ellipse — the blend kernel would zero every
    pixel of those instances anyway (forward.cu:341-352 semantics). A
    separating-axis test along the two diagonals (+-45 deg; the axis-aligned
    directions are already exact via the tight per-axis rects) drops such
    instances *image- and gradient-exactly*: support radius along direction
    u is sqrt(2 ln(255 op) u^T Sigma u), and the per-Gaussian support
    intervals ride the expansion as two quantized int32 columns (16-bit lo/hi
    with outward, conservative rounding — only keeps extra, never culls a
    contributor). Culled instances shrink every downstream stage (sort ranks,
    pack gather, both blend kernels, gradient reduction). ``eid`` is then
    relabeled to the *kept-rank* domain so the expansion-order gradient
    reduction keeps working, and ``gstart``/``gcount`` are returned over the
    same kept domain. Requires ``block_x/block_y`` (tile pixel pitch) and the
    image ``width``/``height`` for the tile pixel rects.
    """
    n = pre.tiles_touched.shape[0]
    num_tiles = tiles_x * tiles_y
    if width is None:
        width = tiles_x * block_x
    if height is None:
        height = tiles_y * block_y

    tiles_touched = pre.tiles_touched
    offsets = jnp.cumsum(tiles_touched)          # inclusive prefix sum
    num_rendered = offsets[-1]
    starts = offsets - tiles_touched             # exclusive prefix sum

    # --- expansion of per-Gaussian fields to instance slots -----------------
    assert tiles_x < 1024 and tiles_y < 1024  # rect fields clip to [0, tiles]
    rect_w = jnp.maximum(pre.rect_max[:, 0] - pre.rect_min[:, 0], 1)
    depth_bits = jax.lax.bitcast_convert_type(
        pre.depths.astype(jnp.float32), jnp.int32)  # positive => monotone

    if precise_cull:
        # Diagonal support intervals of the alpha >= 1/255 level-set ellipse
        # (see docstring). conic = [[A, B], [B, C]]; Sigma = conic^-1, so
        # u^T Sigma u = (A + C -+ 2B) / det for u = (1, +-1).
        ca, cb, cc = pre.conic[:, 0], pre.conic[:, 1], pre.conic[:, 2]
        det = ca * cc - cb * cb
        safe_det = jnp.where(det > 0, det, 1.0)
        lvl = jnp.log(jnp.maximum(pre.opacity, 1e-12) * 255.0)
        lvl = jnp.maximum(lvl, 0.0)   # opacity < 1/255 => zero support
        r1 = jnp.sqrt(jnp.maximum(
            2.0 * lvl * (ca + cc - 2.0 * cb) / safe_det, 0.0))
        r2 = jnp.sqrt(jnp.maximum(
            2.0 * lvl * (ca + cc + 2.0 * cb) / safe_det, 0.0))
        s1 = pre.means2d[:, 0] + pre.means2d[:, 1]
        s2 = pre.means2d[:, 0] - pre.means2d[:, 1]

    def cull_keep(tx, ty, lo1, hi1, lo2, hi2):
        # tile pixel-center rect, clipped to the image (phantom pixels of
        # edge tiles are cropped by assemble and carry zero cotangents)
        x0 = (tx * block_x).astype(jnp.float32)
        y0 = (ty * block_y).astype(jnp.float32)
        x1 = jnp.minimum(tx * block_x + (block_x - 1),
                         width - 1).astype(jnp.float32)
        y1 = jnp.minimum(ty * block_y + (block_y - 1),
                         height - 1).astype(jnp.float32)
        return ((lo1 <= x1 + y1) & (hi1 >= x0 + y0)
                & (lo2 <= x1 - y0) & (hi2 >= x0 - y1))

    if expand == "dense":
        # Dense capped expansion: every Gaussian owns ``dense_cap`` static
        # instance slots — pure broadcasts, no scatter. The run-length
        # scatter's cost is O(N gaussians) (~44 ns/row serial on TPU: 220 ms
        # at 5M gaussians); at garden scale runs average <2 tiles, so a
        # small cap covers essentially all demand, invalid slots sort to the
        # end, and instances beyond the cap are DROPPED (counted in
        # ``dropped``; the drop-tolerant backward reduction stays exact).
        m = dense_cap
        domain = n * m
        j = jax.lax.broadcasted_iota(jnp.int32, (n, m), 1)
        tt = tiles_touched[:, None]
        in_range2 = j < jnp.minimum(tt, m)
        rw2 = rect_w[:, None]
        tx2 = pre.rect_min[:, 0][:, None] + j % rw2
        ty2 = pre.rect_min[:, 1][:, None] + j // rw2
        clipped = jnp.sum(jnp.maximum(tiles_touched - m, 0))
        if precise_cull:
            keep2 = in_range2 & cull_keep(
                tx2, ty2, (s1 - r1)[:, None], (s1 + r1)[:, None],
                (s2 - r2)[:, None], (s2 + r2)[:, None])
            keep_i2 = keep2.astype(jnp.int32)
            gcount_eff = jnp.sum(keep_i2, axis=1)
            cg = jnp.cumsum(gcount_eff)
            kept_total = cg[-1]
            gstart_eff = cg - gcount_eff
            # kept rank = per-Gaussian base + within-row kept prefix
            eid_new2 = (gstart_eff[:, None]
                        + jnp.cumsum(keep_i2, axis=1) - keep_i2)
            keep = keep2.reshape(domain)
            eid_new = eid_new2.reshape(domain)
        else:
            keep = in_range2.reshape(domain)
            kept_count = jnp.minimum(tiles_touched, m)
            ck = jnp.cumsum(kept_count)
            kept_total = ck[-1]
            gstart_eff = ck - kept_count
            gcount_eff = kept_count
            eid_new = (gstart_eff[:, None] + j).reshape(domain)
        tx = tx2.reshape(domain)
        ty = ty2.reshape(domain)
        depth_col = jnp.broadcast_to(depth_bits[:, None], (n, m)).reshape(
            domain)
        gid_col = jnp.broadcast_to(
            jnp.arange(n, dtype=jnp.int32)[:, None], (n, m)).reshape(domain)
        trunc = clipped
    else:
        # Run-length expansion via jnp.repeat (lowered by XLA:TPU to an F=1
        # counting scatter + cumsum + a vectorized ROW gather). Measured on
        # the current toolchain: 1.65 ms for 100k rows x 6 cols -> 640k
        # slots, vs 4.5 ms for the historical diff-scatter + cumsum form
        # (multi-column scatter-adds serialize at ~45 ns/row; 2-D row
        # gathers run at ~2.6 ns/row). The three tile-rect fields still
        # pack into one int32 column (10 bits each) to keep rows narrow.
        domain = capacity
        packed_rect = (pre.rect_min[:, 0] * (1 << 20)
                       + pre.rect_min[:, 1] * (1 << 10) + rect_w)
        # no gid column: the owner index is the gather INDEX itself and
        # comes back 1-D from _expand_rows for free
        columns = [
            starts,                            # 0: run start
            packed_rect,                       # 1: [min_x | min_y | width]
            depth_bits,                        # 2: depth key
        ]

        # Absolute quantization grid (0.25 px), NOT frame-relative:
        # pixel-strip renders (parallel/render_sp.py) shift coordinates by
        # whole tile rows, and an absolute grid makes the quantized cull
        # decisions shift-exact so strip renders stay bit-identical to the
        # monolithic frame. Values outside +-8192 px clamp conservatively
        # (keep).
        span = 8192.0
        qscale = 0.25
        if precise_cull:
            def qpack(lo, hi):
                # conservative outward rounding; clamping to the range ends
                # only widens the interval (keeps), never culls a contributor
                lo_q = jnp.clip(jnp.floor((lo + span) / qscale), 0, 65535)
                hi_q = jnp.clip(jnp.ceil((hi + span) / qscale), 0, 65535)
                return (lo_q.astype(jnp.int32) * 65536    # wraps; unpack
                        + hi_q.astype(jnp.int32))         # is logical
            columns.append(qpack(s1 - r1, s1 + r1))  # 3: diag (1, 1)
            columns.append(qpack(s2 - r2, s2 + r2))  # 4: diag (1, -1)

        fields = jnp.stack(columns, axis=0).astype(jnp.int32)
        ex, gid_exp = _expand_rows(fields, starts, capacity)

        # Consumer math stays 2-D on (1, K) row slices of the gathered
        # (F, K) table: every slice-to-1-D conversion of a T(8,128)-tiled
        # row is a ~0.4 ms relayout pass at 640k (measured: the naive
        # per-column extraction cost more than the expansion itself), so
        # only the final sort operands are reshaped down.
        slots = jnp.arange(capacity, dtype=jnp.int32)
        iota2 = jax.lax.broadcasted_iota(jnp.int32, (1, capacity), 1)
        in_range2 = iota2 < num_rendered
        local2 = iota2 - ex[0:1]
        rw2 = jnp.maximum(ex[1:2] & 1023, 1)
        tx2 = jax.lax.shift_right_logical(ex[1:2], 20) + local2 % rw2
        ty2 = (jax.lax.shift_right_logical(ex[1:2], 10) & 1023) + local2 // rw2

        if precise_cull:
            def qunpack(col):
                lo = jax.lax.shift_right_logical(col, 16).astype(jnp.float32)
                hi = (col & 0xFFFF).astype(jnp.float32)
                return lo * qscale - span, hi * qscale - span

            lo1, hi1 = qunpack(ex[3:4])
            lo2, hi2 = qunpack(ex[4:5])  # noqa: columns 3/4 are the packed
                                         # diagonal support intervals
            keep2 = in_range2 & cull_keep(tx2, ty2, lo1, hi1, lo2, hi2)
            keep = keep2.reshape(capacity)
            # Relabel expansion slots to their kept rank: the gradient
            # reduction needs contiguous per-Gaussian runs over the *packed*
            # instance set; the per-Gaussian boundaries follow by reading
            # the kept-prefix at the raw run boundaries (runs stay
            # contiguous and ordered under culling).
            keep_i = keep.astype(jnp.int32)
            kept_incl = _blocked_cumsum(keep_i)
            eid_new = kept_incl - keep_i
            kept_total = kept_incl[capacity - 1]
            pfx = jnp.concatenate([jnp.zeros((1,), jnp.int32), kept_incl])
            # one 2-D single-column row gather for both boundary reads: a
            # 1-D gather pays ~6.7 ns/element serially, the row form ~2
            bounds = jnp.concatenate([jnp.minimum(starts, capacity),
                                      jnp.minimum(offsets, capacity)])
            pb = pfx[:, None][bounds][:, 0]
            gstart_eff = pb[:n]
            gcount_eff = pb[n:] - gstart_eff
        else:
            keep2 = in_range2
            keep = keep2.reshape(capacity)
            eid_new = slots
            kept_total = jnp.minimum(num_rendered, capacity)
            gstart_eff = jnp.minimum(starts, capacity)
            gcount_eff = jnp.minimum(offsets, capacity) - gstart_eff
        gid_col = gid_exp            # 1-D from the owner cumsum, no gather
        tile2 = jnp.where(keep2, ty2 * tiles_x + tx2,
                          num_tiles).astype(jnp.int32)
        # the depth key stays in its (1, K) row until key/dkey construction
        depth2 = ex[2:3]
        # instances lost to expansion truncation (num_rendered > capacity)
        trunc = jnp.maximum(num_rendered - capacity, 0)

    if expand == "dense":
        tile2 = jnp.where(keep, ty * tiles_x + tx,
                          num_tiles).astype(jnp.int32).reshape(1, domain)
        depth2 = depth_col.reshape(1, domain)
        keep2 = keep.reshape(1, domain)
    gid_slot = jnp.where(keep, gid_col, n)
    eid_slot = jnp.where(keep, eid_new, domain)

    # --- (tile, depth) lexicographic sort == CUDA [tile|depth] radix sort --
    # ``eid_slot`` rides along as an extra operand: the sorted kept-rank
    # feeds the backward gradient reduction (see grad_reduce in blend_pallas).
    # XLA prunes the unused operand in forward-only graphs.
    if pack_keys:
        tile_bits = max(int(num_tiles + 1).bit_length(), 1)
        depth_bits_kept = 31 - tile_bits
        dq = jax.lax.shift_right_logical(depth2, 31 - depth_bits_kept)
        key2 = tile2 * (1 << depth_bits_kept) + dq
        key2 = jnp.where(keep2, key2, jnp.iinfo(jnp.int32).max)
        key = key2.reshape(domain)
        sorted_key, sorted_gid, sorted_e = jax.lax.sort(
            (key, gid_slot, eid_slot), num_keys=1)
        sorted_tile = jnp.where(
            sorted_key == jnp.iinfo(jnp.int32).max, num_tiles,
            jax.lax.shift_right_logical(sorted_key, depth_bits_kept))
    else:
        dkey2 = jnp.where(keep2, depth2, jnp.iinfo(jnp.int32).max)
        sorted_tile, _, sorted_gid, sorted_e = jax.lax.sort(
            (tile2.reshape(domain), dkey2.reshape(domain), gid_slot,
             eid_slot), num_keys=2)

    tile_ids = jnp.arange(num_tiles, dtype=jnp.int32)
    raw_start = jnp.searchsorted(sorted_tile, tile_ids,
                                 side="left").astype(jnp.int32)
    raw_end = jnp.searchsorted(sorted_tile, tile_ids,
                               side="right").astype(jnp.int32)
    raw_count = raw_end - raw_start

    # --- aligned re-pack ---------------------------------------------------
    kcap = capacity if packed_capacity is None else packed_capacity
    count_eff = jnp.minimum(raw_count, max_per_tile)
    seg = ((count_eff + align - 1) // align) * align
    seg_end = jnp.cumsum(seg)
    aligned_start = seg_end - seg
    aligned_demand = seg_end[num_tiles - 1]
    drop = seg_end > kcap              # conservative whole-tile drop
    count_eff = jnp.where(drop, 0, count_eff)
    seg = jnp.where(drop, 0, seg)
    seg_end = jnp.cumsum(seg)
    aligned_start = seg_end - seg
    total = seg_end[num_tiles - 1]

    # Per-aligned-slot tile fields via the same run-length expansion, in
    # *difference form* (2 columns instead of {start, count, raw_start}):
    # src = kslot + (raw_start - aligned_start), and a slot is live while
    # src < raw_start + count_eff.
    kslots = jnp.arange(kcap, dtype=jnp.int32)
    tfields = jnp.stack(
        [raw_start - aligned_start, raw_start + count_eff], axis=1)
    ex2 = _expand_runs(tfields, aligned_start, kcap)
    src = kslots + ex2[:, 0]
    valid = (kslots < total) & (src < ex2[:, 1])
    block = 128
    while block > 1 and (align % block or kcap % block):
        block //= 2
    if block > 1:
        # each aligned block reads a consecutive sorted-domain run => use the
        # blocked gather (out-of-range bases are clamped; `valid` masks them)
        gathered = _gather_aligned_runs(sorted_gid, src[::block], block)
        gathered_e = _gather_aligned_runs(sorted_e, src[::block], block)
    else:
        gathered = sorted_gid[jnp.clip(src, 0, domain - 1)]
        gathered_e = sorted_e[jnp.clip(src, 0, domain - 1)]
    gid_aligned = jnp.where(valid, gathered, n).astype(jnp.int32)
    eid_aligned = jnp.where(valid, gathered_e, domain).astype(jnp.int32)

    # ``trunc`` = instances the expansion never materialized (scatter:
    # num_rendered > capacity; dense: per-Gaussian clipping at dense_cap);
    # plus cap/tile drops. Precise-culled instances are exact zeros, not
    # drops.
    return Instances(
        gid=gid_aligned,
        valid=valid,
        tile_start=aligned_start,
        tile_count=count_eff,
        num_rendered=num_rendered,
        max_tile_load=jnp.max(raw_count),
        aligned_demand=aligned_demand,
        eid=eid_aligned,
        gstart=gstart_eff,
        gcount=gcount_eff,
        dropped=kept_total + trunc - jnp.sum(count_eff),
        culled=num_rendered - trunc - kept_total,
    )
