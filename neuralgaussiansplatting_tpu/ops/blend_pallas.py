"""Pallas TPU tile-blend kernels (production path of the rasterizer).

TPU-native re-design of the reference ``renderCUDA`` forward/backward
(diff-gaussian-rasterization/cuda_rasterizer/forward.cu:262-374,
backward.cu:400-557):

- CUDA: one 16x16 thread block per tile, shared-memory batches of 256
  Gaussians, per-thread sequential blend with warp-voted early exit; backward
  re-walks back-to-front and atomicAdds per-Gaussian gradients.
- Here: one grid program per tile. Instance attributes live in HBM as a
  packed (16, K) array (attributes on sublanes, instances on lanes) in the
  chunk-aligned layout built by ops/binning.py; each program DMAs
  (16, CH=128) chunks into VMEM and evaluates the tile's PIX pixels as
  (PIX, CH) vector ops on the VPU — pixels on sublanes, instances on lanes,
  so chunk DMAs are lane-aligned and fully contiguous. The sequential
  front-to-back product becomes an in-chunk cumulative product along the lane
  axis (Hillis-Steele doubling via ``pltpu.roll`` + lane masking) with a
  carried per-pixel transmittance; the CUDA early exit becomes a `while` over
  chunks gated on "all pixels done". The backward walks chunks *forward*
  (suffix sums come from the saved output: S_i = C.g - prefix_i) and writes
  per-instance gradients to its tile's own aligned segment — race-free by
  construction, no atomics; the per-Gaussian reduction happens outside as the
  transpose of the instance gather (a deterministic XLA scatter-add).

Packed row layout (PROWS=16): 0:x 1:y 2:conic_A 3:conic_B 4:conic_C
5:opacity 6:r 7:g 8:b (9..15 zero padding to an 8-sublane multiple).

Output raw layout: (T, 8, PIX) — rows 0..2 color, 3 final transmittance,
4 n_contrib (float); the wrapper slices/reshapes.

Replicated reference quirk: the backward treats alpha as unclamped even when
the forward clamped it at 0.99 (backward.cu recomputes ``alpha`` but never
masks the 0.99 branch in d alpha/d op,G) — reproduced for gradient parity
with the CUDA implementation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from neuralgaussiansplatting_tpu.ops.binning import Instances, _blocked_cumsum
from neuralgaussiansplatting_tpu.ops.blend import (
    ALPHA_MAX, ALPHA_MIN, STOP_T, BlendResult,
)

PROWS = 16
CHUNK = 128  # lane width; binning alignment must equal this


# ---------------------------------------------------------------------------
# Instance-attribute gather with a sort-based gradient reduction
# ---------------------------------------------------------------------------

def _reduce_sorted(cot9, eid, gstart, gcount):
    """Per-Gaussian gradient reduction in expansion order (DESIGN.md 4.1).

    ``cot9`` (9, K) per-instance gradients in the packed (tile, depth) order;
    ``eid`` (K,) the expansion-domain slot of each packed instance. Each
    Gaussian's instances occupy the contiguous expansion run
    [gstart[g], gstart[g] + gcount[g]) — boundaries known from the binning
    prefix sum, no searchsorted. Valid ONLY when no instance was dropped:
    after any cap/tile drop the packed buffer is missing expansion slots, the
    run windows [gstart, gstart+gcount) no longer line up, and the returned
    gradients are silently WRONG — mode="sort" must not be forced when
    ``dropped > 0`` ("auto" guards this via lax.cond). When dropped == 0,
    sorting by eid yields exactly the expansion order and the per-run sums
    are differences of a blocked cumulative sum. Replaces the reference
    backward's atomicAdd per-Gaussian accumulation (backward.cu:523-554)
    without its atomics — and without XLA's serial scatter-add (measured
    22 ms -> ~15 ms at 800p scale, 80 -> ~50 ms at 1080p,
    tools/exp_expreduce.py).

    f32 note: the cumsum difference loses ~log2(prefix/segment) mantissa bits
    to cancellation; the blocked (two-level) cumsum keeps the error at the
    sqrt(num_blocks)-scale, ~1e-5 relative in practice — gated by
    tests/test_rasterize.py against the scatter path.
    """
    k = eid.shape[0]
    n = gstart.shape[0]
    ops = (eid,) + tuple(cot9[i] for i in range(9))
    s = jax.lax.sort(ops, num_keys=1)
    vals = jnp.stack(s[1:], axis=1)                     # (K, 9) expansion order
    cs = _blocked_cumsum(vals)                      # dtype-generic blocked scan
    csz = jnp.concatenate([jnp.zeros((1, 9), cot9.dtype), cs], axis=0)
    lo = jnp.clip(gstart, 0, k)
    hi = jnp.clip(gstart + gcount, 0, k)
    return (csz[hi] - csz[lo]).T                        # (9, N)


def _reduce_sorted_dropped(cot9, eid, gstart, gcount):
    """Drop-tolerant variant of ``_reduce_sorted``.

    When cap/tile drops removed instances from the packed buffer, the kept
    runs [gstart, gstart + gcount) no longer line up with the *present*
    instances — the correct boundaries are each Gaussian's boundary RANK
    among the present eids. Ranks are computed by a merge-style sort (no
    searchsorted: probing 2N boundaries into a K-array costs ~log2(K) full
    gathers): sort the present eids together with the 2N boundary probes,
    tagging probes to sort before equal-keyed data; a probe's rank among the
    data is then its big-sort position minus its rank among probes. One
    (K + 2N) 3-operand int sort + one (2N) 2-operand sort + two small
    scatters — measured well under the XLA scatter-add this replaces.

    Exact: the reduced sums range over exactly the present instances (same
    summands as the scatter path, reassociated by the blocked cumsum).
    """
    k = eid.shape[0]
    n = gstart.shape[0]
    probes = jnp.concatenate([gstart, gstart + gcount])       # (2N,)
    pid = jnp.arange(1, 2 * n + 1, dtype=jnp.int32)

    keys = jnp.concatenate([eid, probes])
    tag = jnp.concatenate([jnp.ones((k,), jnp.int32),
                           jnp.zeros((2 * n,), jnp.int32)])
    pay = jnp.concatenate([jnp.zeros((k,), jnp.int32), pid])
    _, _, spay = jax.lax.sort((keys, tag, pay), num_keys=3)
    pos = jnp.arange(k + 2 * n, dtype=jnp.int32)
    big_pos = jnp.zeros((2 * n + 1,), jnp.int32).at[spay].set(
        pos, mode="drop")[1:]                                 # (2N,)

    # rank of each probe among probes, with the same (key, pid) tie order
    _, ppay = jax.lax.sort((probes, pid), num_keys=2)
    prank = jnp.zeros((2 * n + 1,), jnp.int32).at[ppay].set(
        jnp.arange(2 * n, dtype=jnp.int32), mode="drop")[1:]  # (2N,)

    data_before = big_pos - prank                             # (2N,)
    lo = data_before[:n]
    cnt = data_before[n:] - lo
    return _reduce_sorted(cot9, eid, lo, cnt)


def _reduce_scatter(cot9, gid, n):
    """Fallback reduction: XLA deterministic scatter-add over gid (the
    transpose of the forward gather). Always correct, including when
    instances were dropped by capacity limits."""
    return jnp.zeros((9, n + 1), cot9.dtype).at[:, gid].add(cot9)[:, :n]


def pack_gather(packed_all, gid, eid, gstart, gcount, dropped,
                mode: str = "auto"):
    """packed_all (9, N+1) -> (9, K) per-instance rows via gid, with a custom
    per-Gaussian gradient reduction on the way back (see _reduce_sorted).

    mode: "sort" (fast path; REQUIRES dropped == 0, silently wrong
    otherwise), "scatter" (XLA scatter-add, always exact), or "auto"
    (default: fast sort path when nothing was dropped, the drop-tolerant
    sort variant otherwise, via lax.cond — never the scatter)."""

    @jax.custom_vjp
    def core(packed_all, gid, eid, gstart, gcount, dropped):
        return packed_all[:, gid]

    def core_fwd(packed_all, gid, eid, gstart, gcount, dropped):
        return packed_all[:, gid], (gid, eid, gstart, gcount, dropped)

    def core_bwd(res, cot):
        gid, eid, gstart, gcount, dropped = res
        n = gstart.shape[0]
        if mode == "sort":
            g9 = _reduce_sorted(cot, eid, gstart, gcount)
        elif mode == "scatter":
            g9 = _reduce_scatter(cot, gid, n)
        else:
            g9 = jax.lax.cond(
                dropped == 0,
                lambda c: _reduce_sorted(c, eid, gstart, gcount),
                lambda c: _reduce_sorted_dropped(c, eid, gstart, gcount),
                cot)
        gpacked = jnp.concatenate(
            [g9, jnp.zeros((9, 1), cot.dtype)], axis=1)   # sentinel column
        import numpy as _np
        f0 = jax.dtypes.float0
        z = lambda a: _np.zeros(a.shape, f0)
        return (gpacked, z(gid), z(eid), z(gstart), z(gcount), z(dropped))

    core.defvjp(core_fwd, core_bwd)
    return core(packed_all, gid, eid, gstart, gcount, dropped)


def pack_instance_attrs_t(means2d, conic, opacity, rgb):
    """Per-Gaussian attrs -> (9, N + 1) packed columns; the final column is
    an all-zero sentinel for padding instances (gid == N). Padding to the
    16-row kernel layout happens *after* the per-instance gather so the
    gather's transpose (the per-Gaussian gradient scatter-add) only moves
    the 9 meaningful rows. (A row-major layout + post-gather transpose was
    measured slower: the 2M-column transpose exceeds the minor-gather cost.)"""
    packed = jnp.stack([
        means2d[:, 0], means2d[:, 1],
        conic[:, 0], conic[:, 1], conic[:, 2],
        opacity,
        rgb[:, 0], rgb[:, 1], rgb[:, 2],
    ], axis=0)                                     # (9, N)
    return jnp.concatenate([packed, jnp.zeros((9, 1), jnp.float32)], axis=1)


def _lane_iota(pix, ch):
    return jax.lax.broadcasted_iota(jnp.int32, (1, ch), 1)


def _cumop_lane(x, op, identity, ch):
    """Inclusive scan along the lane axis (axis 1) of (pix, ch) via
    Hillis-Steele doubling with cyclic roll + wrap masking."""
    lanes = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    k = 1
    while k < ch:
        rolled = pltpu.roll(x, k, 1)
        rolled = jnp.where(lanes >= k, rolled, identity)
        x = op(x, rolled)
        k *= 2
    return x


def _shift_right_lane(x, fill, ch):
    """x[:, i] -> x[:, i-1]; lane 0 gets ``fill`` ((pix, 1) or scalar)."""
    lanes = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    rolled = pltpu.roll(x, 1, 1)
    return jnp.where(lanes >= 1, rolled, fill)


def _chunk_alpha(data, px, py, lane_valid):
    """Masked alphas for one chunk.

    data (16, CH); px/py (PIX, 1); lane_valid (1, CH).
    Returns alpha/g_exp/dx/dy shaped (PIX, CH) with the reference's power>0 /
    1-255 cutoff / 0.99 clamp applied (forward.cu:341-352).
    """
    mx = data[0:1, :]
    my = data[1:2, :]
    ca = data[2:3, :]
    cb = data[3:4, :]
    cc = data[4:5, :]
    op = data[5:6, :]
    dx = mx - px           # (PIX, CH)
    dy = my - py
    power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
    g = jnp.exp(power)
    alpha = jnp.minimum(ALPHA_MAX, op * g)
    keep = (power <= 0.0) & (alpha >= ALPHA_MIN) & lane_valid
    return jnp.where(keep, alpha, 0.0), g, dx, dy


def _pixel_coords(t, tiles_x, block_x, block_y, pix):
    p = jax.lax.broadcasted_iota(jnp.int32, (pix, 1), 0)
    tx = t % tiles_x
    ty = t // tiles_x
    px = (tx * block_x + p % block_x).astype(jnp.float32)
    py = (ty * block_y + p // block_x).astype(jnp.float32)
    return px, py


# ---------------------------------------------------------------------------
# Forward kernel
# ---------------------------------------------------------------------------

def _fwd_kernel(start_ref, count_ref, inst_ref, out_ref, chunk_vmem, sem,
                *, ch, pix, block_x, block_y, tiles_x, track_contrib):
    t = pl.program_id(0)
    start = pl.multiple_of(start_ref[t], ch)
    count = count_ref[t]
    px, py = _pixel_coords(t, tiles_x, block_x, block_y, pix)
    lanes = _lane_iota(pix, ch)

    n_chunks = pl.cdiv(count, ch)

    # double-buffered chunk DMA: prefetch c+1 while blending c so the copy
    # latency never sits on the critical path (chunk_vmem is (2, 16, ch),
    # sem is a 2-wide DMA semaphore array)
    def dma(c):
        slot = jax.lax.rem(c, 2)
        return pltpu.make_async_copy(
            inst_ref.at[:, pl.ds(start + c * ch, ch)],
            chunk_vmem.at[slot], sem.at[slot])

    @pl.when(n_chunks > 0)
    def _():
        dma(jnp.int32(0)).start()

    # Per-chunk lane reductions are the VPU's most expensive shape (log2(ch)
    # roll+add passes over every vreg); the color/contrib accumulators
    # therefore stay (PIX, CH) elementwise inside the loop and reduce ONCE
    # after it. ``done`` detection exploits that the lane cumprod is
    # non-increasing: its last lane is the chunk total (invalid lanes
    # contribute exactly 1.0), so a slice replaces the lane max-reduce. The
    # frozen final transmittance (reference forward.cu:353-357: T stops at
    # the last value >= 1e-4) still needs the masked lane min.
    def body(state):
        c, t_col, done, cacc, last = state

        @pl.when(c + 1 < n_chunks)
        def _():
            dma(c + 1).start()

        dma(c).wait()
        data = chunk_vmem[jax.lax.rem(c, 2)]
        lane_valid = (c * ch + lanes) < count
        alpha, _, _, _ = _chunk_alpha(data, px, py, lane_valid)

        cum = t_col * _cumop_lane(1.0 - alpha, jnp.multiply, 1.0, ch)
        cum_excl = _shift_right_lane(cum, t_col, ch)
        alive = (cum >= STOP_T) & (done < 0.5)
        w = jnp.where(alive, alpha * cum_excl, 0.0)

        cacc = (cacc[0] + w * data[6:7, :],
                cacc[1] + w * data[7:8, :],
                cacc[2] + w * data[8:9, :])

        if track_contrib:
            blended = alive & (alpha > 0.0)
            idx1 = (c * ch + lanes + 1).astype(jnp.float32)
            last = jnp.maximum(last, jnp.where(blended, idx1, 0.0))

        t_col = jnp.min(jnp.where(alive, cum, t_col), axis=1, keepdims=True)
        cum_last = cum[:, ch - 1:ch]
        done = jnp.maximum(done,
                           jnp.where(cum_last < STOP_T, 1.0, 0.0))
        return c + 1, t_col, done, cacc, last

    def cond(state):
        c, _, done, *_ = state
        return (c < n_chunks) & (jnp.min(done) < 0.5)

    zeroc = jnp.zeros((pix, ch), jnp.float32)
    init = (jnp.int32(0), jnp.ones((pix, 1), jnp.float32),
            jnp.zeros((pix, 1), jnp.float32), (zeroc, zeroc, zeroc), zeroc)
    c_stop, t_col, _, cacc, last = jax.lax.while_loop(cond, body, init)

    # on early exit the prefetched chunk c_stop has an outstanding DMA
    @pl.when(c_stop < n_chunks)
    def _():
        dma(c_stop).wait()

    # single per-tile lane reductions of the deferred accumulators
    cr = jnp.sum(cacc[0], axis=1, keepdims=True)
    cg = jnp.sum(cacc[1], axis=1, keepdims=True)
    cb = jnp.sum(cacc[2], axis=1, keepdims=True)
    last_col = jnp.max(last, axis=1, keepdims=True)

    # out block (1, 8, PIX): transpose the (PIX, 1) columns into rows.
    out = jnp.concatenate([cr, cg, cb, t_col, last_col,
                           jnp.zeros((pix, 3), jnp.float32)], axis=1)
    out_ref[0] = out.T


# ---------------------------------------------------------------------------
# Backward kernel
# ---------------------------------------------------------------------------

def _bwd_kernel(start_ref, count_ref, inst_ref, res_ref, cot_ref, grad_ref,
                chunk_vmem, gchunk_vmem, sem_in, sem_out,
                *, ch, pix, block_x, block_y, tiles_x, track_contrib):
    t = pl.program_id(0)
    start = pl.multiple_of(start_ref[t], ch)
    count = count_ref[t]
    px, py = _pixel_coords(t, tiles_x, block_x, block_y, pix)
    lanes = _lane_iota(pix, ch)

    res = res_ref[0]                       # (8, PIX)
    cot = cot_ref[0]
    g_r = cot[0:1, :].T                    # (PIX, 1)
    g_g = cot[1:2, :].T
    g_b = cot[2:3, :].T
    g_t = cot[3:4, :].T
    out_r = res[0:1, :].T
    out_g = res[1:2, :].T
    out_b = res[2:3, :].T
    t_fin = res[3:4, :].T

    total_dot = out_r * g_r + out_g * g_g + out_b * g_b   # (PIX, 1)
    tfin_gt = t_fin * g_t

    n_chunks = pl.cdiv(count, ch)
    # Instances past the tile's deepest blended contributor (saved n_contrib,
    # res row 4) have identically zero gradients — compute only up to there
    # and fill the remaining aligned slots with zeros (they must still be
    # written: the grad buffer is uninitialized HBM).
    if track_contrib:
        max_contrib = jnp.max(res[4:5, :]).astype(jnp.int32)
        live_chunks = jnp.minimum(pl.cdiv(max_contrib, ch), n_chunks)
    else:
        live_chunks = n_chunks

    # double-buffered read DMA (prefetch c+1) and write DMA (wait for the
    # slot's previous flight only when reusing it)
    def dma_in(c):
        slot = jax.lax.rem(c, 2)
        return pltpu.make_async_copy(
            inst_ref.at[:, pl.ds(start + c * ch, ch)],
            chunk_vmem.at[slot], sem_in.at[slot])

    def dma_out(c):
        slot = jax.lax.rem(c, 2)
        return pltpu.make_async_copy(
            gchunk_vmem.at[slot],
            grad_ref.at[:, pl.ds(start + c * ch, ch)], sem_out.at[slot])

    @pl.when(live_chunks > 0)
    def _():
        dma_in(jnp.int32(0)).start()

    def body(state):
        c, t_col, done, prefix = state

        @pl.when(c + 1 < live_chunks)
        def _():
            dma_in(c + 1).start()

        dma_in(c).wait()
        data = chunk_vmem[jax.lax.rem(c, 2)]
        lane_valid = (c * ch + lanes) < count
        alpha, g_exp, dx, dy = _chunk_alpha(data, px, py, lane_valid)

        cum = t_col * _cumop_lane(1.0 - alpha, jnp.multiply, 1.0, ch)
        cum_excl = _shift_right_lane(cum, t_col, ch)
        alive = (cum >= STOP_T) & (done < 0.5)
        m = jnp.where(alive & (alpha > 0.0), 1.0, 0.0)
        w = alpha * cum_excl * m

        cdot = (data[6:7, :] * g_r + data[7:8, :] * g_g
                + data[8:9, :] * g_b)                     # (PIX, CH)
        wc = w * cdot
        prefix_incl = _cumop_lane(wc, jnp.add, 0.0, ch) + prefix
        suffix = total_dot - prefix_incl

        dalpha = (cum_excl * cdot - (suffix + tfin_gt) / (1.0 - alpha)) * m
        dG = data[5:6, :] * dalpha          # d alpha/dG = opacity
        dpow = g_exp * dG
        ca = data[2:3, :]
        cb_ = data[3:4, :]
        cc = data[4:5, :]

        # per-instance sums over pixels (sublane axis) -> (1, CH) rows
        gr = jnp.concatenate([
            jnp.sum(dpow * (-ca * dx - cb_ * dy), axis=0, keepdims=True),
            jnp.sum(dpow * (-cc * dy - cb_ * dx), axis=0, keepdims=True),
            jnp.sum(dpow * (-0.5 * dx * dx), axis=0, keepdims=True),
            jnp.sum(dpow * (-dx * dy), axis=0, keepdims=True),
            jnp.sum(dpow * (-0.5 * dy * dy), axis=0, keepdims=True),
            jnp.sum(g_exp * dalpha, axis=0, keepdims=True),
            jnp.sum(w * g_r, axis=0, keepdims=True),
            jnp.sum(w * g_g, axis=0, keepdims=True),
            jnp.sum(w * g_b, axis=0, keepdims=True),
            jnp.zeros((PROWS - 9, ch), jnp.float32),
        ], axis=0)                                        # (16, CH)
        @pl.when(c >= 2)
        def _():
            dma_out(c - 2).wait()  # free this slot before rewriting it

        gchunk_vmem[jax.lax.rem(c, 2)] = gr
        dma_out(c).start()

        t_col = jnp.min(jnp.where(alive, cum, t_col), axis=1, keepdims=True)
        done = jnp.maximum(done, jnp.max(
            jnp.where(cum < STOP_T, 1.0, 0.0), axis=1, keepdims=True))
        # carry = inclusive total after this chunk (wc may be negative, so
        # sum — not max — is the last-lane value of the cumsum)
        prefix = prefix + jnp.sum(wc, axis=1, keepdims=True)
        return c + 1, t_col, done, prefix

    def cond(state):
        c, *_ = state
        return c < live_chunks

    init = (jnp.int32(0), jnp.ones((pix, 1), jnp.float32),
            jnp.zeros((pix, 1), jnp.float32), jnp.zeros((pix, 1), jnp.float32))
    jax.lax.while_loop(cond, body, init)

    # drain the last (up to two) outstanding gradient writes
    @pl.when(live_chunks >= 2)
    def _():
        dma_out(live_chunks - 2).wait()

    @pl.when(live_chunks >= 1)
    def _():
        dma_out(live_chunks - 1).wait()

    def zero_tail(c):
        slot = jax.lax.rem(c, 2)
        gchunk_vmem[slot] = jnp.zeros((PROWS, ch), jnp.float32)
        wr = pltpu.make_async_copy(
            gchunk_vmem.at[slot],
            grad_ref.at[:, pl.ds(start + c * ch, ch)], sem_out.at[slot])
        wr.start()
        wr.wait()
        return c + 1

    jax.lax.while_loop(lambda c: c < n_chunks, zero_tail, live_chunks)


# ---------------------------------------------------------------------------
# Host-side wrappers
# ---------------------------------------------------------------------------

def _fwd_call(packed, tile_start, tile_count, *, num_tiles, ch, pix,
              block_x, block_y, tiles_x, interpret, track_contrib):
    kernel = functools.partial(
        _fwd_kernel, ch=ch, pix=pix, block_x=block_x, block_y=block_y,
        tiles_x=tiles_x, track_contrib=track_contrib)
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(num_tiles,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(
                (1, 8, pix), lambda t, s1, s2: (t, 0, 0),
                memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((2, PROWS, ch), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((num_tiles, 8, pix), jnp.float32),
        interpret=interpret,
    )(tile_start, tile_count, packed)


def _bwd_call(packed, raw, cot, tile_start, tile_count, *, num_tiles, ch, pix,
              block_x, block_y, tiles_x, interpret, track_contrib):
    kernel = functools.partial(
        _bwd_kernel, ch=ch, pix=pix, block_x=block_x, block_y=block_y,
        tiles_x=tiles_x, track_contrib=track_contrib)
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(num_tiles,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec((1, 8, pix), lambda t, s1, s2: (t, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 8, pix), lambda t, s1, s2: (t, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            scratch_shapes=[
                pltpu.VMEM((2, PROWS, ch), jnp.float32),
                pltpu.VMEM((2, PROWS, ch), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct(packed.shape, jnp.float32),
        interpret=interpret,
    )(tile_start, tile_count, packed, raw, cot)


def _is_cpu():
    return jax.default_backend() == "cpu"


def blend_tiles(
    inst: Instances,
    means2d: jnp.ndarray,
    conic: jnp.ndarray,
    opacity: jnp.ndarray,
    rgb: jnp.ndarray,
    tiles_x: int,
    tiles_y: int,
    block_x: int,
    block_y: int,
    max_per_tile: int,
    chunk: int = CHUNK,
    track_contrib: bool = True,
    grad_reduce: str = "auto",
) -> BlendResult:
    """Same contract as ops/blend.py:blend_tiles, on the Pallas kernels.

    ``chunk`` is the lane width of a DMA chunk and must equal the binning
    alignment; 128 is the required value on TPU (interpret mode accepts any
    power of two for CPU tests). ``track_contrib=False`` skips the per-pixel
    n_contrib bookkeeping in the forward kernel (returned n_contrib is zeros)
    — an inference-mode fast path; gradients remain exact but the backward
    loses its deepest-contributor chunk-skip.
    """
    del max_per_tile  # per-tile caps were applied during binning
    num_tiles = tiles_x * tiles_y
    pix = block_x * block_y
    interpret = _is_cpu()
    if not interpret:
        assert chunk % 128 == 0, "TPU DMA chunks must be lane-aligned (128)"
        assert pix % 8 == 0

    packed_all = pack_instance_attrs_t(means2d, conic, opacity, rgb)
    # (9, K) instance rows; the VJP is the per-Gaussian gradient reduction
    # (sort-based in expansion order, or XLA scatter-add — see pack_gather)
    packed9 = pack_gather(packed_all, inst.gid, inst.eid, inst.gstart,
                          inst.gcount, inst.dropped, mode=grad_reduce)
    packed = jnp.concatenate(
        [packed9, jnp.zeros((PROWS - 9, packed9.shape[1]), jnp.float32)],
        axis=0)

    cfg = dict(num_tiles=num_tiles, ch=chunk, pix=pix, block_x=block_x,
               block_y=block_y, tiles_x=tiles_x, interpret=interpret,
               track_contrib=track_contrib)

    # tile_start/count/valid are explicit custom_vjp arguments (closures over
    # traced values would leak tracers under vmap); their cotangents are
    # float0 (integer/bool primals).
    @jax.custom_vjp
    def core(p, tile_start, tile_count, valid):
        return _fwd_call(p, tile_start, tile_count, **cfg)

    def core_fwd(p, tile_start, tile_count, valid):
        raw = _fwd_call(p, tile_start, tile_count, **cfg)
        return raw, (p, raw, tile_start, tile_count, valid)

    def core_bwd(res, cot):
        p, raw, tile_start, tile_count, valid = res
        gp = _bwd_call(p, raw, cot, tile_start, tile_count, **cfg)
        gp = jnp.where(valid[None, :], gp, 0.0)
        import numpy as _np
        f0 = jax.dtypes.float0
        return (gp,
                _np.zeros(tile_start.shape, f0),
                _np.zeros(tile_count.shape, f0),
                _np.zeros(valid.shape, f0))

    core.defvjp(core_fwd, core_bwd)
    raw = core(packed, inst.tile_start, inst.tile_count, inst.valid)

    color = jnp.transpose(raw[:, 0:3, :], (0, 2, 1))   # (T, PIX, 3)
    final_t = raw[:, 3, :]
    n_contrib = raw[:, 4, :].astype(jnp.int32)
    return BlendResult(color=color, final_t=final_t, n_contrib=n_contrib)
