"""Sequential-instance Pallas blend kernels (32x32-tile production path).

Second-generation TPU re-design of the reference ``renderCUDA`` pair
(diff-gaussian-rasterization/cuda_rasterizer/forward.cu:262-374,
backward.cu:400-557), complementing ``blend_pallas.py``:

- ``blend_pallas`` puts instances on lanes and pixels on sublanes; the
  front-to-back product is a per-chunk Hillis-Steele lane scan (~40% of
  kernel ops) and tiles are 16x16.
- Here the tile is 32x32 = 1024 px = one full (8, 128) vreg, and instances
  march SEQUENTIALLY: the blend product is a single carried multiply per
  instance — no scans. Per-instance attributes are read as SCALARS from an
  SMEM copy of the chunk (double-buffered DMA) and broadcast by the VPU;
  eight instances unroll per loop step so their alpha math has full ILP
  while only the short transmittance chain is serial.
- 32x32 tiles cut the duplicated-instance count ~2.4x versus 16x16 (fewer
  bounding-rect tiles per Gaussian), which shrinks binning, the pack
  gather, both kernels, and the gradient reduction proportionally.

Backward design: recompute the forward chain per instance, but turn the
per-instance pixel reductions (the expensive part of a sequential layout)
into LANE-PARALLEL work: each instance's per-pixel ``dpow`` and blend
weight rows are written to (128, 1024) VMEM matrices (one dynamic-sublane
store each), and after the chunk loop ALL 128 instances reduce together
against static per-pixel monomial maps. The six geometry gradients are
recombined OUTSIDE the kernel from tile-centered moments:

    sum dpow*dx^k*dy^m  =  polynomial in (mxc, myc) of  S_j = sum dpow*m_j

with m_j in {1, xc, yc, xc^2, yc^2, xc*yc} and xc = px - tile_center an
exact small integer (bf16/f32-exact maps, no cancellation blowup). The
kernel emits raw moment rows [S0,S1x,S1y,S2x,S2y,S1xy,Cr,Cg,Cb,mxc,myc]
per instance; an XLA epilogue turns them into the reference's 9 gradient
rows. Replicated reference quirk (as in blend_pallas): the backward treats
alpha as unclamped even when the forward clamped it at 0.99.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from neuralgaussiansplatting_tpu.ops.binning import Instances
from neuralgaussiansplatting_tpu.ops.blend import (
    ALPHA_MAX, ALPHA_MIN, STOP_T, BlendResult,
)
from neuralgaussiansplatting_tpu.ops.blend_pallas import (
    PROWS, pack_gather, pack_instance_attrs_t,
)

CHUNK = 128      # lane width of a DMA chunk == binning alignment
BX = BY = 32     # tile pitch: 1024 px = one (8, 128) f32 vreg
PIX = BX * BY
UNROLL = 16      # instances per unrolled group (ILP for the alpha math)


def _pixel_block(t, tiles_x):
    """Absolute pixel coords of tile t as (8, 128) blocks; p = s*128 + l."""
    p_idx = (jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0) * 128
             + jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1))
    tx = t % tiles_x
    ty = t // tiles_x
    px = (tx * BX + p_idx % BX).astype(jnp.float32)
    py = (ty * BY + p_idx // BX).astype(jnp.float32)
    return px, py


def monomial_maps():
    """(6, 1024) static centered pixel-monomial maps (bf16/f32-exact ints).

    Row layout: [1, xc, yc, xc^2, yc^2, xc*yc] with xc = (p % 32) - 16,
    yc = (p // 32) - 16 for in-tile pixel p (same p = s*128 + l order as the
    kernels' (8, 128) pixel blocks, flattened row-major).
    """
    p = np.arange(PIX)
    xc = (p % BX - 16).astype(np.float32)
    yc = (p // BX - 16).astype(np.float32)
    return jnp.asarray(
        np.stack([np.ones_like(xc), xc, yc, xc * xc, yc * yc, xc * yc]))


# ---------------------------------------------------------------------------
# Forward kernel
# ---------------------------------------------------------------------------

def _fwd_kernel(start_ref, count_ref, inst_ref, out_ref, smem, sem,
                *, ch, tiles_x, track_contrib, static_unroll=True):
    t = pl.program_id(0)
    start = pl.multiple_of(start_ref[t], ch)
    count = count_ref[t]
    px, py = _pixel_block(t, tiles_x)
    n_chunks = pl.cdiv(count, ch)

    def dma(c):
        slot = jax.lax.rem(c, 2)
        return pltpu.make_async_copy(
            inst_ref.at[:, pl.ds(start + c * ch, ch)],
            smem.at[slot], sem.at[slot])

    @pl.when(n_chunks > 0)
    def _():
        dma(jnp.int32(0)).start()

    def chunk_body(state):
        c, t_col, done, cr, cg, cb, last = state

        @pl.when(c + 1 < n_chunks)
        def _():
            dma(c + 1).start()

        dma(c).wait()
        slot = jax.lax.rem(c, 2)
        base = (c * ch).astype(jnp.float32)

        # Padding instances carry all-zero attribute columns (sentinel
        # column of pack_instance_attrs_t), so alpha == 0 and every update
        # is a no-op — full chunks run with no `lim` masking.
        def group_body(gi, carry):
            t_col, done, cr, cg, cb, last = carry
            i0 = gi * UNROLL
            # independent alpha math for UNROLL instances (full ILP) ...
            aws = []
            for u in range(UNROLL):
                i = i0 + u
                mx = smem[slot, 0, i]
                my = smem[slot, 1, i]
                ca = smem[slot, 2, i]
                cbc = smem[slot, 3, i]
                cc = smem[slot, 4, i]
                op = smem[slot, 5, i]
                dx = mx - px
                dy = my - py
                power = (-0.5 * (ca * (dx * dx) + cc * (dy * dy))
                         - cbc * (dx * dy))
                alpha = jnp.minimum(ALPHA_MAX, op * jnp.exp(power))
                keep = (power <= 0.0) & (alpha >= ALPHA_MIN)
                aws.append(jnp.where(keep, alpha, 0.0))
            # ... then the short sequential blend chain
            for u in range(UNROLL):
                i = i0 + u
                a = aws[u]
                ta = t_col * a
                t_new = t_col - ta
                alive = (t_new >= STOP_T) & (done < 0.5)
                w = jnp.where(alive, ta, 0.0)
                cr = cr + w * smem[slot, 6, i]
                cg = cg + w * smem[slot, 7, i]
                cb = cb + w * smem[slot, 8, i]
                if track_contrib:
                    # i is a python int when statically unrolled, a traced
                    # int32 under the interpret-mode fori_loop; f32 + i32
                    # promotes to f32 either way
                    last = jnp.where(alive & (a > 0.0), base + (i + 1), last)
                t_col = jnp.where(alive, t_new, t_col)
                done = jnp.where(t_new < STOP_T, 1.0, done)
            return t_col, done, cr, cg, cb, last

        # Static unroll on TPU: Mosaic pays a measurable per-iteration
        # carry cost for an inner fori_loop (~2.7 ms/step at 800^2 across
        # both kernels); interpret mode (CPU tests) keeps the loop — the
        # fully unrolled 128-instance trace compiles ~10x slower there.
        state = (t_col, done, cr, cg, cb, last)
        if static_unroll:
            for gi in range(ch // UNROLL):
                state = group_body(gi, state)
        else:
            state = jax.lax.fori_loop(0, ch // UNROLL, group_body, state)
        t_col, done, cr, cg, cb, last = state
        return c + 1, t_col, done, cr, cg, cb, last

    def cond(state):
        c, _, done, *_ = state
        return (c < n_chunks) & (jnp.min(done) < 0.5)

    zero = jnp.zeros((8, 128), jnp.float32)
    init = (jnp.int32(0), jnp.ones((8, 128), jnp.float32), zero,
            zero, zero, zero, zero)
    c_stop, t_col, _, cr, cg, cb, last = jax.lax.while_loop(
        cond, chunk_body, init)

    # on early exit the prefetched chunk c_stop has an outstanding DMA
    @pl.when(c_stop < n_chunks)
    def _():
        dma(c_stop).wait()

    out_ref[0, 0] = cr
    out_ref[0, 1] = cg
    out_ref[0, 2] = cb
    out_ref[0, 3] = t_col
    out_ref[0, 4] = last


# ---------------------------------------------------------------------------
# Backward kernel
# ---------------------------------------------------------------------------

def _bwd_kernel(start_ref, count_ref, inst_ref, mono_ref, res_ref, cot_ref,
                grad_ref, smem, vchunk, gchunk, dmat, wmat,
                sem_s, sem_v, sem_out, *, ch, tiles_x, track_contrib,
                static_unroll=True):
    t = pl.program_id(0)
    start = pl.multiple_of(start_ref[t], ch)
    count = count_ref[t]
    px, py = _pixel_block(t, tiles_x)
    tx = t % tiles_x
    ty = t // tiles_x
    cx = (tx * BX + 16).astype(jnp.float32)
    cy = (ty * BY + 16).astype(jnp.float32)

    res = res_ref[0]          # (5, 8, 128): r, g, b, final_t, n_contrib
    cot = cot_ref[0]
    g_r = cot[0]
    g_g = cot[1]
    g_b = cot[2]
    g_t = cot[3]
    # tot = total_dot + tfin * g_t; dalpha uses (suffix + tfin*g_t) where
    # suffix = total_dot - prefix_incl (backward.cu:507-534 semantics)
    tot = res[0] * g_r + res[1] * g_g + res[2] * g_b + res[3] * g_t

    n_chunks = pl.cdiv(count, ch)
    if track_contrib:
        max_contrib = jnp.max(res[4]).astype(jnp.int32)
        live_chunks = jnp.minimum(pl.cdiv(max_contrib, ch), n_chunks)
    else:
        live_chunks = n_chunks

    def dma_s(c):
        slot = jax.lax.rem(c, 2)
        return pltpu.make_async_copy(
            inst_ref.at[:, pl.ds(start + c * ch, ch)],
            smem.at[slot], sem_s.at[slot])

    def dma_v(c):
        slot = jax.lax.rem(c, 2)
        return pltpu.make_async_copy(
            inst_ref.at[:, pl.ds(start + c * ch, ch)],
            vchunk.at[slot], sem_v.at[slot])

    def dma_out(c):
        slot = jax.lax.rem(c, 2)
        return pltpu.make_async_copy(
            gchunk.at[slot],
            grad_ref.at[:, pl.ds(start + c * ch, ch)], sem_out.at[slot])

    @pl.when(live_chunks > 0)
    def _():
        dma_s(jnp.int32(0)).start()
        dma_v(jnp.int32(0)).start()

    def chunk_body(state):
        c, t_col, done, prefix = state

        @pl.when(c + 1 < live_chunks)
        def _():
            dma_s(c + 1).start()
            dma_v(c + 1).start()

        dma_s(c).wait()
        slot = jax.lax.rem(c, 2)

        def group_body(gi, carry):
            t_col, done, prefix = carry
            i0 = gi * UNROLL
            pre = []
            for u in range(UNROLL):
                i = i0 + u
                mx = smem[slot, 0, i]
                my = smem[slot, 1, i]
                ca = smem[slot, 2, i]
                cbc = smem[slot, 3, i]
                cc = smem[slot, 4, i]
                op = smem[slot, 5, i]
                r = smem[slot, 6, i]
                g = smem[slot, 7, i]
                b = smem[slot, 8, i]
                dx = mx - px
                dy = my - py
                power = (-0.5 * (ca * (dx * dx) + cc * (dy * dy))
                         - cbc * (dx * dy))
                gexp = jnp.exp(power)
                alpha = jnp.minimum(ALPHA_MAX, op * gexp)
                keep = (power <= 0.0) & (alpha >= ALPHA_MIN)
                a = jnp.where(keep, alpha, 0.0)
                cdot = r * g_r + g * g_g + b * g_b
                pre.append((a, op * gexp, cdot))
            for u in range(UNROLL):
                i = i0 + u
                a, opg, cdot = pre[u]
                ta = t_col * a
                t_new = t_col - ta
                alive = (t_new >= STOP_T) & (done < 0.5)
                liveab = alive & (a > 0.0)
                w = jnp.where(liveab, ta, 0.0)
                wc = w * cdot
                prefix = prefix + wc
                # dalpha = cum_excl*cdot - (suffix + tfin*g_t)/(1 - alpha)
                dalpha = jnp.where(
                    liveab,
                    t_col * cdot - (tot - prefix) / (1.0 - a), 0.0)
                dpow = opg * dalpha
                dmat[pl.ds(i, 1), :] = dpow.reshape(1, PIX)
                wmat[pl.ds(i, 1), :] = w.reshape(1, PIX)
                t_col = jnp.where(alive, t_new, t_col)
                done = jnp.where(t_new < STOP_T, 1.0, done)
            return t_col, done, prefix

        state = (t_col, done, prefix)
        if static_unroll:
            for gi in range(ch // UNROLL):
                state = group_body(gi, state)
        else:
            state = jax.lax.fori_loop(0, ch // UNROLL, group_body, state)
        t_col, done, prefix = state

        # lane-parallel reduction of ALL 128 instances at once: per-pixel
        # moment maps ride (1, PIX) rows broadcast over the instance sublanes
        d = dmat[:]                               # (128, PIX)
        wm = wmat[:]
        cols = [jnp.sum(d * mono_ref[k:k + 1, :], axis=1, keepdims=True)
                for k in range(6)]
        cols.append(jnp.sum(wm * g_r.reshape(1, PIX), axis=1, keepdims=True))
        cols.append(jnp.sum(wm * g_g.reshape(1, PIX), axis=1, keepdims=True))
        cols.append(jnp.sum(wm * g_b.reshape(1, PIX), axis=1, keepdims=True))
        cols.append(jnp.zeros((ch, PROWS - 9), jnp.float32))
        stacked = jnp.concatenate(cols, axis=1)   # (128, 16)
        rows = stacked.T                          # (16, 128)

        dma_v(c).wait()
        mxc = vchunk[slot, 0:1, :] - cx           # (1, 128) centered means
        myc = vchunk[slot, 1:2, :] - cy
        out16 = jnp.concatenate(
            [rows[0:9], mxc, myc, jnp.zeros((PROWS - 11, ch), jnp.float32)],
            axis=0)

        @pl.when(c >= 2)
        def _():
            dma_out(c - 2).wait()   # free this slot before rewriting it

        gchunk[slot] = out16
        dma_out(c).start()
        return c + 1, t_col, done, prefix

    def cond(state):
        c, *_ = state
        return c < live_chunks

    zero = jnp.zeros((8, 128), jnp.float32)
    init = (jnp.int32(0), jnp.ones((8, 128), jnp.float32), zero, zero)
    c_stop, *_ = jax.lax.while_loop(cond, chunk_body, init)

    @pl.when(live_chunks >= 2)
    def _():
        dma_out(live_chunks - 2).wait()

    @pl.when(live_chunks >= 1)
    def _():
        dma_out(live_chunks - 1).wait()

    def zero_tail(c):
        slot = jax.lax.rem(c, 2)
        gchunk[slot] = jnp.zeros((PROWS, ch), jnp.float32)
        wr = pltpu.make_async_copy(
            gchunk.at[slot],
            grad_ref.at[:, pl.ds(start + c * ch, ch)], sem_out.at[slot])
        wr.start()
        wr.wait()
        return c + 1

    jax.lax.while_loop(lambda c: c < n_chunks, zero_tail, live_chunks)


# ---------------------------------------------------------------------------
# Host-side wrappers
# ---------------------------------------------------------------------------

def _fwd_call(packed, tile_start, tile_count, *, num_tiles, ch, tiles_x,
              interpret, track_contrib):
    kernel = functools.partial(
        _fwd_kernel, ch=ch, tiles_x=tiles_x, track_contrib=track_contrib,
        static_unroll=not interpret)
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(num_tiles,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(
                (1, 5, 8, 128), lambda t, s1, s2: (t, 0, 0, 0),
                memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.SMEM((2, PROWS, ch), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((num_tiles, 5, 8, 128), jnp.float32),
        interpret=interpret,
    )(tile_start, tile_count, packed)


def _bwd_call(packed, raw, cot, tile_start, tile_count, *, num_tiles, ch,
              tiles_x, interpret, track_contrib):
    kernel = functools.partial(
        _bwd_kernel, ch=ch, tiles_x=tiles_x, track_contrib=track_contrib,
        static_unroll=not interpret)
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(num_tiles,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec((6, PIX), lambda t, s1, s2: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 5, 8, 128), lambda t, s1, s2: (t, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 5, 8, 128), lambda t, s1, s2: (t, 0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            scratch_shapes=[
                pltpu.SMEM((2, PROWS, ch), jnp.float32),
                pltpu.VMEM((2, PROWS, ch), jnp.float32),
                pltpu.VMEM((2, PROWS, ch), jnp.float32),
                pltpu.VMEM((ch, PIX), jnp.float32),
                pltpu.VMEM((ch, PIX), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct(packed.shape, jnp.float32),
        interpret=interpret,
    )(tile_start, tile_count, packed, monomial_maps(), raw, cot)


def _epilogue(gb, p):
    """Raw per-instance moment rows -> the 9 reference gradient rows.

    gb (16, K): [S0,S1x,S1y,S2x,S2y,S1xy,Cr,Cg,Cb,mxc,myc,...]; p (16, K)
    the forward packed attrs (rows 2..5 = conic A,B,C + opacity).
    """
    s0, s1x, s1y, s2x, s2y, s1xy = (gb[k] for k in range(6))
    mxc, myc = gb[9], gb[10]
    ca, cb_, cc, op = p[2], p[3], p[4], p[5]
    sdx = mxc * s0 - s1x
    sdy = myc * s0 - s1y
    sdx2 = mxc * (mxc * s0 - 2.0 * s1x) + s2x
    sdy2 = myc * (myc * s0 - 2.0 * s1y) + s2y
    sdxdy = mxc * (myc * s0 - s1y) - myc * s1x + s1xy
    g_op = jnp.where(op > 0.0, s0 / jnp.where(op > 0.0, op, 1.0), 0.0)
    return jnp.stack([
        -(ca * sdx + cb_ * sdy),
        -(cc * sdy + cb_ * sdx),
        -0.5 * sdx2,
        -sdxdy,
        -0.5 * sdy2,
        g_op,
        gb[6], gb[7], gb[8],
    ], axis=0)                                    # (9, K)


def _is_cpu():
    return jax.default_backend() == "cpu"


def blend_tiles_seq(
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
    """Same contract as blend_pallas.blend_tiles, on the sequential kernels.

    Requires 32x32 tiles (one full-vreg pixel block) and chunk == 128.
    """
    del max_per_tile
    assert block_x == BX and block_y == BY, "seq layout requires 32x32 tiles"
    assert chunk == CHUNK, "seq layout requires 128-wide chunks"
    num_tiles = tiles_x * tiles_y
    interpret = _is_cpu()

    packed_all = pack_instance_attrs_t(means2d, conic, opacity, rgb)
    packed9 = pack_gather(packed_all, inst.gid, inst.eid, inst.gstart,
                          inst.gcount, inst.dropped, mode=grad_reduce)
    packed = jnp.concatenate(
        [packed9, jnp.zeros((PROWS - 9, packed9.shape[1]), jnp.float32)],
        axis=0)

    cfg = dict(num_tiles=num_tiles, ch=chunk, tiles_x=tiles_x,
               interpret=interpret, track_contrib=track_contrib)

    @jax.custom_vjp
    def core(p, tile_start, tile_count, valid):
        return _fwd_call(p, tile_start, tile_count, **cfg)

    def core_fwd(p, tile_start, tile_count, valid):
        raw = _fwd_call(p, tile_start, tile_count, **cfg)
        return raw, (p, raw, tile_start, tile_count, valid)

    def core_bwd(res, cot):
        p, raw, tile_start, tile_count, valid = res
        gb = _bwd_call(p, raw, cot, tile_start, tile_count, **cfg)
        g9 = _epilogue(gb, p)
        g9 = jnp.where(valid[None, :], g9, 0.0)
        gp = jnp.concatenate(
            [g9, jnp.zeros((PROWS - 9, g9.shape[1]), jnp.float32)], axis=0)
        f0 = jax.dtypes.float0
        return (gp,
                np.zeros(tile_start.shape, f0),
                np.zeros(tile_count.shape, f0),
                np.zeros(valid.shape, f0))

    core.defvjp(core_fwd, core_bwd)
    raw = core(packed, inst.tile_start, inst.tile_count, inst.valid)

    color = jnp.transpose(raw[:, 0:3].reshape(num_tiles, 3, PIX), (0, 2, 1))
    final_t = raw[:, 3].reshape(num_tiles, PIX)
    n_contrib = raw[:, 4].reshape(num_tiles, PIX).astype(jnp.int32)
    return BlendResult(color=color, final_t=final_t, n_contrib=n_contrib)
