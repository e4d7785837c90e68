#!/usr/bin/env python
"""Prototype: sequential-instance forward blend kernel (DESIGN §4 item 1).

Production kernel: instances on lanes, pixels on sublanes, per-chunk
Hillis-Steele lane scans (~40% of kernel ops). This prototype marches
instances SEQUENTIALLY over a full-vreg pixel block (32x32 tile = 1024 px =
one (8, 128) vreg), so the front-to-back product is a single carried
multiply — no scans — at ~30 vector ops per instance (vs ~124 effective
per 256-px instance today), with 2.4x fewer instances at 32-px tiles.

Round-3 status was BLOCKED on Mosaic for the per-instance scalar broadcast
(three idioms failed; see git history). Round 4 (jax 0.9.0) unblocked it:
DMA the chunk's 9 attribute rows HBM->SMEM (9, CH) double-buffered
(= 9.2 KB SMEM, under the budget that aborted at 16 KB), then per-instance
scalar SMEM reads + jnp.full((8,128), scalar) broadcasts — both verified
supported (tools/exp_mosaic_probe.py p4/p5).

Run on TPU:  python tools/exp_seqkernel.py      (correctness + timing)
CPU check:   python tools/exp_seqkernel.py cpu  (interpret mode, small)
"""

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/ngs-jax-cache")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from neuralgaussiansplatting_tpu.ops.blend import ALPHA_MAX, ALPHA_MIN, STOP_T

PROWS = 16
BX = BY = 32          # 1024-pixel tiles: one full (8, 128) vreg
PIX = BX * BY
CH = 128


def _seq_fwd_kernel(start_ref, count_ref, inst_ref, out_ref,
                    smem, sem, *, ch, tiles_x):
    t = pl.program_id(0)
    start = pl.multiple_of(start_ref[t], ch)
    count = count_ref[t]

    # pixel coords of the 32x32 tile as an (8, 128) block: pixel index
    # p = s * 128 + l -> (px, py) = (p % 32, p // 32) in-tile
    p_idx = (jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0) * 128
             + jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1))
    tx = t % tiles_x
    ty = t // tiles_x
    px = (tx * BX + p_idx % BX).astype(jnp.float32)
    py = (ty * BY + p_idx // BX).astype(jnp.float32)

    n_chunks = pl.cdiv(count, ch)

    def dma(c):
        slot = jax.lax.rem(c, 2)
        return pltpu.make_async_copy(
            inst_ref.at[:, pl.ds(start + c * ch, ch)],
            smem.at[slot], sem.at[slot])

    @pl.when(n_chunks > 0)
    def _():
        dma(jnp.int32(0)).start()

    UNROLL = 8

    def chunk_body(state):
        c, t_col, done, cr, cg, cb, last = state

        @pl.when(c + 1 < n_chunks)
        def _():
            dma(c + 1).start()

        dma(c).wait()
        slot = jax.lax.rem(c, 2)
        base = (c * ch).astype(jnp.float32)

        # Padding instances carry all-zero attribute columns (sentinel column
        # of pack_instance_attrs_t), so alpha == 0 and every update is a
        # no-op — the group loop runs full chunks with no `lim` masking.
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
                gexp = jnp.exp(power)
                alpha = jnp.minimum(ALPHA_MAX, op * gexp)
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
                last = jnp.where(alive & (a > 0.0),
                                 base + (i + 1).astype(jnp.float32), last)
                t_col = jnp.where(alive, t_new, t_col)
                done = jnp.where(t_new < STOP_T, 1.0, done)
            return t_col, done, cr, cg, cb, last

        t_col, done, cr, cg, cb, last = jax.lax.fori_loop(
            0, ch // UNROLL, group_body, (t_col, done, cr, cg, cb, last))
        return c + 1, t_col, done, cr, cg, cb, last

    def cond(state):
        c, _, done, *_ = state
        return (c < n_chunks) & (jnp.min(done) < 0.5)

    zero = jnp.zeros((8, 128), jnp.float32)
    init = (jnp.int32(0), jnp.ones((8, 128), jnp.float32), zero,
            zero, zero, zero, zero)
    c_stop, t_col, _, cr, cg, cb, last = jax.lax.while_loop(
        cond, chunk_body, init)

    @pl.when(c_stop < n_chunks)
    def _():
        dma(c_stop).wait()

    out_ref[0, 0] = cr
    out_ref[0, 1] = cg
    out_ref[0, 2] = cb
    out_ref[0, 3] = t_col
    out_ref[0, 4] = last


def seq_forward(packed, tile_start, tile_count, num_tiles, tiles_x,
                interpret=False):
    kernel = functools.partial(_seq_fwd_kernel, ch=CH, tiles_x=tiles_x)
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
                pltpu.SMEM((2, PROWS, CH), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((num_tiles, 5, 8, 128), jnp.float32),
        interpret=interpret,
    )(tile_start, tile_count, packed)


def main():
    cpu = "cpu" in sys.argv
    if cpu:
        jax.config.update("jax_platforms", "cpu")

    from neuralgaussiansplatting_tpu.models import gaussians as gm
    from neuralgaussiansplatting_tpu.ops import preprocess as pp
    from neuralgaussiansplatting_tpu.ops import binning
    from neuralgaussiansplatting_tpu.ops import blend_pallas as bp
    from neuralgaussiansplatting_tpu.ops import blend as blend_xla
    from __graft_entry__ import _demo_scene

    if cpu:
        n, w, h, capacity, kcap = 2000, 128, 128, 1 << 14, 1 << 13
    else:
        n, w, h, capacity, kcap = 100_000, 800, 800, 1216 * 1024, 640 * 1024
    tiles_x = (w + BX - 1) // BX
    tiles_y = (h + BY - 1) // BY
    num_tiles = tiles_x * tiles_y

    params, state, cam = _demo_scene(n=n, w=w, h=h, sh_degree=3)
    pre = jax.jit(lambda p: pp.preprocess_gaussians(
        p.xyz, gm.get_scaling(p), gm.get_rotation(p),
        gm.get_opacity(p, state.alive), gm.get_features(p), 3, cam, BX, BY,
        tight=True))(params)
    inst = jax.jit(functools.partial(
        binning.bin_gaussians, tiles_x=tiles_x, tiles_y=tiles_y,
        capacity=capacity, max_per_tile=4096, align=CH, pack_keys=True,
        packed_capacity=kcap, precise_cull=True, block_x=BX, block_y=BY,
        width=w, height=h))(pre)
    print(f"32x32 tiles: nr={int(inst.num_rendered)} "
          f"aligned={int(inst.aligned_demand)} dropped={int(inst.dropped)}",
          flush=True)

    packed_all = bp.pack_instance_attrs_t(pre.means2d, pre.conic,
                                          pre.opacity, pre.rgb)
    packed9 = packed_all[:, inst.gid]
    packed = jnp.concatenate(
        [packed9, jnp.zeros((PROWS - 9, kcap), jnp.float32)], axis=0)
    packed = jnp.asarray(np.asarray(packed))

    raw = jax.jit(lambda p: seq_forward(
        p, inst.tile_start, inst.tile_count, num_tiles, tiles_x,
        interpret=cpu))(packed)
    raw.block_until_ready()
    print("seq kernel ran", raw.shape, flush=True)

    # correctness vs the XLA oracle blend on the same instances
    res = blend_xla.blend_tiles(
        inst, pre.means2d, pre.conic, pre.opacity, pre.rgb,
        tiles_x, tiles_y, BX, BY, 4096, 16)
    ref_color = np.asarray(res.color)                    # (T, PIX, 3)
    ref_t = np.asarray(res.final_t)
    got = np.asarray(raw).reshape(num_tiles, 5, PIX)
    gc = np.stack([got[:, 0], got[:, 1], got[:, 2]], axis=-1)
    dc = np.abs(gc - ref_color).max()
    dt = np.abs(got[:, 3] - ref_t).max()
    dn = np.abs(got[:, 4] - np.asarray(res.n_contrib)).max()
    print(f"max diff color={dc:.2e} final_t={dt:.2e} n_contrib={dn:.0f}",
          flush=True)
    if not (dc < 2e-4 and dt < 2e-4):
        print("WARN: above target tolerance (investigating separately)")

    if not cpu:
        from tools.chain_bench import chain

        def body(carry, s):
            p, acc = carry
            rr = seq_forward(p + s, inst.tile_start, inst.tile_count,
                             num_tiles, tiles_x)
            return (p, acc + rr.sum())

        ms = chain(lambda: body, (packed, jnp.zeros(())), iters=8, reps=2)
        print(f"seq fwd kernel (32x32 tiles): {ms:7.2f} ms "
              f"(prod 16x16 fwd kernel: 9.3 ms at its own binning)",
              flush=True)


if __name__ == "__main__":
    main()
