#!/usr/bin/env python
"""Isolate the classic backward's cost components at the 800^2 bench config.

The round-4 stage table lumps "backward" into one ~13 ms number
(bwd kernel + grad reduce + epilogue) plus ~5.6 ms of "SH/activation
backward" (precolor-ablation difference). Rows here time each piece alone
in a chained loop (tools/chain_bench.chain):

  [0] seq bwd kernel alone (pallas _bwd_call on realistic binning)
  [1] grad reduce alone (_reduce_sorted: 10-operand eid sort + cumsum-diff)
  [2] grad reduce, drop-tolerant variant
  [3] grad reduce via XLA scatter
  [4] pack gather forward alone (packed_all[:, gid])
  [5] preprocess vjp alone (SH + cov + activation backward, given
      cotangents for means2d/conic/opacity/rgb)
  [6] preprocess forward alone
  [7] epilogue alone (moment rows -> 9 gradient rows)

Usage: python tools/exp_bwd_micro.py [row ids]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/ngs-jax-cache")

import jax
import jax.numpy as jnp

from tools.chain_bench import chain
from neuralgaussiansplatting_tpu.models import gaussians as gm
from neuralgaussiansplatting_tpu.ops import rasterize as rast
from neuralgaussiansplatting_tpu.ops import preprocess as pp
from neuralgaussiansplatting_tpu.ops import binning
from neuralgaussiansplatting_tpu.ops import blend_pallas
from neuralgaussiansplatting_tpu.ops import blend_seq
from __graft_entry__ import _demo_scene


def main():
    w = h = 800
    settings = rast.make_settings(
        "seq", capacity=640 * 1024, max_per_tile=4096,
        fast_sort=True, tight_culling=True, precise_cull=True,
        packed_capacity=512 * 1024)
    bx, by = settings.block_x, settings.block_y
    params, state, cam = _demo_scene(n=100_000, w=w, h=h, sh_degree=3)
    alive = state.alive
    tiles_x, tiles_y = settings.tiles_for(cam.width, cam.height)
    num_tiles = tiles_x * tiles_y

    m3 = params.xyz
    sc = gm.get_scaling(params)
    ro = gm.get_rotation(params)
    op = gm.get_opacity(params, alive)
    shs = gm.get_features(params)

    pre = pp.preprocess_gaussians(m3, sc, ro, op, shs, 3, cam, bx, by,
                                  tight=True)
    inst = binning.bin_gaussians(
        pre, tiles_x, tiles_y, settings.capacity, settings.max_per_tile,
        settings.chunk, pack_keys=True,
        packed_capacity=settings.packed_capacity,
        precise_cull=True, block_x=bx, block_y=by, width=w, height=h)
    packed_all = blend_pallas.pack_instance_attrs_t(
        pre.means2d, pre.conic, pre.opacity, pre.rgb)
    packed9 = packed_all[:, inst.gid]
    packed = jnp.concatenate(
        [packed9, jnp.zeros((blend_pallas.PROWS - 9, packed9.shape[1]))],
        axis=0)
    cfg = dict(num_tiles=num_tiles, ch=128, tiles_x=tiles_x,
               interpret=False, track_contrib=True)
    raw = blend_seq._fwd_call(packed, inst.tile_start, inst.tile_count, **cfg)
    cot = jnp.ones_like(raw) * 0.1
    gb = blend_seq._bwd_call(packed, raw, cot, inst.tile_start,
                             inst.tile_count, **cfg)
    cot9 = gb[:9]
    (inst, packed, raw, cot, gb, cot9) = jax.tree.map(
        jax.block_until_ready, (inst, packed, raw, cot, gb, cot9))

    k = packed.shape[1]

    def row_bwd_kernel():
        def body(carry, s):
            c, acc = carry
            g = blend_seq._bwd_call(packed, raw, c, inst.tile_start,
                                    inst.tile_count, **cfg)
            return (c + s * 1e-30, acc + jnp.sum(g))
        return body

    def row_reduce(fn):
        def make():
            def body(carry, s):
                c, acc = carry
                g = fn(c)
                return (c + s * 1e-30, acc + jnp.sum(g))
            return body
        return make

    def red_sorted(c):
        return blend_pallas._reduce_sorted(c, inst.eid, inst.gstart,
                                           inst.gcount)

    def red_dropped(c):
        return blend_pallas._reduce_sorted_dropped(c, inst.eid, inst.gstart,
                                                   inst.gcount)

    def red_scatter(c):
        return blend_pallas._reduce_scatter(c, inst.gid, m3.shape[0])

    def row_gather():
        def body(carry, s):
            pa, acc = carry
            g = pa[:, inst.gid]
            return (pa + s * 1e-30, acc + jnp.sum(g))
        return body

    def row_pre_vjp():
        def body(carry, s):
            x, acc = carry

            def f(xyz):
                pr = pp.preprocess_gaussians(xyz, sc, ro, op, shs, 3, cam,
                                             bx, by, tight=True)
                return (pr.means2d, pr.conic, pr.opacity, pr.rgb)

            _, vjp = jax.vjp(f, x)
            cots = (jnp.full((x.shape[0], 2), 1e-3),
                    jnp.full((x.shape[0], 3), 1e-3),
                    jnp.full((x.shape[0],), 1e-3),
                    jnp.full((x.shape[0], 3), 1e-3))
            (gx,) = vjp(cots)
            return (x + s * 1e-30 + gx * 1e-30, acc + jnp.sum(gx))
        return body

    def row_pre_fwd():
        def body(carry, s):
            x, acc = carry
            pr = pp.preprocess_gaussians(x + s, sc, ro, op, shs, 3, cam,
                                         bx, by, tight=True)
            return (x, acc + jnp.sum(pr.means2d) + jnp.sum(pr.rgb)
                    + jnp.sum(pr.conic))
        return body

    def row_epilogue():
        def body(carry, s):
            g, acc = carry
            out = blend_seq._epilogue(g, packed)
            return (g + s * 1e-30, acc + jnp.sum(out))
        return body

    z = jnp.zeros(())
    rows = [
        ("seq bwd kernel", row_bwd_kernel, (cot, z)),
        ("reduce sorted", row_reduce(red_sorted), (cot9, z)),
        ("reduce sorted dropped", row_reduce(red_dropped), (cot9, z)),
        ("reduce scatter", row_reduce(red_scatter), (cot9, z)),
        ("pack gather fwd", row_gather, (packed_all, z)),
        ("preprocess vjp", row_pre_vjp, (m3, z)),
        ("preprocess fwd", row_pre_fwd, (m3, z)),
        ("epilogue", row_epilogue, (gb, z)),
    ]
    sel = [a for a in sys.argv[1:] if not a.startswith("-")]
    print(f"K(packed)={k} num_rendered={int(inst.num_rendered)} "
          f"aligned={int(inst.aligned_demand)} dropped={int(inst.dropped)}")
    for i, (name, mk, x) in enumerate(rows):
        if sel and str(i) not in sel:
            continue
        ms = chain(mk, x, iters=8, reps=2)
        print(f"  [{i}] {name:24s} {ms:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
