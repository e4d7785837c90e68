#!/usr/bin/env python
"""Chained per-stage cost breakdown of the train step (ablation style).

Each row times a chained loop that runs the pipeline only up to stage X
(consuming every intermediate so XLA cannot DCE); successive differences
give in-context stage costs — the only reliable methodology over the axon
tunnel (see tools/chain_bench.py).

Usage: python tools/profile_chain_stages.py [800|1080]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp")

import jax
import jax.numpy as jnp

from tools.chain_bench import chain
from neuralgaussiansplatting_tpu.gaussian_renderer import render
from neuralgaussiansplatting_tpu.models import gaussians as gm
from neuralgaussiansplatting_tpu.ops import rasterize as rast
from neuralgaussiansplatting_tpu.ops import preprocess as pp
from neuralgaussiansplatting_tpu.ops import binning
from neuralgaussiansplatting_tpu.ops import blend_pallas
from neuralgaussiansplatting_tpu.utils import losses
from __graft_entry__ import _demo_scene


def tree_checksum(x):
    return sum(jnp.sum(l.ravel()[:: max(1, l.size // 8)].astype(jnp.float32))
               for l in jax.tree.leaves(x) if hasattr(l, "ravel"))


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "800"
    if which == "800":
        w, h = 800, 800
        settings = rast.RasterizeSettings(
            capacity=1216 * 1024, max_per_tile=2048, chunk=128,
            backend="pallas", fast_sort=True, tight_culling=True,
            precise_cull=True, packed_capacity=1152 * 1024)
    else:
        w, h = 1920, 1080
        settings = rast.RasterizeSettings(
            capacity=1 << 22, max_per_tile=2048, chunk=128,
            backend="pallas", fast_sort=True, tight_culling=True,
            packed_capacity=4608 * 1024)

    params, state, cam = _demo_scene(n=100_000, w=w, h=h, sh_degree=3)
    alive = state.alive
    gt = jnp.zeros((3, h, w))
    tiles_x, tiles_y = settings.tiles_for(cam.width, cam.height)
    sh_degree = 3

    def inputs(p, s):
        return (p.xyz + s, gm.get_scaling(p), gm.get_rotation(p),
                gm.get_opacity(p, alive), gm.get_features(p))

    def stage_pre(p, s):
        m3, sc, ro, op, shs = inputs(p, s)
        pre = pp.preprocess_gaussians(m3, sc, ro, op, shs, sh_degree, cam,
                                      16, 16, tight=True)
        return tree_checksum(pre)

    def stage_bin(p, s):
        m3, sc, ro, op, shs = inputs(p, s)
        pre = pp.preprocess_gaussians(m3, sc, ro, op, shs, sh_degree, cam,
                                      16, 16, tight=True)
        inst = binning.bin_gaussians(pre, tiles_x, tiles_y, settings.capacity,
                                     settings.max_per_tile, settings.chunk,
                                     pack_keys=True,
                                     packed_capacity=settings.packed_capacity)
        return tree_checksum(pre) + tree_checksum(inst._replace(
            eid=inst.eid * 0, gstart=inst.gstart * 0))  # fwd-only view

    def stage_pack(p, s):
        m3, sc, ro, op, shs = inputs(p, s)
        pre = pp.preprocess_gaussians(m3, sc, ro, op, shs, sh_degree, cam,
                                      16, 16, tight=True)
        inst = binning.bin_gaussians(pre, tiles_x, tiles_y, settings.capacity,
                                     settings.max_per_tile, settings.chunk,
                                     pack_keys=True,
                                     packed_capacity=settings.packed_capacity)
        packed_all = blend_pallas.pack_instance_attrs_t(
            pre.means2d, pre.conic, pre.opacity, pre.rgb)
        packed9 = packed_all[:, inst.gid]
        return tree_checksum(pre) + tree_checksum(packed9)

    def stage_fwd(p, s):
        out = render(cam, p._replace(xyz=p.xyz + s), alive, sh_degree,
                     jnp.zeros(3), settings)
        return tree_checksum(out["render"]) + out["final_t"].sum()

    def make_loss(stg):
        def body(carry, s):
            p, acc = carry
            return (p, acc + stg(p, s))
        return body

    def make_grad(mode):
        st = rast.RasterizeSettings(
            **{**settings.__dict__, "grad_reduce": mode})

        def body(carry, s):
            p, acc = carry

            def loss(p):
                out = render(cam, p, alive, sh_degree, jnp.zeros(3), st)
                return losses.photometric_loss(out["render"], gt + s, 0.2)
            _, g = jax.value_and_grad(loss)(p)
            return (jax.tree.map(lambda a, b: a - 1e-30 * b, p, g), acc)
        return body

    x0 = (params, jnp.zeros(()))
    rows = [
        ("preprocess", make_loss(stage_pre)),
        ("+binning", make_loss(stage_bin)),
        ("+pack gather", make_loss(stage_pack)),
        ("+fwd kernel/assemble (full fwd)", make_loss(stage_fwd)),
        ("full fwd+bwd+sortreduce", make_grad("sort")),
        ("full fwd+bwd+scatter", make_grad("scatter")),
    ]
    sel = sys.argv[2:]
    for i, (name, body) in enumerate(rows):
        if sel and str(i) not in sel:
            continue
        ms = chain(lambda b=body: b, x0, iters=6, reps=2)
        print(f"  [{i}] {name:34s} {ms:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
