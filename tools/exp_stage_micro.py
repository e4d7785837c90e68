#!/usr/bin/env python
"""Clean chained micro-timings of individual pipeline stages (800^2 bench
config). Unlike profile_chain_stages.py (cumulative ablation with strided
checksums), each row here is one stage in isolation with a cheap full-array
jnp.sum checksum, so the checksum cannot dominate the stage.

Usage: python tools/exp_stage_micro.py [row ids]
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
from neuralgaussiansplatting_tpu.gaussian_renderer import render
from neuralgaussiansplatting_tpu.utils import losses
from __graft_entry__ import _demo_scene


def sums(*arrs):
    return sum(jnp.sum(a.astype(jnp.float32)) for a in arrs)


def main():
    w = h = 800
    seq = "--seq" in sys.argv
    if seq:
        # production sequential-instance path: 32x32 tiles (ops/blend_seq)
        settings = rast.make_settings(
            "seq", capacity=640 * 1024, max_per_tile=4096,
            fast_sort=True, tight_culling=True, precise_cull=True,
            packed_capacity=512 * 1024)
    else:
        settings = rast.RasterizeSettings(
            capacity=1216 * 1024, max_per_tile=2048, chunk=128,
            backend="pallas", fast_sort=True, tight_culling=True,
            precise_cull=True, packed_capacity=1152 * 1024)
    bx, by = settings.block_x, settings.block_y
    params, state, cam = _demo_scene(n=100_000, w=w, h=h, sh_degree=3)
    alive = state.alive
    gt = jnp.zeros((3, h, w))
    tiles_x, tiles_y = settings.tiles_for(cam.width, cam.height)

    def inputs(p, s):
        return (p.xyz + s, gm.get_scaling(p), gm.get_rotation(p),
                gm.get_opacity(p, alive), gm.get_features(p))

    def run_pre(p, s):
        m3, sc, ro, op, shs = inputs(p, s)
        pre = pp.preprocess_gaussians(m3, sc, ro, op, shs, 3, cam,
                                      bx, by, tight=True)
        return sums(pre.means2d, pre.depths, pre.conic, pre.opacity, pre.rgb,
                    pre.radii, pre.rect_min, pre.rect_max, pre.tiles_touched)

    def make_prebin(with_pack):
        def run(p, s):
            m3, sc, ro, op, shs = inputs(p, s)
            pre = pp.preprocess_gaussians(m3, sc, ro, op, shs, 3, cam,
                                          bx, by, tight=True)
            inst = binning.bin_gaussians(
                pre, tiles_x, tiles_y, settings.capacity,
                settings.max_per_tile, settings.chunk, pack_keys=True,
                packed_capacity=settings.packed_capacity,
                precise_cull=settings.precise_cull, block_x=bx, block_y=by,
                width=w, height=h)
            acc = sums(inst.gid, inst.tile_start, inst.tile_count,
                       inst.eid) + inst.num_rendered
            if with_pack:
                packed_all = blend_pallas.pack_instance_attrs_t(
                    pre.means2d, pre.conic, pre.opacity, pre.rgb)
                acc = acc + sums(packed_all[:, inst.gid])
            return acc
        return run

    def run_fwd(p, s):
        out = render(cam, p._replace(xyz=p.xyz + s), alive, 3,
                     jnp.zeros(3), settings)
        return sums(out["render"], out["final_t"])

    def make_loss_row(stg):
        def body(carry, s):
            p, acc = carry
            return (p, acc + stg(p, s))
        return body

    def make_grad(mode, sh_degree=3, lam=0.2, track=True):
        st = rast.RasterizeSettings(
            **{**settings.__dict__, "grad_reduce": mode,
               "track_contrib": track})

        def body(carry, s):
            p, acc = carry

            def loss(p):
                out = render(cam, p, alive, sh_degree, jnp.zeros(3), st)
                return losses.photometric_loss(out["render"], gt + s, lam)
            _, g = jax.value_and_grad(loss)(p)
            return (jax.tree.map(lambda a, b: a - 1e-30 * b, p, g), acc)
        return body

    def make_grad_precolor(mode):
        """Backward with SH+activations OUT of the graph: differentiate a
        precomputed color/geometry bundle only (isolates the preprocess/SH
        backward cost as the difference vs make_grad)."""
        st = rast.RasterizeSettings(
            **{**settings.__dict__, "grad_reduce": mode})
        m3, sc, ro, op, shs = inputs(params, 0.0)
        from neuralgaussiansplatting_tpu.ops import sh as sh_ops
        col0 = sh_ops.sh_to_rgb_color(3, shs, m3, cam.campos)

        def body(carry, s):
            col, acc = carry

            def loss(col):
                out = rast.rasterize(m3, sc, ro, op, shs, 0, cam,
                                     jnp.zeros(3), st, colors_precomp=col)
                return losses.photometric_loss(out.color, gt + s, 0.2)
            _, g = jax.value_and_grad(loss)(col)
            return (col - 1e-30 * g, acc)
        return body

    x0 = (params, jnp.zeros(()))
    rows = [
        ("preprocess only", make_loss_row(run_pre), x0),
        ("preprocess+binning", make_loss_row(make_prebin(False)), x0),
        ("preprocess+binning+pack", make_loss_row(make_prebin(True)), x0),
        ("full fwd", make_loss_row(run_fwd), x0),
        ("fwd+bwd sort", make_grad("sort"), x0),
        ("fwd+bwd scatter", make_grad("scatter"), x0),
        ("fwd+bwd sort L1-only", make_grad("sort", lam=0.0), x0),
        ("fwd+bwd sort SH0", make_grad("sort", sh_degree=0), x0),
        ("fwd+bwd sort precolor", make_grad_precolor("sort"),
         (jnp.zeros((100_000, 3)), jnp.zeros(()))),
    ]
    sel = [a for a in sys.argv[1:] if not a.startswith("-")]
    for i, (name, body, x) in enumerate(rows):
        if sel and str(i) not in sel:
            continue
        ms = chain(lambda b=body: b, x, iters=8, reps=2)
        print(f"  [{i}] {name:28s} {ms:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
