#!/usr/bin/env python
"""Round-3 optimization experiment bundle (800^2 bench config).

A: grad-reduce post-sort layout — (K, 9) stack+cumsum+row-gathers (current)
   vs (9, K) stack + transposed cumsum + column-gathers.
B: preprocess-backward split — differentiate geometry only (colors precomp
   constant) vs everything: isolates the SH backward from the EWA backward.
C: cull ON with a packed_capacity sized to the culled demand (no drops).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/ngs-jax-cache")

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from tools.chain_bench import chain
from neuralgaussiansplatting_tpu.gaussian_renderer import render
from neuralgaussiansplatting_tpu.ops import rasterize as rast
from neuralgaussiansplatting_tpu.ops import binning
from neuralgaussiansplatting_tpu.ops.binning import _blocked_cumsum
from neuralgaussiansplatting_tpu.utils import losses
from __graft_entry__ import _demo_scene


def reduce_variants():
    rng = np.random.default_rng(0)
    n = 100_000
    kcap = 1344 * 1024
    capacity = 1216 * 1024
    kept = 1_130_000
    cot9 = jnp.asarray(rng.normal(size=(9, kcap)).astype(np.float32))
    eid = np.full(kcap, capacity, np.int32)
    eid[:kept] = rng.permutation(kept).astype(np.int32)
    eid = jnp.asarray(eid)
    counts = rng.integers(0, 23, size=n).astype(np.int32)
    gstart = jnp.asarray(
        np.concatenate([[0], np.cumsum(counts)[:-1]]).astype(np.int32))
    gcount = jnp.asarray(counts)
    k = kcap

    def v_current(c, s):
        ops = (eid,) + tuple(c[i] + s for i in range(9))
        srt = jax.lax.sort(ops, num_keys=1)
        vals = jnp.stack(srt[1:], axis=1)
        cs = _blocked_cumsum(vals)
        csz = jnp.concatenate([jnp.zeros((1, 9), jnp.float32), cs], axis=0)
        lo = jnp.clip(gstart, 0, k)
        hi = jnp.clip(gstart + gcount, 0, k)
        return ((csz[hi] - csz[lo]).T).sum()

    def v_transposed(c, s):
        ops = (eid,) + tuple(c[i] + s for i in range(9))
        srt = jax.lax.sort(ops, num_keys=1)
        vals = jnp.stack(srt[1:], axis=0)                 # (9, K)
        csT = _blocked_cumsum(vals.T).T                   # scan along K
        csz = jnp.concatenate([jnp.zeros((9, 1), jnp.float32), csT], axis=1)
        lo = jnp.clip(gstart, 0, k)
        hi = jnp.clip(gstart + gcount, 0, k)
        return (csz[:, hi] - csz[:, lo]).sum()

    def v_percol(c, s):
        ops = (eid,) + tuple(c[i] + s for i in range(9))
        srt = jax.lax.sort(ops, num_keys=1)
        lo = jnp.clip(gstart, 0, k)
        hi = jnp.clip(gstart + gcount, 0, k)
        acc = 0.0
        for col in srt[1:]:
            cs = _blocked_cumsum(col)
            csz = jnp.concatenate([jnp.zeros((1,), jnp.float32), cs])
            acc = acc + (csz[hi] - csz[lo]).sum()
        return acc

    for name, fn in [("A reduce (K,9) current", v_current),
                     ("A reduce (9,K) transp ", v_transposed),
                     ("A reduce per-column   ", v_percol)]:
        def body(carry, s, fn=fn):
            c, acc = carry
            return (c, acc + fn(c, s * 1e-30))
        ms = chain(lambda b=body: b, (cot9, jnp.zeros(())), iters=8, reps=2)
        print(f"  {name} {ms:7.2f} ms", flush=True)


def bwd_split_and_cull():
    params, state, cam = _demo_scene(n=100_000, w=800, h=800, sh_degree=3)
    alive = state.alive
    gt = jnp.zeros((3, 800, 800))
    base = rast.RasterizeSettings(
        capacity=1216 * 1024, max_per_tile=2048, chunk=128,
        backend="pallas", fast_sort=True, tight_culling=True,
        packed_capacity=1344 * 1024)

    from neuralgaussiansplatting_tpu.models import gaussians as gm
    from neuralgaussiansplatting_tpu.ops import sh as sh_ops

    def geom_only_body(st):
        m3c, scc, roc, opc = (params.xyz, gm.get_scaling(params),
                              gm.get_rotation(params),
                              gm.get_opacity(params, alive))
        col0 = sh_ops.sh_to_rgb_color(3, gm.get_features(params), params.xyz,
                                      cam.campos)

        def body(carry, s):
            (m3, sc, ro, op), acc = carry

            def loss(m3, sc, ro, op):
                out = rast.rasterize(m3, sc, ro, op, None, 0, cam,
                                     jnp.zeros(3), st, colors_precomp=col0)
                return losses.photometric_loss(out.color, gt + s, 0.2)
            g = jax.grad(loss, argnums=(0, 1, 2, 3))(m3, sc, ro, op)
            new = tuple(a - 1e-30 * b for a, b in zip((m3, sc, ro, op), g))
            return (new, acc)
        return body, ((m3c, scc, roc, opc), jnp.zeros(()))

    def full_body(st):
        def body(p, s):
            def loss(p):
                out = render(cam, p, alive, 3, jnp.zeros(3), st)
                return losses.photometric_loss(out["render"], gt + s, 0.2)
            _, g = jax.value_and_grad(loss)(p)
            return jax.tree.map(lambda a, b: a - 1e-30 * b, p, g)
        return body, params

    rows = [
        ("B geom-only bwd (SH out)",) + geom_only_body(base),
        ("C cull+kcap1152 full    ",) + full_body(dataclasses.replace(
            base, precise_cull=True, packed_capacity=1152 * 1024)),
        ("C cull+kcap1152+cap1184 ",) + full_body(dataclasses.replace(
            base, precise_cull=True, capacity=1184 * 1024,
            packed_capacity=1152 * 1024)),
    ]
    for name, body, x0 in rows:
        ms = chain(lambda b=body: b, x0, iters=8, reps=2)
        print(f"  {name} {ms:7.2f} ms", flush=True)


def remat_variants():
    """Does jax.checkpoint (remat) around the geometry preprocess fix the
    pathological EWA backward?"""
    import functools
    from neuralgaussiansplatting_tpu.ops import preprocess as pp
    from neuralgaussiansplatting_tpu.ops import projection as proj
    params, state, cam = _demo_scene(n=100_000, w=800, h=800, sh_degree=3)
    alive = state.alive
    gt = jnp.zeros((3, 800, 800))
    base = rast.RasterizeSettings(
        capacity=1216 * 1024, max_per_tile=2048, chunk=128,
        backend="pallas", fast_sort=True, tight_culling=True,
        precise_cull=True, packed_capacity=1152 * 1024)

    orig = pp._cov2d_components

    def run(tag, patch):
        if patch == "remat_cov":
            pp._cov2d_components = jax.checkpoint(orig, static_argnums=(8,))
        elif patch == "remat_cov_dots":
            pol = jax.checkpoint_policies.checkpoint_dots
            pp._cov2d_components = jax.checkpoint(orig, policy=pol,
                                                  static_argnums=(8,))
        else:
            pp._cov2d_components = orig

        def body(p, s):
            def loss(p):
                out = render(cam, p, alive, 3, jnp.zeros(3), base)
                return losses.photometric_loss(out["render"], gt + s, 0.2)
            _, g = jax.value_and_grad(loss)(p)
            return jax.tree.map(lambda a, b: a - 1e-30 * b, p, g)
        ms = chain(lambda: body, params, iters=8, reps=2)
        print(f"  D {tag:22s} {ms:7.2f} ms", flush=True)
        pp._cov2d_components = orig

    run("baseline (cull+kcap)", None)
    run("remat cov2d", "remat_cov")
    run("remat cov2d dots", "remat_cov_dots")




def kernel_iso():
    """Isolated fwd/bwd Pallas blend kernel cost at the bench shape (fixed
    packed buffers; binning outside the loop)."""
    import functools
    from neuralgaussiansplatting_tpu.ops import blend_pallas as bp
    from neuralgaussiansplatting_tpu.ops import preprocess as pp
    from neuralgaussiansplatting_tpu.models import gaussians as gm
    from neuralgaussiansplatting_tpu.ops import binning as binning_mod

    params, state, cam = _demo_scene(n=100_000, w=800, h=800, sh_degree=3)
    kcap = 1152 * 1024
    pre = jax.jit(lambda p: pp.preprocess_gaussians(
        p.xyz, gm.get_scaling(p), gm.get_rotation(p),
        gm.get_opacity(p, state.alive), gm.get_features(p), 3, cam, 16, 16,
        tight=True))(params)
    inst = jax.jit(functools.partial(
        binning_mod.bin_gaussians, tiles_x=50, tiles_y=50,
        capacity=1216 * 1024, max_per_tile=2048, align=128, pack_keys=True,
        packed_capacity=kcap, precise_cull=True, block_x=16, block_y=16,
        width=800, height=800))(pre)
    packed_all = bp.pack_instance_attrs_t(pre.means2d, pre.conic,
                                          pre.opacity, pre.rgb)
    packed9 = packed_all[:, inst.gid]
    packed = jnp.concatenate(
        [packed9, jnp.zeros((bp.PROWS - 9, kcap), jnp.float32)], axis=0)
    packed = jnp.asarray(np.asarray(packed))
    ts_, tc_ = inst.tile_start, inst.tile_count
    cfg = dict(num_tiles=2500, ch=128, pix=256, block_x=16, block_y=16,
               tiles_x=50, interpret=False, track_contrib=True)

    raw = jax.jit(lambda p: bp._fwd_call(p, ts_, tc_, **cfg))(packed)
    raw = jnp.asarray(np.asarray(raw))
    cot = jnp.ones_like(raw) * 1e-3

    def fwd_body(carry, s):
        p, acc = carry
        r = bp._fwd_call(p + s, ts_, tc_, **cfg)
        return (p, acc + r.sum())

    def bwd_body(carry, s):
        p, acc = carry
        g = bp._bwd_call(p + s, raw, cot, ts_, tc_, **cfg)
        return (p, acc + g.sum())

    for name, body in [("E fwd kernel iso", fwd_body),
                       ("E bwd kernel iso", bwd_body)]:
        ms = chain(lambda b=body: b, (packed, jnp.zeros(())), iters=8, reps=2)
        print(f"  {name} {ms:7.2f} ms", flush=True)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "reduce"):
        reduce_variants()
    if which in ("all", "bwd"):
        bwd_split_and_cull()
    if which in ("remat",):
        remat_variants()
    if which in ("kernel",):
        kernel_iso()
