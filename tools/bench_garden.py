#!/usr/bin/env python
"""Garden-regime benchmark: multi-million-Gaussian 1080p render + train step
(BASELINE config-4 structure; reference README.md:74-75 claims millions of
Gaussians in 24 GB for Mip-NeRF360-scale scenes).

Builds a synthetic scene with n_alive Gaussians scaled so the 1080p instance
demand lands in the multi-million range, then reports:
  - forward 1080p ms/fps,
  - fused fwd+bwd train-step ms / Mpix/s,
  - demand monitors (num_rendered / aligned / culled / dropped),
at garden-scale capacities. Chained-timing methodology (tools/chain_bench).

Usage: python tools/bench_garden.py [n_gaussians] [dense_cap] [--fwd-only]
           [--scatter]  (legacy run-length-scatter expansion + 16x16 pallas)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/ngs-jax-cache")

import json

import jax
import jax.numpy as jnp
import numpy as np

from tools.chain_bench import chain
from neuralgaussiansplatting_tpu.gaussian_renderer import render
from neuralgaussiansplatting_tpu.ops import rasterize as rast
from neuralgaussiansplatting_tpu.utils import losses
from __graft_entry__ import _demo_scene


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("-")]
    n = int(args[0]) if args else 5_000_000
    dense_cap = int(args[1]) if len(args) > 1 else 6
    fwd_only = "--fwd-only" in sys.argv
    scatter = "--scatter" in sys.argv
    w, h = 1920, 1080

    # scale-adapted splat field: many small gaussians (trained garden-like
    # statistics — a few tiles each) rather than the 100k large-splat bench
    params, state, cam = _demo_scene(n=n, w=w, h=h, sh_degree=3, seed=3)
    # shrink scales so per-gaussian footprints stay small at 5M scale
    params = params._replace(
        scaling=params.scaling - 2.2)   # log-space: ~9x smaller splats
    alive = state.alive

    seqscatter = "--seqscatter" in sys.argv
    if seqscatter:
        # seq kernels + run-length expansion (owner-gid F=1 scatter + row
        # gather, ops/binning._expand_rows): the expansion costs O(N) but
        # the sort domain is the true instance capacity (2^23) instead of
        # the dense layout's n*dense_cap (2^25 after pow2 padding) — the
        # [tile|depth] sort is ~70% of the dense-mode forward at 5M.
        probe = rast.make_settings(
            "seq", capacity=1 << 24, max_per_tile=8192, fast_sort=True,
            tight_culling=True, precise_cull=False, expand="scatter")
    elif scatter:
        probe = rast.RasterizeSettings(
            capacity=1 << 24, max_per_tile=4096, chunk=128, backend="pallas",
            fast_sort=True, tight_culling=True, precise_cull=True)
    else:
        # seq (32x32) + dense capped expansion: no O(N) scatter; the sort
        # domain is n * dense_cap and clipping beyond the cap is counted.
        # precise_cull off: at garden statistics (tiny splats, ~1.2 tiles
        # each) it culls ~1.4% of instances but its relabel bookkeeping
        # costs ~130 ms over the 30M-slot domain — a clear loss here
        # (measured round 4; it stays on for the 800p-class configs where
        # it removes ~11% for ~2 ms).
        probe = rast.make_settings(
            "seq", capacity=1 << 20, max_per_tile=8192, fast_sort=True,
            tight_culling=True, precise_cull=False, expand="dense",
            dense_cap=dense_cap)
    out = jax.jit(lambda p: render(cam, p, alive, 3, jnp.zeros(3), probe)
                  )(params)
    nr = int(out["num_rendered"])
    ademand = int(out["aligned_demand"])
    culled = int(out["culled"])
    cap = 1 << max(int(nr * 1.15).bit_length(), 1)
    kcap = ((int(ademand * 1.05) // (1 << 17)) + 1) * (1 << 17)
    if seqscatter:
        import dataclasses
        settings = dataclasses.replace(probe, capacity=cap,
                                       packed_capacity=kcap)
    elif scatter:
        settings = rast.RasterizeSettings(
            capacity=cap, max_per_tile=4096, chunk=128, backend="pallas",
            fast_sort=True, tight_culling=True, precise_cull=True,
            packed_capacity=kcap)
    else:
        import dataclasses
        settings = dataclasses.replace(probe, packed_capacity=kcap)
    out = jax.jit(lambda p: render(cam, p, alive, 3, jnp.zeros(3), settings)
                  )(params)
    mon = {k: int(out[k]) for k in
           ("num_rendered", "aligned_demand", "culled", "dropped",
            "max_per_tile")}

    def fwd_body(carry, s):
        # the dependency flows through xyz so EVERY stage (preprocess,
        # binning, sort, blend) is provably inside the loop — a bg-only
        # dependency leaves preprocess+binning loop-invariant and
        # vulnerable to hoisting
        p, fb = carry
        o = render(cam, p._replace(xyz=p.xyz + (1e-30 * jnp.mean(fb) + s)),
                   alive, 3, jnp.zeros(3), settings)
        return (p, o["render"])

    fb0 = jnp.zeros((3, h, w))
    t_fwd = chain(lambda: fwd_body, (params, fb0), iters=6, reps=2)

    result = {
        "n_gaussians": n, "resolution": f"{w}x{h}",
        "monitors": mon, "capacity": cap, "packed_capacity": kcap,
        "fwd_ms": round(t_fwd, 2), "fwd_fps": round(1000.0 / t_fwd, 2),
    }
    if not fwd_only:
        gt = jnp.zeros((3, h, w))

        def fb_body(p, s):
            def loss(p):
                o = render(cam, p, alive, 3, jnp.zeros(3), settings)
                return losses.photometric_loss(o["render"], gt + s, 0.2)
            _, g = jax.value_and_grad(loss)(p)
            return jax.tree.map(lambda a, b: a - 1e-30 * b, p, g)

        t_fb = chain(lambda: fb_body, params, iters=4, reps=2)
        result["fwdbwd_ms"] = round(t_fb, 2)
        result["fwdbwd_mpix_s"] = round(w * h / t_fb / 1e3, 2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
