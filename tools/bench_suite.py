#!/usr/bin/env python
"""Extended benchmark suite (one JSON line per metric).

Covers the BASELINE.md milestone configs that fit on one chip:
- config-1 scale: 256x256 / 10k Gaussians forward+backward
- config-2 scale: 800x800 / 100k Gaussians forward+backward (train step)
- 1080p forward-only render rate (the reference's >=30 fps headline)
- neural path (idxmap + UNet/CNN/denoise) forward+backward at 800x800

Run on the target hardware: `python tools/bench_suite.py`.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bench(f, *a, iters=10):
    import jax
    r = f(*a)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = f(*a)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / iters


def main():
    import jax
    import jax.numpy as jnp
    from neuralgaussiansplatting_tpu.gaussian_renderer import render, render2, init_decoders
    from neuralgaussiansplatting_tpu.ops import rasterize as rast
    from neuralgaussiansplatting_tpu.utils import losses
    from __graft_entry__ import _demo_scene

    results = []

    def emit(metric, value, unit, baseline=None):
        rec = {"metric": metric, "value": round(value, 3), "unit": unit}
        if baseline:
            rec["vs_baseline"] = round(value / baseline, 4)
        results.append(rec)
        print(json.dumps(rec), flush=True)

    # --- config 1: 256x256, 10k, SH0 fwd+bwd --------------------------------
    params, state, cam = _demo_scene(n=10_000, w=256, h=256, sh_degree=0)
    settings = rast.RasterizeSettings(capacity=1 << 19, max_per_tile=2048,
                                      chunk=128, backend="pallas")
    gt = jnp.zeros((3, 256, 256))

    @jax.jit
    def fb1(p, a):
        def loss(p):
            out = render(cam, p, a, 0, jnp.zeros(3), settings)
            return losses.photometric_loss(out["render"], gt, 0.2)
        return jax.value_and_grad(loss)(p)

    dt = bench(fb1, params, state.alive)
    emit("fwd+bwd 256x256 10k SH0", 256 * 256 / dt / 1e6, "Mpix/s")

    # --- config 2: 800x800, 100k, SH3 fwd+bwd -------------------------------
    params, state, cam = _demo_scene(n=100_000, w=800, h=800, sh_degree=3)
    settings = rast.RasterizeSettings(capacity=1 << 21, max_per_tile=2048,
                                      chunk=128, backend="pallas")
    gt = jnp.zeros((3, 800, 800))

    @jax.jit
    def fb2(p, a):
        def loss(p):
            out = render(cam, p, a, 3, jnp.zeros(3), settings)
            return losses.photometric_loss(out["render"], gt, 0.2)
        return jax.value_and_grad(loss)(p)

    dt = bench(fb2, params, state.alive)
    emit("fwd+bwd 800x800 100k SH3", 800 * 800 / dt / 1e6, "Mpix/s",
         baseline=1920 * 1080 * 30 / 1e6)

    # --- 1080p forward-only fps (reference headline: >=30 fps) --------------
    params, state, cam = _demo_scene(n=100_000, w=1920, h=1080, sh_degree=3)
    settings = rast.RasterizeSettings(capacity=1 << 22, max_per_tile=2048,
                                      chunk=128, backend="pallas")

    @jax.jit
    def fwd1080(p, a):
        return render(cam, p, a, 3, jnp.zeros(3), settings)["render"]

    dt = bench(fwd1080, params, state.alive)
    emit("forward 1080p 100k SH3", 1.0 / dt, "fps", baseline=30.0)

    # --- neural path (sw=2) 800x800 fwd+bwd ---------------------------------
    params, state, cam = _demo_scene(n=100_000, w=800, h=800, sh_degree=1)
    net_params = init_decoders(jax.random.PRNGKey(0))
    gt = jnp.zeros((3, 800, 800))

    @jax.jit
    def fbn(p, np_, a):
        def loss(p, np_):
            out = render2(cam, p, np_, capacity=1 << 21)
            return losses.photometric_loss(out["render"], gt, 0.2)
        return jax.value_and_grad(loss, argnums=(0, 1))(p, np_)

    dt = bench(fbn, params, net_params, state.alive, iters=5)
    emit("neural sw2 fwd+bwd 800x800 100k", 800 * 800 / dt / 1e6, "Mpix/s")

    with open("bench_suite_results.json", "w") as f:
        json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
