"""Benchmark: fused forward+backward throughput of the tile rasterizer.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

North-star metric (BASELINE.md): Mpixels/s of a full render+backward step per
chip. The reference's in-tree claim is >= 30 fps @ 1080p *forward-only* on an
RTX-class GPU; a fwd+bwd training step at 30 fps/1080p corresponds to
1920*1080*30 / 1e6 = 62.2 Mpix/s, which we use as the baseline denominator.
"""

import json
import math
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from neuralgaussiansplatting_tpu.gaussian_renderer import render
    from neuralgaussiansplatting_tpu.models import gaussians as gm
    from neuralgaussiansplatting_tpu.ops import rasterize as rast
    from neuralgaussiansplatting_tpu.utils import losses
    from __graft_entry__ import _demo_scene

    W = H = 800  # NeRF-synthetic lego resolution (config 2)
    N = 100_000
    params, state, cam = _demo_scene(n=N, w=W, h=H, sh_degree=3)
    settings = rast.RasterizeSettings(capacity=1216 * 1024, max_per_tile=2048,
                                      chunk=128, backend="pallas",
                                      fast_sort=True, tight_culling=True,
                                      packed_capacity=1344 * 1024)
    bg = jnp.zeros(3, jnp.float32)
    gt = jnp.zeros((3, H, W), jnp.float32)

    @jax.jit
    def fwd_bwd(params, alive):
        def loss_fn(p):
            out = render(cam, p, alive, 3, bg, settings)
            return losses.photometric_loss(out["render"], gt, 0.2)
        loss, grads = jax.value_and_grad(loss_fn)(params)
        return loss, grads

    # warmup / compile
    loss, grads = fwd_bwd(params, state.alive)
    jax.block_until_ready(loss)

    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        loss, grads = fwd_bwd(params, state.alive)
    jax.block_until_ready(loss)
    dt = (time.perf_counter() - t0) / iters

    mpix_s = (W * H / dt) / 1e6
    baseline = 1920 * 1080 * 30 / 1e6  # 62.2 Mpix/s (see module docstring)
    print(json.dumps({
        "metric": "render+backward throughput (800x800, 100k gaussians, SH3)",
        "value": round(mpix_s, 3),
        "unit": "Mpix/s",
        "vs_baseline": round(mpix_s / baseline, 4),
    }))


if __name__ == "__main__":
    main()
