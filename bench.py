"""Benchmark: fused forward+backward throughput of the tile rasterizer.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

North-star metric (BASELINE.md): Mpixels/s of a full render+backward step per
chip. The reference's in-tree claim is >= 30 fps @ 1080p *forward-only* on an
RTX-class GPU; a fwd+bwd training step at 30 fps/1080p corresponds to
1920*1080*30 / 1e6 = 62.2 Mpix/s, which we use as the baseline denominator.

Timing methodology: N steps chained inside one jit via ``lax.fori_loop``
(each step's params perturbed by the previous step's gradients so nothing is
loop-invariant), one host sync, minus a 1-step run — pure device throughput,
free of the host-tunnel dispatch latency (see tools/chain_bench.py).
"""

import json
import time


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax
    from neuralgaussiansplatting_tpu.gaussian_renderer import render
    from neuralgaussiansplatting_tpu.ops import rasterize as rast
    from neuralgaussiansplatting_tpu.utils import losses
    from __graft_entry__ import _demo_scene

    W = H = 800  # NeRF-synthetic lego resolution (config 2)
    N = 100_000
    params, state, cam = _demo_scene(n=N, w=W, h=H, sh_degree=3)
    # Sequential-instance 32x32-tile path (ops/blend_seq.py): 2.4x fewer
    # duplicated instances than 16x16 binning and scan-free blend kernels.
    settings = rast.RasterizeSettings(block_x=32, block_y=32,
                                      capacity=512 * 1024, max_per_tile=4096,
                                      chunk=128, backend="seq",
                                      fast_sort=True, tight_culling=True,
                                      precise_cull=True,
                                      packed_capacity=512 * 1024)
    bg = jnp.zeros(3, jnp.float32)
    gt = jnp.zeros((3, H, W), jnp.float32)
    alive = state.alive

    def step(p, s):
        def loss_fn(p):
            out = render(cam, p, alive, 3, bg, settings)
            return losses.photometric_loss(out["render"], gt + s, 0.2)
        _, grads = jax.value_and_grad(loss_fn)(p)
        return jax.tree.map(lambda a, b: a - 1e-30 * b, p, grads)

    @jax.jit
    def run(p, s, n):
        def body(i, p):
            return step(p, s + i.astype(jnp.float32) * 1e-30)
        out = lax.fori_loop(0, n, body, p)
        return sum(jnp.sum(l.ravel()[::max(1, l.size // 64)])
                   for l in jax.tree.leaves(out))

    iters = 10
    float(run(params, 0.0, iters))
    float(run(params, 0.0, 1))

    def timed(s, n):
        t0 = time.perf_counter()
        float(run(params, float(s), n))
        return time.perf_counter() - t0

    tn = min(timed(r + 1, iters) for r in range(3))
    t1 = min(timed(r + 9, 1) for r in range(3))
    dt = (tn - t1) / (iters - 1)

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
