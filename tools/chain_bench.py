#!/usr/bin/env python
"""Chained-iteration benchmark: trustworthy per-step device time.

Over the axon tunnel, per-call dispatch/sync latency (~30 ms) dwarfs many
stages and `block_until_ready` can return before execution, so per-call
timing is unreliable (see .claude/skills/verify).  This harness chains N
steps *inside one jit* via ``lax.fori_loop`` with a real data dependency
(the carry feeds the next step), syncs once, subtracts a 1-step run, and
divides — pure device throughput.

Usage: python tools/chain_bench.py [classic_fb|classic_fwd1080|neural_fb|...]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def chain(make_body, x0, iters=8, reps=3):
    """make_body: () -> (body: (carry, eps) -> carry). Returns per-iter ms.

    ``eps`` is a tiny per-iteration float (i * 1e-30) the body should fold
    into its inputs so XLA cannot collapse the loop.
    """
    import jax
    import jax.flatten_util
    import jax.numpy as jnp
    from jax import lax

    body = make_body()

    @jax.jit
    def run(x, s, n):
        def step(i, x):
            return body(x, s + i.astype(jnp.float32) * 1e-30)
        out = lax.fori_loop(0, n, step, x)
        # Checksum must consume every carry leaf or XLA DCEs whole branches
        # of the loop body (e.g. leaves the updates never reach).
        return sum(jnp.sum(l.ravel()[::max(1, l.size // 64)].astype(
            jnp.float32)) for l in jax.tree.leaves(out))

    float(run(x0, 0.0, iters))
    float(run(x0, 0.0, 1))

    def t(s, n):
        t0 = time.perf_counter()
        float(run(x0, float(s), n))
        return time.perf_counter() - t0

    tn = min(t(r + 1, iters) for r in range(reps))
    t1 = min(t(r + 9, 1) for r in range(reps))
    return (tn - t1) / (iters - 1) * 1e3


def main():
    import jax
    import jax.numpy as jnp
    from neuralgaussiansplatting_tpu.gaussian_renderer import (
        render, render2, init_decoders)
    from neuralgaussiansplatting_tpu.ops import rasterize as rast
    from neuralgaussiansplatting_tpu.utils import losses
    from __graft_entry__ import _demo_scene

    which = sys.argv[1] if len(sys.argv) > 1 else "classic_fb"

    if which == "classic_fb":
        params, state, cam = _demo_scene(n=100_000, w=800, h=800, sh_degree=3)
        settings = rast.RasterizeSettings(
            capacity=1216 * 1024, max_per_tile=2048, chunk=128,
            backend="pallas", fast_sort=True, tight_culling=True,
            precise_cull=True, packed_capacity=1152 * 1024)
        gt = jnp.zeros((3, 800, 800))
        alive = state.alive

        def make_body():
            def body(p, s):
                def loss(p):
                    out = render(cam, p, alive, 3, jnp.zeros(3), settings)
                    return losses.photometric_loss(out["render"], gt + s, 0.2)
                _, g = jax.value_and_grad(loss)(p)
                return jax.tree.map(lambda a, b: a - 1e-30 * b, p, g)
            return body

        t = chain(make_body, params, iters=8)
        print("classic fwd+bwd 800^2 100k SH3: %7.1f ms  (%5.2f Mpix/s)"
              % (t, 800 * 800 / t / 1e3), flush=True)

    elif which in ("classic_fb_seq", "classic_fwd_seq"):
        params, state, cam = _demo_scene(n=100_000, w=800, h=800, sh_degree=3)
        settings = rast.RasterizeSettings(
            block_x=32, block_y=32, capacity=512 * 1024, max_per_tile=4096,
            chunk=128, backend="seq", fast_sort=True, tight_culling=True,
            precise_cull=True, packed_capacity=512 * 1024)
        gt = jnp.zeros((3, 800, 800))
        alive = state.alive

        if which == "classic_fb_seq":
            def make_body():
                def body(p, s):
                    def loss(p):
                        out = render(cam, p, alive, 3, jnp.zeros(3), settings)
                        return losses.photometric_loss(out["render"], gt + s,
                                                       0.2)
                    _, g = jax.value_and_grad(loss)(p)
                    return jax.tree.map(lambda a, b: a - 1e-30 * b, p, g)
                return body

            t = chain(make_body, params, iters=8)
            print("seq fwd+bwd 800^2 100k SH3:   %7.1f ms  (%5.2f Mpix/s)"
                  % (t, 800 * 800 / t / 1e3), flush=True)
        else:
            def make_body():
                def body(carry, s):
                    # dependency through xyz: preprocess/binning/sort provably
                    # inside the loop (a bg-only dependency leaves them
                    # loop-invariant and hoistable)
                    p, fb = carry
                    out = render(
                        cam, p._replace(xyz=p.xyz + (1e-30 * jnp.mean(fb) + s)),
                        alive, 3, jnp.zeros(3), settings)
                    return (p, out["render"])
                return body

            fb0 = jnp.zeros((3, 800, 800))
            t = chain(make_body, (params, fb0), iters=8)
            print("seq fwd 800^2 100k SH3:       %7.1f ms  (%5.2f Mpix/s)"
                  % (t, 800 * 800 / t / 1e3), flush=True)

    elif which == "classic_fwd1080_seq":
        params, state, cam = _demo_scene(n=100_000, w=1920, h=1080,
                                         sh_degree=3)
        settings = rast.RasterizeSettings(
            block_x=32, block_y=32, capacity=1 << 21, max_per_tile=8192,
            chunk=128, backend="seq", fast_sort=True, tight_culling=True,
            precise_cull=True, packed_capacity=1 << 21,
            track_contrib=False)
        alive = state.alive

        def make_body():
            def body(carry, s):
                # dependency through xyz (see classic_fwd_seq note)
                p, fb = carry
                out = render(
                    cam, p._replace(xyz=p.xyz + (1e-30 * jnp.mean(fb) + s)),
                    alive, 3, jnp.zeros(3), settings)
                return (p, out["render"])
            return body

        fb0 = jnp.zeros((3, 1080, 1920))
        t = chain(make_body, (params, fb0), iters=8)
        print("seq fwd 1080p 100k SH3:       %7.1f ms  (%5.2f fps)"
              % (t, 1000 / t), flush=True)

    elif which == "classic_fwd1080":
        params, state, cam = _demo_scene(n=100_000, w=1920, h=1080,
                                         sh_degree=3)
        settings = rast.RasterizeSettings(
            capacity=1 << 22, max_per_tile=2048, chunk=128,
            backend="pallas", fast_sort=True, tight_culling=True)
        alive = state.alive

        def make_body():
            def body(carry, s):
                # dependency through xyz (see classic_fwd_seq note)
                p, fb = carry
                out = render(
                    cam, p._replace(xyz=p.xyz + (1e-30 * jnp.mean(fb) + s)),
                    alive, 3, jnp.zeros(3), settings)
                return (p, out["render"])
            return body

        fb0 = jnp.zeros((3, 1080, 1920))
        t = chain(make_body, (params, fb0), iters=8)
        print("classic fwd 1080p 100k SH3:     %7.1f ms  (%5.2f fps)"
              % (t, 1000 / t), flush=True)

    elif which in ("neural_fb", "neural_fb_bf16"):
        dtype = jnp.bfloat16 if which.endswith("bf16") else jnp.float32
        params, state, cam = _demo_scene(n=100_000, w=800, h=800, sh_degree=1)
        net_params = init_decoders(jax.random.PRNGKey(0))
        gt = jnp.zeros((3, 800, 800))

        def make_body():
            def body(carry, s):
                p, np_ = carry
                def loss(p, np_):
                    out = render2(cam, p, np_, capacity=1 << 21, dtype=dtype)
                    return losses.photometric_loss(out["render"], gt + s, 0.2)
                _, (gp, gn) = jax.value_and_grad(loss, argnums=(0, 1))(p, np_)
                return (jax.tree.map(lambda a, b: a - 1e-30 * b, p, gp),
                        jax.tree.map(lambda a, b: a - 1e-30 * b, np_, gn))
            return body

        t = chain(make_body, (params, net_params), iters=6)
        print("neural2 fwd+bwd 800^2 (%s): %7.1f ms  (%5.2f Mpix/s)"
              % (dtype.__name__, t, 800 * 800 / t / 1e3), flush=True)

    else:
        raise SystemExit(f"unknown config {which}")


if __name__ == "__main__":
    main()
