#!/usr/bin/env python
"""Chained micro-timings of the neural (sw2) pipeline stages at 800².

Rows isolate: the idxmap z-buffer pass, the featuremap assembly, each
screen-space decoder (UNet / CNN kernel-predictor / dynamic denoise), and
the fused fwd+bwd train step — the sw2 throughput budget (reference
render2 path, gaussian_renderer/__init__.py:214-323).

Usage: python tools/exp_neural_micro.py [row ids]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/ngs-jax-cache")

import jax
import jax.numpy as jnp

from tools.chain_bench import chain
from neuralgaussiansplatting_tpu import gaussian_renderer as gr
from neuralgaussiansplatting_tpu.models import nets
from neuralgaussiansplatting_tpu.ops import idxmap as idxmap_ops
from neuralgaussiansplatting_tpu.train import neural_loop, optim
from neuralgaussiansplatting_tpu.utils import losses
from __graft_entry__ import _demo_scene


def sums(*arrs):
    return sum(jnp.sum(a.astype(jnp.float32)) for a in arrs)


def main():
    w = h = 800
    capacity = 1 << 22       # XLA oracle: PIXEL instances (~4M at this scale)
    tcap = 1 << 19           # tiled backend: TILE instances (~25x fewer)
    params, state, cam = _demo_scene(n=100_000, w=w, h=h, sh_degree=3)
    alive = state.alive
    net_params = gr.init_decoders(jax.random.PRNGKey(0))
    gt = jnp.zeros((3, h, w))

    def r_idx_xla(p, s):
        idx, depth, num_inst = idxmap_ops.compute_idxmap(
            p.xyz + s, cam, capacity, alive)
        return sums(idx, depth) + num_inst

    def r_idx_tiled(p, s):
        from neuralgaussiansplatting_tpu.ops.zbuffer_pallas import (
            compute_idxmap_tiled)
        idx, depth, num_inst = compute_idxmap_tiled(
            p.xyz + s, cam, tcap, alive)
        return sums(idx, depth) + num_inst

    def r_maps(p, s):
        maps = idxmap_ops.render_idxmaps(p.xyz + s, p.features, cam,
                                         tcap, alive)
        return sums(maps.idxmap, maps.featuremap, maps.depthmap)

    def r_unet(p, s):
        maps = idxmap_ops.render_idxmaps(p.xyz + s, p.features, cam,
                                         tcap, alive)
        return sums(nets.UNet().apply(net_params["unet"], maps.featuremap))

    def r_cnn(p, s):
        maps = idxmap_ops.render_idxmaps(p.xyz + s, p.features, cam,
                                         tcap, alive)
        return sums(nets.CNN().apply(net_params["cnn"], maps.featuremap))

    def r_full2(p, s):
        out = gr.render2(cam, p._replace(xyz=p.xyz + s), net_params,
                         tcap, alive=alive)
        return sums(out["render"])

    rows = [("idxmap xla", r_idx_xla), ("idxmap tiled", r_idx_tiled),
            ("maps (tiled)", r_maps),
            ("maps+unet", r_unet), ("maps+cnn", r_cnn),
            ("full render2 fwd", r_full2)]

    sel = [a for a in sys.argv[1:] if not a.startswith("-")]
    for i, (name, fn) in enumerate(rows):
        if sel and str(i) not in sel:
            continue
        t = chain(lambda f=fn: (lambda carry, s: (
            carry[0], carry[1] + f(carry[0], s) * 1e-30)),
            (params, jnp.zeros(())), iters=6, reps=2)
        print(f"  [{i}] {name:20s} {t:8.2f} ms", flush=True)

    if not sel or "6" in sel:
        # fused fwd+bwd train step (the bench_suite neural_fb config)
        opt = optim.OptimizationParams()
        trainer = neural_loop.NeuralTrainer(
            _FakeModel(params, state), sw=2, opt=opt, capacity=tcap)

        def make_body():
            def body(carry, s):
                ts, acc = carry
                ts2, metrics = neural_loop.neural_train_step(
                    ts, cam, gt + s, sw=2, capacity=tcap,
                    txs=trainer.txs, lambda_dssim=opt.lambda_dssim)
                return (ts2, acc + metrics["loss"] * 1e-30)
            return body

        t = chain(make_body, (trainer.ts, jnp.zeros(())), iters=6, reps=2)
        print(f"  [6] {'sw2 fwd+bwd step':20s} {t:8.2f} ms "
              f"({w * h / t / 1e3:.2f} Mpix/s)", flush=True)


class _FakeModel:
    def __init__(self, params, state):
        self.params = params
        self.state = state


if __name__ == "__main__":
    main()
