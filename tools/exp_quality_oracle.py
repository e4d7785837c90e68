#!/usr/bin/env python
"""GT-recovery oracle for the training-quality gap (round-4 directive).

The quality-proof scene's GT images are renders of a KNOWN 40k-Gaussian
mixture (tools/make_demo_scene.py gt_gaussians, deterministic seed) — the
model class can represent the scene exactly. This tool isolates WHY training
from a point-cloud init stops short:

  hold       init the trainer AT the GT parameters and run the FULL schedule
             (densify + opacity reset + SH warmup). If PSNR degrades, the
             schedule/optimizer is the bug.
  hold_pure  same init, schedule disabled (pure Adam). Separates optimizer
             noise from density-control churn.
  gtcloud    init from the GT point CLOUD (perfect positions + colors,
             standard scale/opacity init). Upper-bounds the densification
             contribution: how far does training get when only
             scales/opacities/SH must be recovered?
  sweep      short runs over densify_grad_threshold {1e-4, 2e-4, 4e-4}.

Usage: python tools/exp_quality_oracle.py [hold|hold_pure|gtcloud|sweep] \
           [--scene /tmp/q_scene] [--iters 2000]
"""

import json
import os
import sys
from argparse import ArgumentParser

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/ngs-jax-cache")

import numpy as np


def build_gt_params(sh_degree, capacity):
    """GaussianParams initialized exactly at the generator's GT mixture."""
    import jax.numpy as jnp
    from neuralgaussiansplatting_tpu.models import gaussians as gm
    from neuralgaussiansplatting_tpu.ops.sh import RGB2SH
    from neuralgaussiansplatting_tpu.utils.general import inverse_sigmoid
    from tools.make_demo_scene import gt_gaussians

    means, scales, rot, opac, colors = gt_gaussians(40000)
    n = means.shape[0]
    k = (sh_degree + 1) ** 2
    dc = np.asarray(RGB2SH(colors))

    def pad(a):
        return np.pad(a, [(0, capacity - n)] + [(0, 0)] * (a.ndim - 1))

    rotp = pad(rot)
    rotp[n:, 0] = 1.0
    params = gm.GaussianParams(
        xyz=jnp.asarray(pad(means)),
        normals=jnp.asarray(np.zeros((capacity, 3), np.float32)),
        features_dc=jnp.asarray(pad(dc.astype(np.float32))),
        features_rest=jnp.asarray(
            np.zeros((capacity, 3 * (k - 1)), np.float32)),
        features=jnp.asarray(
            np.zeros((capacity, gm.NUM_NEURAL_FEATURES), np.float32)),
        scaling=jnp.asarray(pad(np.log(scales).astype(np.float32))),
        rotation=jnp.asarray(rotp.astype(np.float32)),
        opacity=jnp.asarray(
            pad(np.asarray(inverse_sigmoid(opac[:, None]), np.float32))),
    )
    state = gm.GaussianState(
        alive=jnp.arange(capacity) < n,
        max_radii2d=jnp.zeros(capacity, jnp.float32),
        xyz_gradient_accum=jnp.zeros(capacity, jnp.float32),
        denom=jnp.zeros(capacity, jnp.float32),
    )
    return params, state


def evaluate(trainer, cams, settings, n_cams=8):
    import jax.numpy as jnp
    from neuralgaussiansplatting_tpu.gaussian_renderer import render
    from neuralgaussiansplatting_tpu.utils import losses

    psnrs = []
    for cam in cams[:n_cams]:
        out = render(cam.params(), trainer.ts.params, trainer.ts.gstate.alive,
                     trainer.gaussians.active_sh_degree, trainer.bg, settings)
        img = jnp.clip(out["render"], 0.0, 1.0)
        psnrs.append(float(losses.psnr(img, jnp.asarray(cam.image))))
    return float(np.mean(psnrs))


def run(mode, scene_dir, iters, thr=None):
    import jax.numpy as jnp
    from neuralgaussiansplatting_tpu.models import gaussians as gm
    from neuralgaussiansplatting_tpu.ops import rasterize as rast
    from neuralgaussiansplatting_tpu.scene.scene import Scene
    from neuralgaussiansplatting_tpu.train import loop, optim

    g = gm.GaussianModel(sh_degree=3)
    scene = Scene(scene_dir, f"/tmp/oracle_{mode}", g, eval_split=True)

    settings = rast.make_settings(
        "seq", capacity=1 << 20, max_per_tile=4096, tight_culling=True)
    opt_kw = {}
    if thr is not None:
        opt_kw["densify_grad_threshold"] = thr
    opt = optim.OptimizationParams(**opt_kw)

    if mode in ("hold", "hold_pure"):
        cap = 1 << 17
        g.params, g.state = build_gt_params(3, cap)
        g.spatial_lr_scale = scene.cameras_extent
    elif mode == "gtcloud":
        from tools.make_demo_scene import gt_gaussians
        from neuralgaussiansplatting_tpu.scene.dataset_readers import (
            BasicPointCloud)
        means, scales, rot, opac, colors = gt_gaussians(40000)
        pcd = BasicPointCloud(points=means, colors=colors,
                              normals=np.zeros_like(means))
        g.create_from_pcd(pcd, scene.cameras_extent, capacity=1 << 17)
    # default: whatever Scene loaded (points3d.ply init) — not used here

    trainer = loop.Trainer(gaussians=g, opt=opt, settings=settings,
                           cameras_extent=scene.cameras_extent)
    if mode == "hold_pure":
        trainer.auto_grow = False

    train_cams = scene.get_train_cameras()
    test_cams = scene.get_test_cameras()
    rng = np.random.default_rng(0)

    milestones = sorted({0, 200, 500, 1000, 2000, 3000, 5000, iters}
                        & set(range(0, iters + 1)))
    rows = []
    psnr0 = evaluate(trainer, test_cams, trainer.settings)
    alive0 = int(jnp.sum(trainer.ts.gstate.alive))
    rows.append({"iteration": 0, "psnr": round(psnr0, 2), "alive": alive0})
    print(f"[{mode}] iter 0: PSNR {psnr0:.2f} alive {alive0}", flush=True)

    stack = []
    gt_cache = {}
    for it in range(1, iters + 1):
        if not stack:
            stack = list(rng.permutation(len(train_cams)))
        cam = train_cams[stack.pop()]
        gt = gt_cache.get(cam.uid)
        if gt is None:
            gt = gt_cache[cam.uid] = jnp.asarray(cam.image)
        m = trainer.grad_step(cam.params(), gt, it)
        if it in milestones:
            psnr = evaluate(trainer, test_cams, trainer.settings)
            alive = int(jnp.sum(trainer.ts.gstate.alive))
            rows.append({"iteration": it, "psnr": round(psnr, 2),
                         "alive": alive,
                         "loss": round(float(m["loss"]), 5)})
            print(f"[{mode}] iter {it}: PSNR {psnr:.2f} alive {alive} "
                  f"loss {float(m['loss']):.5f}", flush=True)
        if mode != "hold_pure":
            trainer.apply_schedule(it, m)
    return rows


def main():
    ap = ArgumentParser()
    ap.add_argument("mode", nargs="?", default="hold")
    ap.add_argument("--scene", default="/tmp/q_scene")
    ap.add_argument("--iters", type=int, default=2000)
    args = ap.parse_args()

    if args.mode == "sweep":
        out = {}
        for thr in (1e-4, 2e-4, 4e-4):
            print(f"=== densify_grad_threshold {thr} ===", flush=True)
            out[str(thr)] = run("cloudinit_sweep", args.scene, args.iters,
                                thr=thr)
        print(json.dumps(out, indent=1))
    else:
        rows = run(args.mode, args.scene, args.iters)
        print(json.dumps({args.mode: rows}, indent=1))


if __name__ == "__main__":
    main()
