#!/usr/bin/env python
"""Render-rate benchmark on a TRAINED model (not the adversarial random
splat field of bench.py): loads a saved point_cloud.ply, autotunes
capacities from a demand probe, and reports chained 1080p forward fps plus
the fused train-step rate at the training resolution.

The reference's ">= 30 fps at 1080p" claim (README.md:14) is about trained
real scenes, whose instance demand and early-exit behavior differ from the
synthetic worst case by ~3x — this reports both sides honestly.

Usage: python tools/bench_trained_scene.py -m <model_dir> [--iteration N]
"""

import json
import math
import os
import sys
from argparse import ArgumentParser

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/ngs-jax-cache")


def main():
    ap = ArgumentParser()
    ap.add_argument("-m", "--model_path", required=True)
    ap.add_argument("--iteration", type=int, default=-1)
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from tools.chain_bench import chain
    from neuralgaussiansplatting_tpu.gaussian_renderer import render
    from neuralgaussiansplatting_tpu.models import gaussians as gm
    from neuralgaussiansplatting_tpu.ops import projection as proj
    from neuralgaussiansplatting_tpu.ops import rasterize as rast
    from neuralgaussiansplatting_tpu.ops.preprocess import CameraParams
    from neuralgaussiansplatting_tpu.utils import losses
    from neuralgaussiansplatting_tpu.scene.scene import search_for_max_iteration

    pc_dir = os.path.join(args.model_path, "point_cloud")
    it = (args.iteration if args.iteration > 0
          else search_for_max_iteration(pc_dir))
    ply = os.path.join(pc_dir, f"iteration_{it}", "point_cloud.ply")
    g = gm.GaussianModel(sh_degree=3)
    g.load_ply(ply)
    params, state = g.params, g.state
    n_alive = int(jnp.sum(state.alive))

    w, h = args.width, args.height
    fovx = math.radians(50.0)
    fovy = proj.focal2fov(proj.fov2focal(fovx, w), h)
    projm = proj.get_projection_matrix(0.01, 100.0, fovx, fovy)
    pos = np.array([0.0, -3.4, 1.2])
    fwd = -pos / np.linalg.norm(pos)
    up = np.array([0.0, 0.0, 1.0])
    right = np.cross(up, fwd)
    right /= np.linalg.norm(right)
    true_up = np.cross(fwd, right)
    R = np.stack([right, true_up, fwd], axis=1)
    view = proj.get_world_to_view(R, -R.T @ pos)
    cam = CameraParams(
        view=jnp.asarray(view), full_proj=jnp.asarray(projm @ view),
        campos=jnp.asarray(pos.astype(np.float32)),
        tan_fovx=math.tan(fovx / 2), tan_fovy=math.tan(fovy / 2),
        width=w, height=h)

    probe = rast.make_settings(
        "seq", capacity=1 << 22, max_per_tile=8192,
        fast_sort=True, tight_culling=True, precise_cull=True)
    out = jax.jit(lambda p: render(cam, p, state.alive, 3, jnp.zeros(3),
                                   probe))(params)
    nr = int(out["num_rendered"])
    ademand = int(out["aligned_demand"])
    cap = 1 << max(int(nr * 1.15).bit_length(), 16)
    kcap = ((int(ademand * 1.05) >> 17) + 1) << 17
    settings = rast.make_settings(
        "seq", capacity=cap, max_per_tile=8192,
        fast_sort=True, tight_culling=True, precise_cull=True,
        packed_capacity=kcap)

    def fwd_body(carry, s):
        # dependency through xyz: every stage provably inside the loop
        p, fb = carry
        o = render(cam, p._replace(xyz=p.xyz + (1e-30 * jnp.mean(fb) + s)),
                   state.alive, 3, jnp.zeros(3), settings)
        return (p, o["render"])

    fb0 = jnp.zeros((3, h, w))
    t_fwd = chain(lambda: fwd_body, (params, fb0), iters=8, reps=2)

    gt = jnp.zeros((3, h, w))

    def fb_body(p, s):
        def loss(p):
            o = render(cam, p, state.alive, 3, jnp.zeros(3), settings)
            return losses.photometric_loss(o["render"], gt + s, 0.2)
        _, grads = jax.value_and_grad(loss)(p)
        return jax.tree.map(lambda a, b: a - 1e-30 * b, p, grads)

    t_fb = chain(lambda: fb_body, params, iters=6, reps=2)

    print(json.dumps({
        "model": ply, "n_alive": n_alive, "resolution": f"{w}x{h}",
        "num_rendered": nr, "aligned_demand": ademand,
        "culled": int(out["culled"]),
        "capacity": cap, "packed_capacity": kcap,
        "fwd_ms": round(t_fwd, 2), "fwd_fps": round(1000.0 / t_fwd, 2),
        "fwdbwd_ms": round(t_fb, 2),
        "fwdbwd_mpix_s": round(w * h / t_fb / 1e3, 2),
    }))


if __name__ == "__main__":
    main()
