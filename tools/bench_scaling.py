#!/usr/bin/env python
"""Virtual-mesh DP scaling-efficiency harness (BASELINE configs 4-5 prep).

Runs the FULL sharded data-parallel training step (parallel/train_step.py:
replicated Gaussians, psum gradient all-reduce, per-device camera shards)
over 1 / 2 / 4 / 8 virtual devices and reports per-device step time and
scaling efficiency.

IMPORTANT: the numbers are CORRECTNESS-GRADE ONLY. The virtual devices are
CPU host threads (xla_force_host_platform_device_count) sharing one socket:
collectives are memcpys, there is no ICI, and compute contends for the same
cores. The harness exists so the real-pod measurement is a one-command run
when hardware appears: on a v5e pod slice, drop JAX_PLATFORMS/XLA_FLAGS and
raise the model/image sizes to the BASELINE config-4 shapes.

Usage: python tools/bench_scaling.py [--devices 1 2 4 8] [--iters 20]
       [--n 20000] [--size 128]
Writes tools/bench_scaling_results.json and prints one JSON line per row.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", nargs="+", type=int, default=[1, 2, 4, 8])
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--n", type=int, default=20_000)
    ap.add_argument("--size", type=int, default=128)
    return ap.parse_args()


def main():
    args = parse_args()
    max_dev = max(args.devices)
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={max_dev}"
        ).strip()
    # default to the virtual CPU mesh unless explicitly pointed at real
    # TPUs (NGS_PLATFORM=tpu on a pod slice)
    os.environ.setdefault("NGS_PLATFORM", "cpu")
    import neuralgaussiansplatting_tpu  # noqa: F401 (applies NGS_PLATFORM)
    import jax
    import jax.numpy as jnp
    from neuralgaussiansplatting_tpu.ops import rasterize as rast
    from neuralgaussiansplatting_tpu.ops.preprocess import CameraParams
    from neuralgaussiansplatting_tpu.parallel import mesh as mesh_lib
    from neuralgaussiansplatting_tpu.parallel import train_step as pts
    from neuralgaussiansplatting_tpu.train import optim
    from neuralgaussiansplatting_tpu.train.loop import TrainState
    from __graft_entry__ import _demo_scene

    on_tpu = jax.default_backend() == "tpu"
    params, state, cam = _demo_scene(
        n=args.n, w=args.size, h=args.size, capacity=args.n, sh_degree=2)
    settings = rast.RasterizeSettings(
        capacity=1 << 16, max_per_tile=1024, chunk=16, backend="xla",
        block_x=16, block_y=16) if not on_tpu else rast.make_settings(
        "seq", capacity=1 << 18, max_per_tile=2048, fast_sort=True)
    opt = optim.OptimizationParams()
    tx = optim.make_optimizer(opt, 1.0)
    import numpy as np
    # host copies: the sharded step donates its input state, and device
    # re-placement of a donated array across mesh sizes raises
    params_h = jax.tree.map(np.asarray, params)
    state_h = jax.tree.map(np.asarray, state)

    rows = []
    for nd in args.devices:
        if nd > len(jax.devices()):
            print(f"# skipping {nd} devices ({len(jax.devices())} available)")
            continue
        mesh = mesh_lib.make_mesh(n_data=nd, n_tile=1,
                                  devices=jax.devices()[:nd])
        params = jax.tree.map(jnp.asarray, params_h)
        state = jax.tree.map(jnp.asarray, state_h)
        ts = TrainState(params=params, gstate=state,
                        opt_state=tx.init(params), step=jnp.asarray(0))
        ts = pts.replicate_state(mesh, ts)
        b = nd  # one camera per device: fixed per-device work, growing batch
        cams = CameraParams(
            view=jnp.tile(cam.view[None], (b, 1, 1)),
            full_proj=jnp.tile(cam.full_proj[None], (b, 1, 1)),
            campos=jnp.tile(cam.campos[None], (b, 1)),
            tan_fovx=cam.tan_fovx, tan_fovy=cam.tan_fovy,
            width=cam.width, height=cam.height)
        gts = jnp.zeros((b, 3, cam.height, cam.width), jnp.float32)
        cams, gts = pts.shard_batch(mesh, cams, gts)
        step = pts.make_dp_train_step(mesh, tx, sh_degree=2,
                                      settings=settings, lambda_dssim=0.2)
        bg = jnp.zeros(3, jnp.float32)
        ts, m = step(ts, cams, gts, bg)
        float(m["loss"])                      # compile + run once
        t0 = time.perf_counter()
        for _ in range(args.iters):
            ts, m = step(ts, cams, gts, bg)
        float(m["loss"])
        dt = (time.perf_counter() - t0) / args.iters * 1e3
        rows.append({"devices": nd, "batch": b, "step_ms": round(dt, 2),
                     "cams_per_s": round(b / dt * 1e3, 2)})
        print(json.dumps(rows[-1]))

    if rows:
        base = rows[0]["cams_per_s"] / rows[0]["devices"]
        for r in rows:
            r["scaling_efficiency"] = round(
                r["cams_per_s"] / (base * r["devices"]), 3)
        out = {
            "backend": jax.default_backend(),
            "correctness_grade_only": jax.default_backend() != "tpu",
            "note": ("virtual CPU mesh: collectives are memcpys and devices "
                     "share one socket; use only to validate the sharded "
                     "step's structure, not to project pod throughput"),
            "model": {"n": args.n, "size": args.size},
            "rows": rows,
        }
        path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "bench_scaling_results.json")
        with open(path, "w") as f:
            json.dump(out, f, indent=2)
        print(json.dumps({"written": path,
                          "efficiency": [r["scaling_efficiency"]
                                         for r in rows]}))


if __name__ == "__main__":
    main()
