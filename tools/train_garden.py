#!/usr/bin/env python
"""Garden-regime training quality run (BASELINE config-4 structure).

The reference trains multi-million-Gaussian Mip-NeRF360-scale scenes in
24 GB (reference README.md:74-75). This harness proves the equivalent regime
end-to-end on one TPU chip: a 1080p procedural scene with garden-like splat
statistics (many tiny splats), initialized at ~1M points, trained through the
real ``train.py`` CLI with the FULL reference schedule — densify/clone/split/
prune every 100 iterations from 500, opacity reset, SH warmup — publishing an
iteration / loss / test-PSNR / wall-clock table.

    python tools/train_garden.py --iters 2000 \
        --out /tmp/garden_out --scene /tmp/garden_scene

Results land in <out>/garden_quality.json and are mirrored into
docs/DESIGN.md by hand (keep them in sync).
"""

import json
import os
import subprocess
import sys
import time
from argparse import ArgumentParser

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main():
    ap = ArgumentParser()
    ap.add_argument("--scene", default="/tmp/garden_scene")
    ap.add_argument("--out", default="/tmp/garden_out")
    ap.add_argument("--iters", type=int, default=2000)
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--views", type=int, default=40)
    ap.add_argument("--gt_gaussians", type=int, default=300_000)
    ap.add_argument("--gt_scale", type=float, default=0.35)
    ap.add_argument("--init_points", type=int, default=1_000_000)
    ap.add_argument("--init_noise", type=float, default=0.004,
                    help="tight jitter => kNN-scale init produces garden-"
                         "like tiny splats (instance demand ~2-4M at 1080p;"
                         " the 0.02 default gave ~60px splats whose ~20M-"
                         "instance init demand overflows every static cap "
                         "and traps training at ~9 dB)")
    ap.add_argument("--model_capacity", type=int, default=1 << 21)
    ap.add_argument("--steps_per_call", type=int, default=5)
    ap.add_argument("--skip_gen", action="store_true")
    ap.add_argument("--backend", default="seq")
    args = ap.parse_args()

    if not args.skip_gen and not os.path.exists(
            os.path.join(args.scene, "transforms_train.json")):
        subprocess.check_call([
            sys.executable, os.path.join(ROOT, "tools/make_demo_scene.py"),
            "--out", args.scene,
            "--width", str(args.width), "--height", str(args.height),
            "--views", str(args.views),
            "--n_gaussians", str(args.gt_gaussians),
            "--gt_scale", str(args.gt_scale),
            "--init_noise", str(args.init_noise),
            "--init_points", str(args.init_points)])

    milestones = sorted({500, 1000, args.iters // 2, args.iters})
    t0 = time.time()
    cmd = [
        sys.executable, os.path.join(ROOT, "train.py"),
        "-s", args.scene, "-m", args.out, "--eval",
        "--iterations", str(args.iters),
        "--test_iterations", *[str(m) for m in milestones],
        "--save_iterations", str(args.iters),
        "--steps_per_call", str(args.steps_per_call),
        "--backend", args.backend,
        "--model_capacity", str(args.model_capacity),
        # scatter expansion: at ~1-2M gaussians the O(N) diff-scatter costs
        # ~50-90 ms/step but drops NOTHING. An earlier dense_cap=8 config
        # dropped 66% of instances at init (real init clouds have fat
        # tiles-touched tails — near-duplicate points produce a few huge
        # splats) and training flatlined at 9 dB; budget starvation shows up
        # as flat loss, so watch the dropped monitor, not just PSNR.
        "--expand", "scatter",
        # 64k: the round-5 garden run measured per-tile loads past 16384
        # (kNN init on a 1M near-duplicate cloud makes a few giant splats
        # that stack thousands of layers on central tiles); the 16384 cap
        # dropped ~1.7M of 2.78M instances and test PSNR DECLINED while
        # train loss improved — optimization against a render that is
        # missing contributors. Deep tiles cost kernel time, not
        # correctness.
        "--max_per_tile", "65536",
        # densify every 100 spikes instance demand; at the default 500-iter
        # tune cadence the packed buffers lag the spike and instances drop
        # for up to 400 iterations (measured: ~1M drops/step persisted and
        # test PSNR declined while train loss improved)
        "--tune_interval", "100",
    ]
    proc = subprocess.run(cmd, capture_output=True, text=True)
    wall = time.time() - t0
    sys.stdout.write(proc.stdout[-6000:])
    if proc.returncode != 0:
        sys.stderr.write(proc.stderr[-6000:])
        raise SystemExit(proc.returncode)

    rows = []
    for line in proc.stdout.splitlines():
        if "Evaluating test:" in line:
            parts = line.split()
            rows.append({
                "iteration": int(parts[1].rstrip("]")),
                "l1": float(parts[parts.index("L1") + 1]),
                "psnr": float(parts[parts.index("PSNR") + 1]),
            })
    alive = None
    for line in proc.stdout.splitlines():
        if "alive" in line:
            alive = line.strip()

    result = {
        "scene": {"resolution": f"{args.width}x{args.height}",
                  "views": args.views, "gt_gaussians": args.gt_gaussians,
                  "init_points": args.init_points},
        "iterations": args.iters,
        "model_capacity": args.model_capacity,
        "milestones": rows,
        "wall_clock_s": round(wall, 1),
        "iters_per_s": round(args.iters / wall, 2),
        "final_alive_line": alive,
    }
    os.makedirs(args.out, exist_ok=True)
    with open(os.path.join(args.out, "garden_quality.json"), "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
