#!/usr/bin/env python
"""Config-2/3 training-quality proof: lego-class 800^2 run with the FULL
reference schedule (SH warmup, densify 500..15k, opacity reset) to a
published iteration/PSNR/wall-clock table.

Generates a self-contained 800^2 dataset (the environment has no network
access for NeRF-synthetic; tools/make_demo_scene.py builds an equivalent-
scale procedural scene — 800x800 views, 100k-class Gaussian demand), trains
through the real train.py CLI equivalents, evaluates the held-out split at
the reference milestones, and writes results JSON + a markdown table.

    python tools/train_quality_proof.py --iters 7000 \
        --out /tmp/q_proof --scene /tmp/q_scene

The table lands in <out>/quality_proof.json and is mirrored into
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
    ap.add_argument("--scene", default="/tmp/q_scene")
    ap.add_argument("--out", default="/tmp/q_proof")
    ap.add_argument("--iters", type=int, default=7000)
    ap.add_argument("--size", type=int, default=800)
    ap.add_argument("--views", type=int, default=100)
    ap.add_argument("--gt_gaussians", type=int, default=40000)
    ap.add_argument("--init_points", type=int, default=10000)
    ap.add_argument("--skip_gen", action="store_true")
    ap.add_argument("--backend", default="seq")
    ap.add_argument("--fast_sort", action="store_true",
                    help="packed [tile|depth] sort key — the driver bench's "
                         "configuration (sub-1e-3 image deviation); run the "
                         "proof with this so the perf number and the "
                         "quality number describe the same code path")
    args = ap.parse_args()

    if not args.skip_gen and not os.path.exists(
            os.path.join(args.scene, "transforms_train.json")):
        subprocess.check_call([
            sys.executable, os.path.join(ROOT, "tools/make_demo_scene.py"),
            "--out", args.scene, "--size", str(args.size),
            "--views", str(args.views),
            "--n_gaussians", str(args.gt_gaussians),
            "--init_points", str(args.init_points)])

    milestones = sorted({1000, 3000, 5000, args.iters,
                         min(7000, args.iters)})
    t0 = time.time()
    cmd = [
        sys.executable, os.path.join(ROOT, "train.py"),
        "-s", args.scene, "-m", args.out, "--eval",
        "--iterations", str(args.iters),
        "--test_iterations", *[str(m) for m in milestones],
        "--save_iterations", str(args.iters),
        "--steps_per_call", "10",
        "--backend", args.backend,
    ] + (["--fast_sort"] if args.fast_sort else [])
    proc = subprocess.run(cmd, capture_output=True, text=True)
    wall = time.time() - t0
    sys.stdout.write(proc.stdout[-4000:])
    if proc.returncode != 0:
        sys.stderr.write(proc.stderr[-4000:])
        raise SystemExit(proc.returncode)

    # parse the CLI's milestone eval lines:
    #   [ITER 7000] Evaluating test: L1 0.012 PSNR 28.4
    rows = []
    for line in proc.stdout.splitlines():
        if "Evaluating test:" in line:
            parts = line.split()
            rows.append({
                "iteration": int(parts[1].rstrip("]")),
                "l1": float(parts[parts.index("L1") + 1]),
                "psnr": float(parts[parts.index("PSNR") + 1]),
            })
    # alive-count + perf footer from the tqdm history is in stderr; keep raw
    result = {
        "dataset": {
            "generator": "tools/make_demo_scene.py",
            "resolution": args.size, "train_views": args.views,
            "test_views": max(args.views // 4, 2),
            "gt_gaussians": args.gt_gaussians,
            "init_points": args.init_points,
        },
        "schedule": "reference defaults (SH warmup 1k, densify 500..15000 "
                    "every 100, opacity reset 3000)",
        "fast_sort": args.fast_sort,
        "iterations": args.iters,
        "wall_clock_s": round(wall, 1),
        "test_psnr": rows,
    }
    os.makedirs(args.out, exist_ok=True)
    with open(os.path.join(args.out, "quality_proof.json"), "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result, indent=2))


if __name__ == "__main__":
    main()
