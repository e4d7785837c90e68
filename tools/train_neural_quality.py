#!/usr/bin/env python
"""Neural-pipeline quality run (reference trainn.py workflow at 800²).

The reference's neural pipeline takes frozen geometry (usually from a classic
training checkpoint, trainn.py:63-65) and trains the 64-d per-Gaussian
features + screen-space decoders (--sw 2: UNet + CNN kernel-predictor +
dynamic 9x9 Denoiser). This harness drives the real ``trainn.py`` CLI on the
quality-proof scene, taking geometry from the classic quality run's saved
PLY, and publishes an iteration / test-PSNR table.

    python tools/train_neural_quality.py --iters 3000 \
        --scene /tmp/q_scene_r4 --start_ply \
        /tmp/q_proof_r4/point_cloud/iteration_7000/point_cloud.ply

Results land in <out>/neural_quality.json and are mirrored into
docs/DESIGN.md by hand.
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
    ap.add_argument("--scene", default="/tmp/q_scene_r4")
    ap.add_argument("--out", default="/tmp/neural_quality_out")
    ap.add_argument("--start_ply", default=None)
    ap.add_argument("--iters", type=int, default=3000)
    ap.add_argument("--sw", type=int, default=2)
    ap.add_argument("--feature_lr", type=float, default=None,
                    help="A/B knob (reference default 0.0025)")
    ap.add_argument("--mixed_precision", action="store_true",
                    help="bf16 decoders (A/B vs f32)")
    args = ap.parse_args()

    milestones = sorted({500, 1000, 2000, 3000, 5000,
                         args.iters // 2, args.iters}
                        - {0})
    t0 = time.time()
    cmd = [
        sys.executable, os.path.join(ROOT, "trainn.py"),
        "-s", args.scene, "-m", args.out, "--eval",
        "--sw", str(args.sw),
        "--iterations", str(args.iters),
        "--test_iterations", *[str(m) for m in milestones],
        "--save_iterations", str(args.iters),
        "--video_interval", "0", "--analysis_interval", "1000",
        "--show_interval", "0",
    ]
    if args.feature_lr is not None:
        cmd += ["--feature_lr", str(args.feature_lr)]
    if args.mixed_precision:
        cmd += ["--mixed_precision"]
    if args.start_ply:
        cmd += ["--start_ply", args.start_ply]
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
    result = {
        "sw": args.sw, "iterations": args.iters,
        "start_ply": args.start_ply, "milestones": rows,
        "wall_clock_s": round(wall, 1),
    }
    os.makedirs(args.out, exist_ok=True)
    with open(os.path.join(args.out, "neural_quality.json"), "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
