#!/usr/bin/env python
"""Evaluation metrics CLI (reference metrics.py).

Computes SSIM / PSNR / LPIPS per scene + per view over the
<model>/<split>/ours_<iter>/{renders,gt} trees and writes results.json +
per_view.json. LPIPS requires pretrained VGG weights; when unavailable in the
environment (no download path), it is reported as null with a note — see
neuralgaussiansplatting_tpu/utils/lpips.py.
"""

import json
import os
import sys
from argparse import ArgumentParser
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def read_images(renders_dir, gt_dir):
    import numpy as np
    from PIL import Image

    renders, gts, names = [], [], []
    for fname in sorted(os.listdir(renders_dir)):
        r = np.asarray(Image.open(renders_dir / fname), dtype=np.float32) / 255.0
        g = np.asarray(Image.open(gt_dir / fname), dtype=np.float32) / 255.0
        renders.append(r[..., :3].transpose(2, 0, 1))
        gts.append(g[..., :3].transpose(2, 0, 1))
        names.append(fname)
    return renders, gts, names


def evaluate(model_paths):
    import jax.numpy as jnp
    from neuralgaussiansplatting_tpu.utils import losses
    from neuralgaussiansplatting_tpu.utils.lpips import lpips_fn

    lpips = lpips_fn("vgg")

    full_dict = {}
    per_view_dict = {}
    for scene_dir in model_paths:
        print("Scene:", scene_dir)
        full_dict[scene_dir] = {}
        per_view_dict[scene_dir] = {}
        test_dir = Path(scene_dir) / "test"
        for method in sorted(os.listdir(test_dir)):
            print("Method:", method)
            full_dict[scene_dir][method] = {}
            per_view_dict[scene_dir][method] = {}
            method_dir = test_dir / method
            renders, gts, names = read_images(method_dir / "renders",
                                              method_dir / "gt")
            ssims, psnrs, lpipss = [], [], []
            for r, g in zip(renders, gts):
                rj, gj = jnp.asarray(r), jnp.asarray(g)
                ssims.append(float(losses.ssim(rj, gj)))
                psnrs.append(float(losses.psnr(rj, gj)))
                lpipss.append(lpips(r, g) if lpips else None)
            import numpy as np
            print(f"  SSIM : {np.mean(ssims):.7f}")
            print(f"  PSNR : {np.mean(psnrs):.7f}")
            if lpips:
                print(f"  LPIPS: {np.mean(lpipss):.7f}")
            else:
                print("  LPIPS: unavailable (no pretrained VGG weights)")
            full_dict[scene_dir][method].update({
                "SSIM": float(np.mean(ssims)),
                "PSNR": float(np.mean(psnrs)),
                "LPIPS": float(np.mean(lpipss)) if lpips else None,
            })
            per_view_dict[scene_dir][method].update({
                "SSIM": dict(zip(names, map(float, ssims))),
                "PSNR": dict(zip(names, map(float, psnrs))),
                "LPIPS": dict(zip(names, lpipss)) if lpips else None,
            })
        with open(os.path.join(scene_dir, "results.json"), "w") as f:
            json.dump(full_dict[scene_dir], f, indent=True)
        with open(os.path.join(scene_dir, "per_view.json"), "w") as f:
            json.dump(per_view_dict[scene_dir], f, indent=True)
    return full_dict


if __name__ == "__main__":
    parser = ArgumentParser(description="Training script parameters")
    parser.add_argument("--model_paths", "-m", required=True, nargs="+",
                        type=str, default=[])
    args = parser.parse_args()
    evaluate(args.model_paths)
