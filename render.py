#!/usr/bin/env python
"""Offline novel-view rendering CLI (reference render.py).

Writes renders/ + gt/ PNG sets per split under
<model_path>/<split>/ours_<iteration>/.
"""

import os
import sys
from argparse import ArgumentParser

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def render_set(model_path, name, iteration, views, params, alive, sh_degree,
               bg, settings):
    import numpy as np
    import jax.numpy as jnp
    from PIL import Image
    from neuralgaussiansplatting_tpu.gaussian_renderer import render

    render_path = os.path.join(model_path, name, f"ours_{iteration}", "renders")
    gts_path = os.path.join(model_path, name, f"ours_{iteration}", "gt")
    os.makedirs(render_path, exist_ok=True)
    os.makedirs(gts_path, exist_ok=True)

    for idx, view in enumerate(views):
        out = render(view.params(), params, alive, sh_degree, bg, settings)
        img = np.asarray(jnp.clip(out["render"], 0, 1))
        img = (img.transpose(1, 2, 0) * 255).astype(np.uint8)
        Image.fromarray(img).save(os.path.join(render_path, f"{idx:05d}.png"))
        gt = (np.asarray(view.image).transpose(1, 2, 0) * 255).astype(np.uint8)
        Image.fromarray(gt).save(os.path.join(gts_path, f"{idx:05d}.png"))


def main():
    import jax.numpy as jnp
    from neuralgaussiansplatting_tpu import config
    from neuralgaussiansplatting_tpu.models.gaussians import GaussianModel
    from neuralgaussiansplatting_tpu.ops import rasterize as rast
    from neuralgaussiansplatting_tpu.scene import Scene

    parser = ArgumentParser(description="Testing script parameters")
    config.add_group(parser, config.ModelParams, fill_none=True)
    config.add_group(parser, config.PipelineParams, fill_none=True)
    parser.add_argument("--iteration", default=-1, type=int)
    parser.add_argument("--skip_train", action="store_true")
    parser.add_argument("--skip_test", action="store_true")
    parser.add_argument("--quiet", action="store_true")
    args = config.get_combined_args(parser)
    print("Rendering " + args.model_path)

    dataset = config.extract(config.ModelParams, args)
    pipe = config.extract(config.PipelineParams, args)

    gaussians = GaussianModel(dataset.sh_degree)
    scene = Scene(dataset.source_path, dataset.model_path, gaussians,
                  images=dataset.images, resolution=dataset.resolution,
                  white_background=dataset.white_background,
                  eval_split=dataset.eval,
                  load_iteration=args.iteration, shuffle=False)
    bg = jnp.asarray([1.0, 1.0, 1.0] if dataset.white_background
                     else [0.0, 0.0, 0.0])
    settings = rast.make_settings(
        pipe.backend, capacity=pipe.capacity, max_per_tile=pipe.max_per_tile,
        expand=pipe.expand, dense_cap=pipe.dense_cap,
        precise_cull=pipe.precise_cull, fast_sort=pipe.fast_sort)

    if not args.skip_train:
        render_set(dataset.model_path, "train", scene.loaded_iter,
                   scene.get_train_cameras(), gaussians.params,
                   gaussians.state.alive, gaussians.active_sh_degree, bg,
                   settings)
    if not args.skip_test:
        render_set(dataset.model_path, "test", scene.loaded_iter,
                   scene.get_test_cameras(), gaussians.params,
                   gaussians.state.alive, gaussians.active_sh_degree, bg,
                   settings)


if __name__ == "__main__":
    main()
