#!/usr/bin/env python
"""Neural-feature training CLI (reference trainn.py).

Trains the fork's neural pipeline: hard per-pixel z-buffer feature maps
decoded by screen-space networks. ``--sw`` selects the render path (1=MLP,
2=UNet+CNN+Denoiser, 3=MLP+CNN+Denoiser); the reference hard-codes [2]
(trainn.py:252-255). Densification is disabled, matching the reference
(trainn.py:166-177).
"""

import os
import sys
import uuid
from argparse import ArgumentParser

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    import numpy as np
    import jax.numpy as jnp
    from tqdm import tqdm
    from neuralgaussiansplatting_tpu import config
    from neuralgaussiansplatting_tpu.models.gaussians import GaussianModel
    from neuralgaussiansplatting_tpu.scene import Scene
    from neuralgaussiansplatting_tpu.train import neural_loop, optim
    from neuralgaussiansplatting_tpu.utils import video as video_utils
    from neuralgaussiansplatting_tpu.utils import feature_analysis
    from neuralgaussiansplatting_tpu.utils.general import safe_state

    parser = ArgumentParser(description="Neural training script parameters")
    config.add_group(parser, config.ModelParams)
    config.add_group(parser, config.OptimizationParams)
    config.add_group(parser, config.PipelineParams)
    parser.add_argument("--sw", type=int, default=2, choices=[1, 2, 3])
    parser.add_argument("--test_iterations", nargs="+", type=int,
                        default=[7_000, 30_000])
    parser.add_argument("--save_iterations", nargs="+", type=int,
                        default=[7_000, 30_000])
    parser.add_argument("--video_interval", type=int, default=100,
                        help="render video frames every N iterations "
                             "(reference trainn.py:134-142); 0 disables")
    parser.add_argument("--analysis_interval", type=int, default=100,
                        help="feature-statistics reports every N iterations; "
                             "0 disables")
    parser.add_argument("--quiet", action="store_true")
    parser.add_argument("--show_interval", type=int, default=300,
                        help="live rendered-vs-GT compare window every N "
                             "iterations (reference trainn.py:124-131); "
                             "headless-safe")
    parser.add_argument("--model_capacity", type=int, default=None)
    parser.add_argument("--mixed_precision", action="store_true",
                        help="bf16 compute in the screen-space decoders")
    parser.add_argument("--start_checkpoint", type=str, default=None,
                        help="classic-training checkpoint (chkpntN.ckpt) to "
                             "take the frozen geometry from (reference "
                             "trainn.py:63-65 restores a train.py checkpoint "
                             "before neural training)")
    parser.add_argument("--start_ply", type=str, default=None,
                        help="alternative geometry source: a saved "
                             "point_cloud.ply from a classic run")
    args = parser.parse_args()
    args.save_iterations.append(args.iterations)

    dataset = config.extract(config.ModelParams, args)
    opt_args = config.extract(config.OptimizationParams, args)

    if not dataset.model_path:
        dataset.model_path = os.path.join(
            "./output/", str(uuid.uuid4())[:10])
    print("Optimizing " + dataset.model_path)
    safe_state(args.quiet)
    config.save_cfg_args(dataset.model_path, dataset)

    gaussians = GaussianModel(dataset.sh_degree)
    scene = Scene(dataset.source_path, dataset.model_path, gaussians,
                  images=dataset.images, resolution=dataset.resolution,
                  white_background=dataset.white_background,
                  eval_split=dataset.eval, capacity=args.model_capacity)
    if args.start_checkpoint:
        # geometry from a classic train.py checkpoint; the neural optimizer
        # state starts fresh (only features + decoders train here)
        import pickle
        from neuralgaussiansplatting_tpu.models import gaussians as gm
        with open(args.start_checkpoint, "rb") as f:
            payload = pickle.load(f)
        gaussians.active_sh_degree = payload["active_sh_degree"]
        gaussians.spatial_lr_scale = payload["spatial_lr_scale"]
        gaussians.params = gm.normalize_params(
            gm.GaussianParams(*[jnp.asarray(x)
                                for x in tuple(payload["params"])]))
        gaussians.state = gm.GaussianState(
            *[jnp.asarray(x) for x in tuple(payload["gstate"])])
        if (args.model_capacity is not None
                and args.model_capacity != gaussians.capacity):
            # honor --model_capacity like the --start_ply path does (load_ply
            # repads); raises if live Gaussians would be truncated
            gaussians.params, gaussians.state = gm.repad(
                gaussians.params, gaussians.state, args.model_capacity)
        print(f"Geometry restored from {args.start_checkpoint} "
              f"({gaussians.num_alive} alive, capacity {gaussians.capacity})")
    elif args.start_ply:
        gaussians.load_ply(args.start_ply, capacity=args.model_capacity)
        print(f"Geometry loaded from {args.start_ply} "
              f"({gaussians.num_alive} alive)")

    opt = optim.OptimizationParams(
        iterations=opt_args.iterations, feature_lr=opt_args.feature_lr,
        lambda_dssim=opt_args.lambda_dssim)
    trainer = neural_loop.NeuralTrainer(
        gaussians, sw=args.sw, opt=opt,
        mixed_precision=args.mixed_precision)

    rng = np.random.default_rng(0)
    stack = []
    cam_cache, gt_cache = {}, {}
    ema_loss = 0.0
    progress = tqdm(range(1, opt.iterations + 1), desc="Neural training")
    for iteration in progress:
        if not stack:
            stack = list(rng.permutation(len(scene.get_train_cameras())))
        cam = scene.get_train_cameras()[stack.pop()]
        # keep cameras + GT cached on device (re-uploading GT each iteration
        # costs more than the step itself over a tunneled device)
        cp = cam_cache.setdefault(cam.uid, cam.params())
        gt = gt_cache.get(cam.uid)
        if gt is None:
            gt = gt_cache[cam.uid] = jnp.asarray(cam.image)
        metrics = trainer.step(cp, gt)
        if iteration % 50 == 0:
            ema_loss = 0.4 * float(metrics["loss"]) + 0.6 * ema_loss
            progress.set_postfix({"Loss": f"{ema_loss:.7f}"})

        if args.show_interval and iteration % args.show_interval == 0:
            from neuralgaussiansplatting_tpu.train.neural_loop import RENDER_FNS
            from neuralgaussiansplatting_tpu.utils.image import show_img2
            out = RENDER_FNS[args.sw](cam.params(), trainer.ts.params,
                                      trainer.ts.net_params,
                                      trainer.capacity)
            show_img2(np.asarray(out["render"]), cam.image,
                      title="render vs gt")

        if (args.video_interval and iteration % args.video_interval == 0
                and scene.get_video_cameras()):
            trainer.sync_model()
            video_utils.render_video_frames(
                scene, gaussians, trainer.net_params, iteration,
                dataset.model_path, sw=args.sw)
        if args.analysis_interval and iteration % args.analysis_interval == 0:
            trainer.sync_model()
            feats = np.asarray(gaussians.params.features)[
                np.asarray(gaussians.state.alive)]
            feature_analysis.analyze_gaussian_features(
                feats, iteration, dataset.model_path)
            # full reference plot set (utils/feature_analysis.py:57-138,
            # 275-332): distributions + density + 64-d heatmap/variance
            feature_analysis.plot_feature_distributions(
                feats, iteration, dataset.model_path)
            feature_analysis.plot_density(feats, iteration,
                                          dataset.model_path)
            feature_analysis.plot_64d_analysis(feats, iteration,
                                               dataset.model_path)

        if iteration in args.test_iterations:
            # Milestone held-out evaluation (reference trainn.py:161,213-243).
            # Deviation, documented: the reference's training_report renders
            # the CLASSIC pipeline during neural training (trainn.py:161
            # passes `render`), which measures the frozen geometry rather
            # than the network under training; here the active neural path
            # (--sw) is evaluated, which is the meaningful quality signal.
            from neuralgaussiansplatting_tpu.train.neural_loop import (
                RENDER_FNS)
            from neuralgaussiansplatting_tpu.utils import losses
            for name, cams in [("test", scene.get_test_cameras()),
                               ("train", scene.get_train_cameras()[:5])]:
                if not cams:
                    continue
                psnrs, l1s = [], []
                for ecam in cams:
                    out = RENDER_FNS[args.sw](
                        ecam.params(), trainer.ts.params,
                        trainer.ts.net_params, trainer.capacity,
                        alive=trainer.ts.alive)
                    img = jnp.clip(out["render"], 0.0, 1.0)
                    egt = jnp.asarray(ecam.image)
                    psnrs.append(float(losses.psnr(img, egt)))
                    l1s.append(float(losses.l1_loss(img, egt)))
                print(f"\n[ITER {iteration}] Evaluating {name}: "
                      f"L1 {np.mean(l1s):.5f} PSNR {np.mean(psnrs):.2f}")

        if iteration in args.save_iterations:
            print(f"\n[ITER {iteration}] Saving Gaussians")
            trainer.sync_model()
            scene.save(iteration)
    print("\nTraining complete.")


if __name__ == "__main__":
    main()
