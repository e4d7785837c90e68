#!/usr/bin/env python
"""Classic 3DGS training CLI (reference train.py, TPU-native).

Usage: python train.py -s <dataset path> [-m <model out>] [--eval] ...
Flags mirror the reference (arguments/__init__.py + train.py:193-208).
"""

import os
import sys
import uuid
from argparse import ArgumentParser

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def training_report(tb_writer, iteration, metrics, trainer, scene, settings,
                    test_iterations):
    import jax.numpy as jnp
    import numpy as np
    from neuralgaussiansplatting_tpu.gaussian_renderer import render
    from neuralgaussiansplatting_tpu.utils import losses

    if tb_writer and metrics:
        # Buffer the per-iteration device scalars and pull them in batches:
        # a float()/int() per iteration is a host<->device sync that
        # serializes the async dispatch queue (and costs ~30 ms each over a
        # tunneled device). Values stay on device until the flush.
        buf = getattr(tb_writer, "_ngs_pending", None)
        if buf is None:
            buf = tb_writer._ngs_pending = []
        buf.append((iteration, metrics.get("loss", 0.0),
                    jnp.sum(trainer.ts.gstate.alive)))
        if (len(buf) >= 10 or iteration % 500 == 0
                or iteration in test_iterations):
            for it, loss_dev, alive_dev in buf:
                tb_writer.add_scalar("train_loss_patches/total_loss",
                                     float(loss_dev), it)
                tb_writer.add_scalar("total_points", int(alive_dev), it)
            buf.clear()
        if iteration % 500 == 0:
            # opacity histogram over alive gaussians (reference
            # training_report, train.py:186-188)
            from neuralgaussiansplatting_tpu.models import gaussians as gmod
            alive = np.asarray(trainer.ts.gstate.alive)
            op = np.asarray(gmod.get_opacity(trainer.ts.params))[alive]
            if len(op):
                tb_writer.add_histogram("scene/opacity_histogram", op,
                                        iteration)

    if iteration in test_iterations:
        # held-out evaluation (reference training_report, train.py:156-191)
        for name, cams in [("test", scene.get_test_cameras()),
                           ("train", scene.get_train_cameras()[:5])]:
            if not cams:
                continue
            psnrs, l1s = [], []
            for cam in cams:
                out = render(cam.params(), trainer.ts.params,
                             trainer.ts.gstate.alive,
                             trainer.gaussians.active_sh_degree,
                             trainer.bg, settings)
                img = jnp.clip(out["render"], 0.0, 1.0)
                gt = jnp.asarray(cam.image)
                psnrs.append(float(losses.psnr(img, gt)))
                l1s.append(float(losses.l1_loss(img, gt)))
            print(f"\n[ITER {iteration}] Evaluating {name}: "
                  f"L1 {np.mean(l1s):.5f} PSNR {np.mean(psnrs):.2f}")
            if tb_writer:
                tb_writer.add_scalar(f"{name}/loss_viewpoint - psnr",
                                     np.mean(psnrs), iteration)


def training_data_parallel(args, scene, gaussians, opt, settings, dataset,
                           tb_writer):
    """--data_parallel N: DPTrainer over an N-device (data, tile=1) mesh.

    Each optimizer step consumes N cameras; the camera counter advances by N
    so the densify/reset/warmup cadence matches N sequential reference
    iterations (parallel/train_step.DPTrainer). Milestone evals/saves fire
    when the counter crosses them. Works multi-process: every process runs
    the same loop (identical camera RNG), host decisions stay synchronized,
    and process 0 does the I/O."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh
    from tqdm import tqdm
    from neuralgaussiansplatting_tpu.parallel.train_step import DPTrainer

    n = args.data_parallel
    devices = np.asarray(jax.devices())
    if len(devices) < n:
        raise SystemExit(f"--data_parallel {n} but only {len(devices)} "
                         "devices visible (set "
                         "XLA_FLAGS=--xla_force_host_platform_device_count "
                         "for CPU testing)")
    mesh = Mesh(devices[:n].reshape(n, 1), ("data", "tile"))
    trainer = DPTrainer(
        gaussians=gaussians, mesh=mesh, opt=opt, settings=settings,
        batch_size=n, white_background=dataset.white_background,
        cameras_extent=scene.cameras_extent)
    if args.start_checkpoint:
        it0 = trainer.restore_checkpoint(args.start_checkpoint)
        print(f"Resumed from {args.start_checkpoint} at iteration {it0}")

    is_main = jax.process_index() == 0
    rng = np.random.default_rng(0)
    stack, cam_cache, gt_cache = [], {}, {}
    events = (set(args.test_iterations) | set(args.save_iterations)
              | set(args.checkpoint_iterations or []))
    progress = tqdm(total=opt.iterations, desc="Training progress (DP)",
                    initial=trainer._camera_iter, disable=not is_main)
    while trainer._camera_iter < opt.iterations:
        while len(stack) < n:
            stack.extend(rng.permutation(len(scene.get_train_cameras())))
        picks = [scene.get_train_cameras()[int(stack.pop())]
                 for _ in range(n)]
        cams = [cam_cache.setdefault(c.uid, c.params()) for c in picks]
        gts = jnp.stack([gt_cache.setdefault(c.uid, jnp.asarray(c.image))
                         for c in picks])
        metrics = trainer.step(cams, gts)
        it = trainer._camera_iter
        progress.update(n)
        if it % 50 < n:
            progress.set_postfix({"Loss": f"{float(metrics['loss']):.7f}"})
        crossed = {e for e in events if it - n < e <= it}
        if crossed & set(args.test_iterations):
            training_report(tb_writer, it, metrics, trainer, scene,
                            trainer.settings, {it})
        if is_main and crossed & set(args.save_iterations):
            print(f"\n[ITER {it}] Saving Gaussians")
            trainer.sync_model()
            scene.save(it)
        if is_main and crossed & set(args.checkpoint_iterations or []):
            print(f"\n[ITER {it}] Saving Checkpoint")
            trainer.save_checkpoint(
                os.path.join(scene.model_path, f"chkpnt{it}.ckpt"), it)
    progress.close()


def main():
    from neuralgaussiansplatting_tpu import config
    from neuralgaussiansplatting_tpu.models.gaussians import GaussianModel
    from neuralgaussiansplatting_tpu.ops import rasterize as rast
    from neuralgaussiansplatting_tpu.scene import Scene
    from neuralgaussiansplatting_tpu.train import loop, optim
    from neuralgaussiansplatting_tpu.viewer import network_gui

    parser = ArgumentParser(description="Training script parameters")
    config.add_group(parser, config.ModelParams)
    config.add_group(parser, config.OptimizationParams)
    config.add_group(parser, config.PipelineParams)
    parser.add_argument("--ip", type=str, default="127.0.0.1")
    parser.add_argument("--port", type=int, default=6009)
    parser.add_argument("--debug_from", type=int, default=-1)
    parser.add_argument("--detect_anomaly", action="store_true", default=False)
    parser.add_argument("--test_iterations", nargs="+", type=int,
                        default=[7_000, 30_000])
    parser.add_argument("--save_iterations", nargs="+", type=int,
                        default=[7_000, 30_000])
    parser.add_argument("--quiet", action="store_true")
    parser.add_argument("--checkpoint_iterations", nargs="+", type=int,
                        default=[])
    parser.add_argument("--start_checkpoint", type=str, default=None)
    parser.add_argument("--model_capacity", type=int, default=None,
                        help="Gaussian slot capacity (default: point count)")
    parser.add_argument("--disable_viewer", action="store_true")
    parser.add_argument("--tune_interval", type=int, default=500,
                        help="iterations between instance-capacity "
                             "re-bucketing checks (and drop-monitor reads). "
                             "Align with --densification_interval on "
                             "fast-growing scenes: demand spikes right "
                             "after densify, and instances drop until the "
                             "next tune point re-buckets the buffers")
    parser.add_argument("--steps_per_call", type=int, default=1,
                        help="iterations fused into one device dispatch "
                             "(lax.scan); pick a divisor of "
                             "densification_interval so schedule events land "
                             "on block boundaries")
    parser.add_argument("--gt_cache_mb", type=int, default=4096,
                        help="device-side GT image cache budget (MB); "
                             "avoids re-uploading GT every iteration")
    parser.add_argument("--data_parallel", type=int, default=1,
                        help="data-parallel over N devices: each optimizer "
                             "step consumes N cameras (batch sharded over "
                             "the mesh 'data' axis, gradients psum over "
                             "ICI). Mutually exclusive with "
                             "--steps_per_call > 1. For multi-host, start "
                             "one process per host with "
                             "jax.distributed env configured.")
    parser.add_argument("--profile_dir", type=str, default=None,
                        help="write a jax profiler trace for iterations "
                             "100..110 to this directory")
    args = parser.parse_args()
    args.save_iterations.append(args.iterations)

    dataset = config.extract(config.ModelParams, args)
    opt_args = config.extract(config.OptimizationParams, args)
    pipe = config.extract(config.PipelineParams, args)

    if args.detect_anomaly:
        # reference --detect_anomaly (torch.autograd anomaly mode) ->
        # jax nan-debugging: fail loudly at the op that produced a NaN
        import jax
        jax.config.update("jax_debug_nans", True)

    if not dataset.model_path:
        dataset.model_path = os.path.join(
            "./output/", os.getenv("OAR_JOB_ID", str(uuid.uuid4())[:10]))
    print("Optimizing " + dataset.model_path)
    from neuralgaussiansplatting_tpu.utils.general import safe_state
    safe_state(args.quiet)
    config.save_cfg_args(dataset.model_path, dataset)

    if not args.disable_viewer:
        try:
            network_gui.init(args.ip, args.port)
        except OSError as e:
            print(f"viewer socket unavailable ({e}); continuing headless")
            args.disable_viewer = True

    tb_writer = None
    try:
        from tensorboardX import SummaryWriter
        tb_writer = SummaryWriter(dataset.model_path)
    except Exception:
        print("tensorboard not available: not logging progress")

    gaussians = GaussianModel(dataset.sh_degree)
    scene = Scene(dataset.source_path, dataset.model_path, gaussians,
                  images=dataset.images, resolution=dataset.resolution,
                  white_background=dataset.white_background,
                  eval_split=dataset.eval, capacity=args.model_capacity)
    if args.model_capacity is None:
        # leave densification headroom (host-side growth re-buckets later)
        import numpy as np
        n = gaussians.num_alive
        cap = 1 << max(int(np.ceil(np.log2(max(n * 4, 1024)))), 10)
        gaussians.create_from_pcd_capacity = cap  # informational

    settings = rast.make_settings(
        pipe.backend, capacity=pipe.capacity, max_per_tile=pipe.max_per_tile,
        tight_culling=pipe.tight_culling, expand=pipe.expand,
        dense_cap=pipe.dense_cap, precise_cull=pipe.precise_cull,
        fast_sort=pipe.fast_sort)
    opt = optim.OptimizationParams(
        **{f: getattr(opt_args, f) for f in (
            "iterations", "position_lr_init", "position_lr_final",
            "position_lr_delay_mult", "position_lr_max_steps", "feature_lr",
            "opacity_lr", "scaling_lr", "rotation_lr", "percent_dense",
            "lambda_dssim", "densification_interval",
            "opacity_reset_interval", "densify_from_iter",
            "densify_until_iter", "densify_grad_threshold",
            "random_background")})
    if args.data_parallel > 1:
        if args.steps_per_call > 1:
            raise SystemExit("--data_parallel and --steps_per_call are "
                             "mutually exclusive (a DP step already consumes "
                             "N cameras per dispatch)")
        training_data_parallel(args, scene, gaussians, opt, settings,
                               dataset, tb_writer)
        print("\nTraining complete.")
        return

    trainer = loop.Trainer(
        gaussians=gaussians, opt=opt, settings=settings,
        white_background=dataset.white_background,
        cameras_extent=scene.cameras_extent,
        tune_interval=args.tune_interval)

    first_iter = 0
    if args.start_checkpoint:
        first_iter = trainer.restore_checkpoint(args.start_checkpoint)
        print(f"Resumed from {args.start_checkpoint} at iteration {first_iter}")

    import numpy as np
    import jax.numpy as jnp
    from tqdm import tqdm
    from neuralgaussiansplatting_tpu.gaussian_renderer import render as render_fn

    rng = np.random.default_rng(0)
    stack = []
    cam_cache, gt_cache, gt_cache_bytes = {}, {}, [0]
    spc = max(1, args.steps_per_call)
    pending = []          # (CameraParams, gt) awaiting a block dispatch
    flush_set = (set(args.test_iterations) | set(args.save_iterations)
                 | set(args.checkpoint_iterations or []))
    ema_loss = 0.0
    progress = tqdm(range(first_iter + 1, opt.iterations + 1),
                    desc="Training progress")
    for iteration in progress:
        # viewer service (reference train.py:52-65)
        if not args.disable_viewer:
            if network_gui.conn is None:
                network_gui.try_connect()
            while network_gui.conn is not None:
                try:
                    cam_v, do_training, _, _, keep_alive, scaling_mod = \
                        network_gui.receive()
                    net_image_bytes = None
                    if cam_v is not None:
                        out = render_fn(cam_v, trainer.ts.params,
                                        trainer.ts.gstate.alive,
                                        gaussians.active_sh_degree,
                                        trainer.bg, settings,
                                        scaling_modifier=scaling_mod)
                        net_image_bytes = network_gui.render_to_bytes(
                            out["render"])
                    network_gui.send(net_image_bytes, dataset.source_path)
                    if do_training and (iteration < opt.iterations
                                        or not keep_alive):
                        break
                except Exception:
                    network_gui.conn = None

        if args.profile_dir and iteration == 100:
            import jax
            jax.profiler.start_trace(args.profile_dir)
        if args.profile_dir and iteration == 110:
            import jax
            jax.profiler.stop_trace()
            print(f"\nprofiler trace written to {args.profile_dir}")

        if not stack:
            stack = list(rng.permutation(len(scene.get_train_cameras())))
        cam = scene.get_train_cameras()[stack.pop()]
        # device-side caches: re-uploading an 800^2 GT every iteration costs
        # more than the train step itself over a tunneled device (~8 MB/it)
        cp = cam_cache.get(cam.uid)
        if cp is None:
            cp = cam_cache[cam.uid] = cam.params()
        gt = gt_cache.get(cam.uid)
        if gt is None:
            if gt_cache_bytes[0] < args.gt_cache_mb * (1 << 20):
                gt = gt_cache[cam.uid] = jnp.asarray(cam.image)
                gt_cache_bytes[0] += gt.size * 4
            else:
                gt = jnp.asarray(cam.image)
        # The reference evaluates (training_report, train.py:107) BEFORE the
        # densify/opacity-reset block (:112-123): run the gradient phase,
        # report, then apply the schedule, so milestone evals landing on a
        # reset iteration measure pre-reset state.
        block_bounds = None
        if spc > 1:
            # multi-step dispatch: N sequential iterations per jitted call
            # (train_steps lax.scan) — same math, 1/N the per-call dispatch
            # latency. Blocks flush at size, at the end, and at any
            # test/save/checkpoint iteration so host-visible state is
            # current whenever it is read.
            pending.append((cp, gt))
            if (len(pending) == spc or iteration == opt.iterations
                    or iteration in flush_set):
                from neuralgaussiansplatting_tpu.parallel.train_step import (
                    stack_cameras)
                cams_b = stack_cameras([c for c, _ in pending])
                gts_b = jnp.stack([g for _, g in pending])
                block_bounds = (iteration - len(pending) + 1, iteration)
                metrics = trainer.grad_step_block(
                    cams_b, gts_b, block_bounds[0])
                pending = []
            else:
                metrics = None
        else:
            metrics = trainer.grad_step(cp, gt, iteration)

        if metrics is not None and iteration % 50 < spc:
            ema_loss = 0.4 * float(metrics["loss"]) + 0.6 * ema_loss
            progress.set_postfix({"Loss": f"{ema_loss:.7f}"})
        # trainer.settings, NOT the startup settings: the autotune re-buckets
        # capacities to demand; evaluating with the startup buffers truncated
        # garden-scale renders (~2.7M instances vs the 2^20 default) and
        # reported a declining PSNR on a healthily-converging model
        training_report(tb_writer, iteration, metrics or {}, trainer, scene,
                        trainer.settings, set(args.test_iterations))
        if iteration in args.save_iterations:
            # reference saves pre-densification too (train.py:108-110)
            print(f"\n[ITER {iteration}] Saving Gaussians")
            trainer.sync_model()
            scene.save(iteration)
        if block_bounds is not None:
            metrics = trainer.apply_schedule_block(*block_bounds, metrics)
        elif metrics is not None:
            metrics = trainer.apply_schedule(iteration, metrics)
        if iteration in (args.checkpoint_iterations or []):
            print(f"\n[ITER {iteration}] Saving Checkpoint")
            trainer.save_checkpoint(
                os.path.join(scene.model_path, f"chkpnt{iteration}.ckpt"),
                iteration)
    print("\nTraining complete.")


if __name__ == "__main__":
    main()
