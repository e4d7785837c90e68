"""Classic 3DGS training loop (reference train.py:31-132, TPU-native).

The per-iteration hot path (render -> loss -> backward -> Adam) is one jitted
``train_step`` over static-shape pytrees; density control is a second jitted
function invoked on the reference schedule. Host code only picks cameras,
advances the SH warmup counter, and handles I/O — there are no host<->device
syncs inside the step.
"""

from __future__ import annotations

import dataclasses
import functools
import os
import pickle
import time
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from neuralgaussiansplatting_tpu.gaussian_renderer import render
from neuralgaussiansplatting_tpu.models import gaussians as gm
from neuralgaussiansplatting_tpu.ops import rasterize as rast
from neuralgaussiansplatting_tpu.train import densify as dens
from neuralgaussiansplatting_tpu.train import optim
from neuralgaussiansplatting_tpu.utils import losses


class TrainState(NamedTuple):
    params: gm.GaussianParams
    gstate: gm.GaussianState
    opt_state: Any
    step: jnp.ndarray


def tune_capacity(settings: rast.RasterizeSettings, num_rendered: int,
                  aligned_demand: int, min_capacity: int = 1 << 16,
                  max_capacity: int = 1 << 23):
    """Re-bucket the instance buffers to the measured demand.

    Binning cost scales with the static expansion buffer (``capacity``), and
    the gather/kernels/grad-reduce with the packed buffer
    (``packed_capacity``); both are re-bucketed with hysteresis (grow
    eagerly — overflow drops instances — shrink only past comfortable slack,
    since every bucket switch costs a recompile). Returns
    (new_settings, changed)."""
    changed = False
    cap = settings.capacity
    want = max(min_capacity,
               1 << max(int(num_rendered * 1.4) - 1, 1).bit_length())
    want = min(want, max_capacity)
    if want > cap or want < cap // 4:
        settings = dataclasses.replace(settings, capacity=want)
        changed = True
    # the packed buffer has no internal pow2 padding — bucket to 1/8ths
    # between powers of two for a finer fit
    kcap = settings.packed_capacity or settings.capacity
    quantum = max(1 << max(int(aligned_demand * 1.25) - 1, 1).bit_length() - 3,
                  min_capacity // 8)
    kwant = min(max(min_capacity,
                    -(-int(aligned_demand * 1.25) // quantum) * quantum),
                max_capacity)
    if kwant > kcap or kwant < kcap // 2:
        settings = dataclasses.replace(settings, packed_capacity=kwant)
        changed = True
    return settings, changed


def _train_step_core(ts: TrainState, cam, gt, bg, *, tx, sh_degree, settings,
                     lambda_dssim):
    """One fused render+loss+grad+Adam+stats step (untraced core)."""
    n = ts.params.xyz.shape[0]

    def loss_fn(params, off):
        out = render(cam, params, ts.gstate.alive, sh_degree, bg, settings,
                     means2d_offset=off)
        loss = losses.photometric_loss(out["render"], gt, lambda_dssim)
        return loss, out

    (loss, out), (gparams, goff) = jax.value_and_grad(
        loss_fn, argnums=(0, 1), has_aux=True)(
            ts.params, jnp.zeros((n, 2), jnp.float32))

    # Dead (padding) slots carry no loss signal but can produce NaN gradients
    # through their degenerate parameters; freeze them hard so Adam never
    # moves a slot until densification writes it.
    alive = ts.gstate.alive
    gparams = jax.tree_util.tree_map(
        lambda g: jnp.where(alive.reshape((n,) + (1,) * (g.ndim - 1)), g, 0.0),
        gparams)

    updates, opt_state = tx.update(gparams, ts.opt_state, ts.params)
    params = optax.apply_updates(ts.params, updates)
    gstate = dens.add_densification_stats(ts.gstate, out["radii"], goff)

    metrics = {
        "loss": loss,
        "psnr": losses.psnr(jnp.clip(out["render"], 0, 1), gt),
        "num_rendered": out["num_rendered"],
        "max_per_tile": out["max_per_tile"],
        "aligned_demand": out["aligned_demand"],
        # dropped == 0 <=> the backward took the fast sort-reduce path (the
        # drop-tolerant sort variant ran otherwise; see blend_pallas)
        "dropped": out["dropped"],
        "culled": out["culled"],
        "radii_max": jnp.max(out["radii"]),
    }
    return TrainState(params, gstate, opt_state, ts.step + 1), metrics


train_step = functools.partial(
    jax.jit, static_argnames=("tx", "sh_degree", "settings", "lambda_dssim")
)(_train_step_core)


@functools.partial(
    jax.jit,
    static_argnames=("tx", "sh_degree", "settings", "lambda_dssim"))
def train_steps(ts: TrainState, cams, gts, bgs, *, tx, sh_degree, settings,
                lambda_dssim):
    """B sequential train steps in ONE dispatch (lax.scan over a stacked
    camera pytree + (B, 3, H, W) GT batch + (B, 3) per-step backgrounds).

    Identical math to B ``train_step`` calls — the scan carries the exact
    same state chain, and per-step backgrounds scan along so
    ``random_background`` draws one color per iteration exactly like
    per-iteration stepping — but pays the host->device dispatch latency once
    per block instead of once per iteration (~30 ms per call over a tunneled
    device; on pods this also shrinks the host control gap). Returns stacked
    (B, ...) metrics."""
    def one(ts, inp):
        cam, gt, bg = inp
        return _train_step_core(ts, cam, gt, bg, tx=tx, sh_degree=sh_degree,
                                settings=settings, lambda_dssim=lambda_dssim)

    return jax.lax.scan(one, ts, (cams, gts, bgs))


@functools.partial(jax.jit, static_argnames=("cfg", "use_size_prune"))
def densify_step(ts: TrainState, key, extent, *, cfg: optim.OptimizationParams,
                 use_size_prune: bool):
    params, gstate, opt_state, report = dens.densify_and_prune(
        ts.params, ts.gstate, ts.opt_state, key,
        cfg.densify_grad_threshold, 0.005, extent, use_size_prune,
        cfg.percent_dense)
    return TrainState(params, gstate, opt_state, ts.step), report


@jax.jit
def reset_opacity_step(ts: TrainState):
    params, opt_state = dens.reset_opacity(ts.params, ts.opt_state)
    return TrainState(params, ts.gstate, opt_state, ts.step)


@dataclasses.dataclass
class Trainer:
    """Host-side orchestration mirroring reference training() (train.py:31-132)."""

    gaussians: gm.GaussianModel
    opt: optim.OptimizationParams = optim.OptimizationParams()
    settings: rast.RasterizeSettings = rast.RasterizeSettings()
    white_background: bool = False
    cameras_extent: float = 1.0
    seed: int = 0
    debug: bool = False          # reference --debug failure capture
    debug_from: int = -1
    snapshot_dir: str = "."
    auto_grow: bool = True
    auto_tune_capacity: bool = True   # re-bucket instance capacity to demand
    tune_interval: int = 500
    min_capacity: int = 1 << 16
    max_capacity: int = 1 << 23

    def __post_init__(self):
        self.tx = optim.make_optimizer(self.opt, self.gaussians.spatial_lr_scale)
        self.ts = TrainState(
            params=self.gaussians.params,
            gstate=self.gaussians.state,
            opt_state=self.tx.init(self.gaussians.params),
            step=jnp.asarray(0),
        )
        self.key = jax.random.PRNGKey(self.seed)
        self.bg = jnp.asarray(
            [1.0, 1.0, 1.0] if self.white_background else [0.0, 0.0, 0.0])
        self._expand_auto = self.settings.expand == "auto"
        self._drop_warned = 0
        self._resolve_expand()

    def _resolve_expand(self):
        """Resolve ``expand='auto'`` to the run-length scatter expansion.

        Historical context: dense mode existed because the old multi-column
        diff-scatter expansion serialized at O(N) rows (~220 ms at 5M
        gaussians). The round-5 expansion (single-column owner scatter +
        row gather, ops/binning._expand_rows) removed that wall, and the
        scatter mode's smaller sort domain beats dense even at garden scale
        (tools/bench_garden.py --seqscatter: fwd 324 vs 420 ms at
        5M/1080p) — while also never dropping instances at a dense_cap.
        Dense remains an explicit opt-in."""
        if not self._expand_auto:
            return False
        if self.settings.expand != "scatter":
            self.settings = dataclasses.replace(self.settings,
                                                expand="scatter")
            return True
        return False

    def _check_drops(self, metrics):
        """Surface instance drops (caps/dense_cap/capacity overflow) and
        self-heal dense-mode underexpansion by escalating ``dense_cap``.

        Silent drops are the classic garden failure mode (DESIGN.md: a run
        that flatlines at ~9 dB from step 0 with nothing obviously failing);
        the monitor exists — make it loud and, where the cause is the static
        dense cap, fix it like every other capacity re-bucketing."""
        dropped = int(metrics["dropped"])
        if dropped <= 0:
            return
        if self.settings.expand == "dense" and self.settings.dense_cap < 64:
            self.settings = dataclasses.replace(
                self.settings, dense_cap=self.settings.dense_cap * 2)
            metrics["retuned_dense_cap"] = self.settings.dense_cap
            print(f"[warn] {dropped} instances dropped under dense "
                  f"expansion; escalating dense_cap to "
                  f"{self.settings.dense_cap} (recompile)")
        elif self._drop_warned < 8:
            self._drop_warned += 1
            print(f"[warn] {dropped} instances dropped "
                  f"(num_rendered={int(metrics['num_rendered'])}, "
                  f"aligned_demand={int(metrics['aligned_demand'])}, "
                  f"capacity={self.settings.capacity}, "
                  f"packed={self.settings.packed_capacity}); rendered image "
                  f"is missing contributors. On densifying scenes the usual "
                  f"cause is buffer re-bucketing LAGGING demand spikes — "
                  f"set tune_interval to the densification interval; "
                  f"otherwise raise capacity/max_per_tile or check init "
                  f"splat sizes")

    def sync_model(self):
        """Reflect device state back into the GaussianModel wrapper."""
        self.gaussians.params = self.ts.params
        self.gaussians.state = self.ts.gstate

    def step(self, cam, gt_image, iteration: int):
        """One training iteration given a camera + GT; handles the reference
        schedule (SH warmup, densify window, opacity reset).

        Callers that evaluate at milestone iterations should instead call
        ``grad_step`` -> report -> ``apply_schedule``: the reference runs
        ``training_report`` BEFORE the densify/opacity-reset block
        (train.py:107-123), so milestone evals must see pre-reset state."""
        metrics = self.grad_step(cam, gt_image, iteration)
        return self.apply_schedule(iteration, metrics)

    def grad_step(self, cam, gt_image, iteration: int):
        """The gradient phase only: SH warmup + fused render/loss/Adam."""
        # SH degree warmup every 1000 iterations (train.py:72-73)
        if iteration % 1000 == 0:
            self.gaussians.oneup_sh_degree()

        if self.opt.random_background:
            self.key, sub = jax.random.split(self.key)
            bg = jax.random.uniform(sub, (3,))
        else:
            bg = self.bg

        self.ts, metrics = train_step(
            self.ts, cam, gt_image, bg, tx=self.tx,
            sh_degree=self.gaussians.active_sh_degree,
            settings=self.settings, lambda_dssim=self.opt.lambda_dssim)

        if self.debug and (self.debug_from < 0 or iteration >= self.debug_from):
            import math
            if not math.isfinite(float(metrics["loss"])):
                path = os.path.join(self.snapshot_dir, "snapshot_fw.pkl")
                self.dump_debug_snapshot(cam, gt_image, iteration, path)
                raise FloatingPointError(
                    f"non-finite loss at iteration {iteration}; inputs "
                    f"dumped to {path}")
        return metrics

    def apply_schedule(self, iteration: int, metrics):
        """Density control + capacity management for one iteration
        (reference train.py:112-123; runs AFTER training_report there)."""
        # densification window (train.py:112-123)
        if iteration < self.opt.densify_until_iter:
            if (iteration > self.opt.densify_from_iter
                    and iteration % self.opt.densification_interval == 0):
                self.key, sub = jax.random.split(self.key)
                use_size = iteration > self.opt.opacity_reset_interval
                self.ts, report = densify_step(
                    self.ts, sub, jnp.asarray(self.cameras_extent),
                    cfg=self.opt, use_size_prune=use_size)
                metrics["densify"] = report
            if iteration % self.opt.opacity_reset_interval == 0 or (
                    self.white_background
                    and iteration == self.opt.densify_from_iter):
                self.ts = reset_opacity_step(self.ts)
            if self.auto_grow and "densify" in metrics:
                if self.maybe_grow():
                    metrics["grew_capacity"] = self.ts.params.xyz.shape[0]

        # instance-capacity re-bucketing onto the measured demand (see
        # tune_capacity), drop monitoring, and expand-mode re-resolution —
        # all on the same host-sync cadence
        if self.auto_tune_capacity and iteration % self.tune_interval == 0:
            new_settings, tuned = tune_capacity(
                self.settings, int(metrics["num_rendered"]),
                int(metrics["aligned_demand"]),
                self.min_capacity, self.max_capacity)
            if tuned:
                self.settings = new_settings
                metrics["retuned_capacity"] = new_settings.capacity
            self._check_drops(metrics)
            self._resolve_expand()
        return metrics

    def step_block(self, cams, gts, first_iteration: int):
        """Run ``B = gts.shape[0]`` sequential iterations in ONE device
        dispatch (train_steps' lax.scan): bitwise the same step chain as B
        ``step`` calls, minus B-1 dispatch round-trips. Schedule events (SH
        warmup / densify / opacity reset / autotune) whose iteration falls
        inside the block are applied at its edges (warmup before, density
        control after); pick a block size dividing densification_interval
        (default 100) so events land exactly on block boundaries and the
        trajectory matches per-iteration stepping. ``cams`` is a stacked
        CameraParams pytree (leading axis B).

        As with ``step``, milestone-evaluating callers should use
        ``grad_step_block`` -> report -> ``apply_schedule_block`` so evals
        see pre-densify/pre-reset state (reference train.py:107-123)."""
        b = int(gts.shape[0])
        metrics = self.grad_step_block(cams, gts, first_iteration)
        return self.apply_schedule_block(
            first_iteration, first_iteration + b - 1, metrics)

    def grad_step_block(self, cams, gts, first_iteration: int):
        """Gradient phase of ``step_block``: B scanned steps, one dispatch."""
        b = int(gts.shape[0])
        it0, it1 = first_iteration, first_iteration + b - 1  # inclusive
        block = range(it0, it1 + 1)
        if any(i % 1000 == 0 for i in block):
            self.gaussians.oneup_sh_degree()
        if self.opt.random_background:
            # one background per iteration, as in per-iteration stepping
            self.key, sub = jax.random.split(self.key)
            bgs = jax.random.uniform(sub, (b, 3))
        else:
            bgs = jnp.broadcast_to(self.bg, (b, 3))

        self.ts, ms = train_steps(
            self.ts, cams, gts, bgs, tx=self.tx,
            sh_degree=self.gaussians.active_sh_degree,
            settings=self.settings, lambda_dssim=self.opt.lambda_dssim)
        return {k: v[-1] for k, v in ms.items()}

    def apply_schedule_block(self, it0: int, it1: int, metrics):
        """Density control + capacity management for a completed block."""
        block = range(it0, it1 + 1)
        opt = self.opt
        if it0 < opt.densify_until_iter:
            if any(i > opt.densify_from_iter
                   and i % opt.densification_interval == 0 for i in block):
                self.key, sub = jax.random.split(self.key)
                use_size = it1 > opt.opacity_reset_interval
                self.ts, report = densify_step(
                    self.ts, sub, jnp.asarray(self.cameras_extent),
                    cfg=opt, use_size_prune=use_size)
                metrics["densify"] = report
            if any(i % opt.opacity_reset_interval == 0 for i in block) or (
                    self.white_background
                    and it0 <= opt.densify_from_iter <= it1):
                self.ts = reset_opacity_step(self.ts)
            if self.auto_grow and "densify" in metrics:
                if self.maybe_grow():
                    metrics["grew_capacity"] = self.ts.params.xyz.shape[0]

        if self.auto_tune_capacity and any(
                i % self.tune_interval == 0 for i in block):
            new_settings, tuned = tune_capacity(
                self.settings, int(metrics["num_rendered"]),
                int(metrics["aligned_demand"]),
                self.min_capacity, self.max_capacity)
            if tuned:
                self.settings = new_settings
                metrics["retuned_capacity"] = new_settings.capacity
            self._check_drops(metrics)
            self._resolve_expand()
        return metrics

    def maybe_grow(self, headroom: float = 0.85, factor: int = 2) -> bool:
        """Host-side capacity growth: when densification fills the padded
        arrays past ``headroom``, double every per-Gaussian buffer (params,
        stats, Adam moments) and re-jit at the new bucket size. This replaces
        the reference's per-call tensor reallocation + optimizer surgery
        (gaussian_model.py:394-464) with a handful of bucketed shapes over a
        whole run."""
        alive = int(jnp.sum(self.ts.gstate.alive))
        cap = self.ts.params.xyz.shape[0]
        if alive < headroom * cap:
            return False
        new_cap = cap * factor

        def pad(leaf):
            if hasattr(leaf, "ndim") and leaf.ndim >= 1 and leaf.shape[0] == cap:
                pad_width = [(0, new_cap - cap)] + [(0, 0)] * (leaf.ndim - 1)
                return jnp.pad(leaf, pad_width)
            return leaf

        params = gm.GaussianParams(*[pad(l) for l in self.ts.params])
        # keep dead-slot quaternions at identity (NaN containment)
        rot = params.rotation.at[cap:, 0].set(1.0)
        params = params._replace(rotation=rot)
        gstate = gm.GaussianState(*[pad(l) for l in self.ts.gstate])
        opt_state = jax.tree_util.tree_map(pad, self.ts.opt_state)
        self.ts = TrainState(params, gstate, opt_state, self.ts.step)
        return True

    def dump_debug_snapshot(self, cam, gt, iteration: int, path: str):
        """Failure-capture fixture (reference --debug snapshot_fw.dump,
        diff_gaussian_rasterization/__init__.py:83-92): persist the full
        input tuple of the failing step for offline repro."""
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        payload = {
            "iteration": iteration,
            "cam": {"view": np.asarray(cam.view),
                    "full_proj": np.asarray(cam.full_proj),
                    "campos": np.asarray(cam.campos),
                    "tan_fovx": cam.tan_fovx, "tan_fovy": cam.tan_fovy,
                    "width": cam.width, "height": cam.height},
            "gt": np.asarray(gt),
            "params": jax.tree_util.tree_map(np.asarray, self.ts.params),
            "gstate": jax.tree_util.tree_map(np.asarray, self.ts.gstate),
            "active_sh_degree": self.gaussians.active_sh_degree,
        }
        with open(path, "wb") as f:
            pickle.dump(payload, f)
        return path

    # ---- orbax checkpointing (multi-host-safe production format) ----------
    def save_checkpoint_orbax(self, path: str, iteration: int):
        """Async-capable orbax checkpoint of the full train state. Use this
        for pod-scale runs (atomic renames, per-array chunking); the pickle
        format below mirrors the reference's single-file torch.save."""
        import orbax.checkpoint as ocp

        tree = {
            "params": self.ts.params._asdict(),
            "gstate": self.ts.gstate._asdict(),
            "opt_state": self.ts.opt_state,
            "meta": {
                "iteration": jnp.asarray(iteration),
                "active_sh_degree": jnp.asarray(
                    self.gaussians.active_sh_degree),
                "spatial_lr_scale": jnp.asarray(
                    self.gaussians.spatial_lr_scale),
            },
        }
        with ocp.StandardCheckpointer() as ck:
            ck.save(os.path.abspath(path), tree)

    def restore_checkpoint_orbax(self, path: str) -> int:
        import orbax.checkpoint as ocp

        template = {
            "params": self.ts.params._asdict(),
            "gstate": self.ts.gstate._asdict(),
            "opt_state": self.ts.opt_state,
            "meta": {
                "iteration": jnp.asarray(0),
                "active_sh_degree": jnp.asarray(0),
                "spatial_lr_scale": jnp.asarray(0.0),
            },
        }
        with ocp.StandardCheckpointer() as ck:
            tree = ck.restore(os.path.abspath(path), template)
        self.gaussians.active_sh_degree = int(tree["meta"]["active_sh_degree"])
        self.gaussians.spatial_lr_scale = float(
            tree["meta"]["spatial_lr_scale"])
        iteration = int(tree["meta"]["iteration"])
        self.ts = TrainState(
            params=gm.GaussianParams(**tree["params"]),
            gstate=gm.GaussianState(**tree["gstate"]),
            opt_state=tree["opt_state"],
            step=jnp.asarray(iteration),
        )
        self.sync_model()
        return iteration

    # ---- checkpointing (reference capture/restore, gaussian_model.py:75-111)
    def save_checkpoint(self, path: str, iteration: int):
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        payload = {
            "iteration": iteration,
            "active_sh_degree": self.gaussians.active_sh_degree,
            "spatial_lr_scale": self.gaussians.spatial_lr_scale,
            "params": jax.tree_util.tree_map(np.asarray, self.ts.params),
            "gstate": jax.tree_util.tree_map(np.asarray, self.ts.gstate),
            "opt_state": jax.tree_util.tree_map(np.asarray, self.ts.opt_state),
        }
        with open(path, "wb") as f:
            pickle.dump(payload, f)

    def restore_checkpoint(self, path: str) -> int:
        with open(path, "rb") as f:
            payload = pickle.load(f)
        self.gaussians.active_sh_degree = payload["active_sh_degree"]
        self.gaussians.spatial_lr_scale = payload["spatial_lr_scale"]
        to_dev = functools.partial(jax.tree_util.tree_map, jnp.asarray)
        # Legacy (pre-flat SH layout) checkpoints carry rank-3 leaves in BOTH
        # the params and the Adam moments; normalize the whole GaussianParams
        # nodes of the optimizer state too, or the first restored step fails
        # on a (P, K-1, 3) moment vs (P, 3(K-1)) gradient shape mismatch.
        opt_state = jax.tree_util.tree_map(jnp.asarray, payload["opt_state"])
        opt_state = jax.tree_util.tree_map(
            lambda x: gm.normalize_params(x)
            if isinstance(x, gm.GaussianParams) else x,
            opt_state,
            is_leaf=lambda x: isinstance(x, gm.GaussianParams))
        self.ts = TrainState(
            params=gm.normalize_params(
                gm.GaussianParams(*to_dev(tuple(payload["params"])))),
            gstate=gm.GaussianState(*to_dev(tuple(payload["gstate"]))),
            opt_state=opt_state,
            step=jnp.asarray(payload["iteration"]),
        )
        self.sync_model()
        return payload["iteration"]


def training(scene, trainer: Trainer, iterations: int,
             save_iterations=(), checkpoint_iterations=(),
             log_every: int = 100, progress=None):
    """Full loop over a Scene (reference training(), train.py:31-132)."""
    rng = np.random.default_rng(trainer.seed)
    cam_params = None
    stack = []
    gt_cache = {}
    history = []
    t0 = time.time()
    for iteration in range(1, iterations + 1):
        if not stack:
            stack = list(rng.permutation(len(scene.get_train_cameras())))
        cam = scene.get_train_cameras()[stack.pop()]
        if cam_params is None:
            cam_params = {}
        cp = cam_params.setdefault(cam.uid, cam.params())
        # GT stays cached on device: re-uploading it every iteration costs
        # more than the train step over a tunneled device
        gt = gt_cache.get(cam.uid)
        if gt is None:
            gt = gt_cache[cam.uid] = jnp.asarray(cam.image)

        metrics = trainer.step(cp, gt, iteration)
        if iteration % log_every == 0 or iteration == iterations:
            m = {k: float(v) for k, v in metrics.items() if k != "densify"}
            m["iter"] = iteration
            m["elapsed"] = time.time() - t0
            m["alive"] = int(jnp.sum(trainer.ts.gstate.alive))
            history.append(m)
            if progress:
                progress(m)
        if iteration in save_iterations:
            trainer.sync_model()
            scene.save(iteration)
        if iteration in checkpoint_iterations:
            trainer.save_checkpoint(
                os.path.join(scene.model_path, f"chkpnt{iteration}.ckpt"),
                iteration)
    trainer.sync_model()
    return history
