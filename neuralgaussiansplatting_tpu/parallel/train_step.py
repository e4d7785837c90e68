"""Data-parallel training step: camera batch sharded over the mesh,
Gaussian parameters replicated, gradients all-reduced over ICI.

Semantics: a batch of B cameras per optimizer step is the batched analog of B
sequential reference iterations — the loss is the mean over cameras, and the
densification statistics accumulate the per-camera viewspace-gradient norms
and visibility counts summed over the batch (reference train.py:113-116 +
gaussian_model.py:550-552 applied per camera).

Sharding recipe (scaling-book style): annotate the camera batch with
PartitionSpec("data") and the parameter pytree with replication; XLA inserts
the gradient psum over ICI and overlaps it with the backward pass.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from neuralgaussiansplatting_tpu.gaussian_renderer import render
from neuralgaussiansplatting_tpu.ops import rasterize as rast
from neuralgaussiansplatting_tpu.ops.preprocess import CameraParams
from neuralgaussiansplatting_tpu.train import densify as dens
from neuralgaussiansplatting_tpu.train.loop import TrainState
from neuralgaussiansplatting_tpu.utils import losses


def stack_cameras(cams) -> CameraParams:
    """Stack equal-resolution CameraParams into one batched pytree
    (leading axis = camera)."""
    first = cams[0]
    for c in cams[1:]:
        if (c.tan_fovx, c.tan_fovy, c.width, c.height) != (
                first.tan_fovx, first.tan_fovy, first.width, first.height):
            raise ValueError(
                "stack_cameras requires identical static intrinsics "
                f"(tan_fov/size); got {(c.tan_fovx, c.tan_fovy, c.width, c.height)} "
                f"vs {(first.tan_fovx, first.tan_fovy, first.width, first.height)} "
                "— batch only cameras that share them (or use "
                "steps_per_call=1 / per-resolution groups)")
    return CameraParams(
        view=jnp.stack([jnp.asarray(c.view) for c in cams]),
        full_proj=jnp.stack([jnp.asarray(c.full_proj) for c in cams]),
        campos=jnp.stack([jnp.asarray(c.campos) for c in cams]),
        tan_fovx=first.tan_fovx, tan_fovy=first.tan_fovy,
        width=first.width, height=first.height,
    )


def make_dp_train_step(mesh, tx, *, sh_degree: int,
                       settings: rast.RasterizeSettings,
                       lambda_dssim: float = 0.2):
    """Build the jitted sharded step: (TrainState, cam_batch, gt_batch, bg)
    -> (TrainState, metrics)."""

    def step(ts: TrainState, cams: CameraParams, gts: jnp.ndarray,
             bg: jnp.ndarray):
        n = ts.params.xyz.shape[0]
        b = gts.shape[0]
        alive = ts.gstate.alive

        def loss_fn(params, off):
            def one(cam, gt, off_i):
                out = render(cam, params, alive, sh_degree, bg, settings,
                             means2d_offset=off_i)
                mon = {k: out[k] for k in
                       ("radii", "num_rendered", "max_per_tile",
                        "aligned_demand", "dropped", "culled")}
                mon["psnr"] = losses.psnr(jnp.clip(out["render"], 0, 1), gt)
                return (losses.photometric_loss(out["render"], gt,
                                                lambda_dssim), mon)
            per_cam_loss, mon = jax.vmap(one)(cams, gts, off)
            return per_cam_loss.mean(), mon

        (loss, mon), (gparams, goff) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True)(
                ts.params, jnp.zeros((b, n, 2), jnp.float32))
        radii = mon["radii"]

        gparams = jax.tree_util.tree_map(
            lambda g: jnp.where(
                alive.reshape((n,) + (1,) * (g.ndim - 1)), g, 0.0),
            gparams)

        updates, opt_state = tx.update(gparams, ts.opt_state, ts.params)
        params = optax.apply_updates(ts.params, updates)

        # batched densification stats: sum of per-camera accumulations.
        # goff is the mean-over-batch gradient scaled by 1/B through the
        # mean loss; the reference accumulates per-iteration (per-camera)
        # norms, so rescale by B to keep the same threshold semantics.
        visible = radii > 0                       # (B, N)
        gnorm = jnp.linalg.norm(goff[..., :2], axis=-1) * b   # (B, N)
        gstate = ts.gstate._replace(
            max_radii2d=jnp.maximum(
                ts.gstate.max_radii2d,
                jnp.max(jnp.where(visible, radii, 0), axis=0).astype(jnp.float32)),
            xyz_gradient_accum=ts.gstate.xyz_gradient_accum
            + jnp.sum(jnp.where(visible, gnorm, 0.0), axis=0),
            denom=ts.gstate.denom + jnp.sum(visible, axis=0).astype(jnp.float32),
        )
        # full monitor set, batch-reduced: capacity monitors take the max
        # over the batch (they size static buffers), quality metrics the mean
        metrics = {
            "loss": loss,
            "psnr": jnp.mean(mon["psnr"]),
            "num_rendered": jnp.max(mon["num_rendered"]),
            "max_per_tile": jnp.max(mon["max_per_tile"]),
            "aligned_demand": jnp.max(mon["aligned_demand"]),
            "dropped": jnp.max(mon["dropped"]),
            "culled": jnp.max(mon["culled"]),
            "radii_max": jnp.max(radii),
        }
        return TrainState(params, gstate, opt_state, ts.step + 1), metrics

    # Input placement (shard_batch / replicate_state) carries the shardings;
    # jit propagates them and inserts the gradient all-reduce over ICI.
    return jax.jit(step, donate_argnums=(0,))


def shard_batch(mesh, cams: CameraParams, gts: jnp.ndarray):
    """Place a camera batch + GT images with the DP sharding."""
    batch_sh = NamedSharding(mesh, P("data"))
    cams = CameraParams(
        view=jax.device_put(cams.view, batch_sh),
        full_proj=jax.device_put(cams.full_proj, batch_sh),
        campos=jax.device_put(cams.campos, batch_sh),
        tan_fovx=cams.tan_fovx, tan_fovy=cams.tan_fovy,
        width=cams.width, height=cams.height,
    )
    return cams, jax.device_put(gts, batch_sh)


def replicate_state(mesh, ts: TrainState) -> TrainState:
    """Replicate the parameter/optimizer pytrees across all mesh devices."""
    repl = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, repl) if hasattr(x, "ndim") else x, ts)


# ---------------------------------------------------------------------------
# Multi-device trainer: full reference schedule on sharded state
# ---------------------------------------------------------------------------

class DPTrainer:
    """Data-parallel trainer with the full reference schedule (densify /
    opacity reset / capacity autotune) on mesh-sharded state.

    Promotes the one-step DP demo to a real trainer: each optimizer step
    consumes a batch of B cameras (sharded over the mesh's ``data`` axis;
    Gaussian state replicated, gradient psum over ICI), and the reference's
    per-iteration schedule (train.py:112-123) is applied on the *camera
    counter* — a batch step advances it by B, so densify cadence /
    opacity-reset cadence / SH warmup match B sequential reference
    iterations. Host-side control decisions (growth, autotune) depend only on
    metrics that are identical across processes (multi-controller safe; see
    parallel/distributed.host_broadcast_pytree for the guard helpers).
    """

    def __init__(self, gaussians, mesh, opt=None, settings=None,
                 batch_size=None, white_background=False, cameras_extent=1.0,
                 seed=0, auto_grow=True, auto_tune_capacity=True,
                 tune_interval=500):
        from neuralgaussiansplatting_tpu.train import loop as loop_mod
        from neuralgaussiansplatting_tpu.train import optim

        self.gaussians = gaussians
        self.mesh = mesh
        self.opt = opt or optim.OptimizationParams()
        self.settings = settings or rast.RasterizeSettings()
        self.batch_size = batch_size or mesh.shape["data"]
        self.white_background = white_background
        self.cameras_extent = cameras_extent
        self.auto_grow = auto_grow
        self.auto_tune_capacity = auto_tune_capacity
        self.tune_interval = tune_interval
        self._loop = loop_mod

        self.tx = optim.make_optimizer(self.opt, gaussians.spatial_lr_scale)
        ts = loop_mod.TrainState(
            params=gaussians.params, gstate=gaussians.state,
            opt_state=self.tx.init(gaussians.params), step=jnp.asarray(0))
        self.ts = replicate_state(mesh, ts)
        self.key = jax.random.PRNGKey(seed)
        self.bg = jnp.asarray(
            [1.0, 1.0, 1.0] if white_background else [0.0, 0.0, 0.0])
        self._steps = {}
        self._camera_iter = 0   # cameras consumed so far (reference iters)

    def _step_fn(self):
        key = (self.gaussians.active_sh_degree, self.settings)
        if key not in self._steps:
            self._steps[key] = make_dp_train_step(
                self.mesh, self.tx,
                sh_degree=self.gaussians.active_sh_degree,
                settings=self.settings,
                lambda_dssim=self.opt.lambda_dssim)
        return self._steps[key]

    def step(self, cams, gts):
        """One DP optimizer step over a list of B per-view CameraParams and
        a (B, 3, H, W) GT batch. Returns the metrics dict."""
        b = len(cams) if isinstance(cams, (list, tuple)) else gts.shape[0]
        it0 = self._camera_iter
        self._camera_iter += b
        it1 = self._camera_iter

        def crossed(interval, after=0):
            """Did (it0, it1] cross a multiple m of ``interval`` with
            m > after? Mirrors the reference gate ``iteration > after and
            iteration % interval == 0`` (train.py:118) batched over the
            step's camera range."""
            m = (it1 // interval) * interval
            return m > it0 and m > after

        if crossed(1000):
            self.gaussians.oneup_sh_degree()

        batch = stack_cameras(cams) if isinstance(cams, (list, tuple)) else cams
        batch, gts = shard_batch(self.mesh, batch, jnp.asarray(gts))
        self.ts, metrics = self._step_fn()(self.ts, batch, gts, self.bg)

        opt = self.opt
        if it1 <= opt.densify_until_iter:
            if crossed(opt.densification_interval,
                       after=opt.densify_from_iter):
                self.key, sub = jax.random.split(self.key)
                use_size = it1 > opt.opacity_reset_interval
                self.ts, report = self._loop.densify_step(
                    self.ts, sub, jnp.asarray(self.cameras_extent),
                    cfg=opt, use_size_prune=use_size)
                metrics["densify"] = report
            if crossed(opt.opacity_reset_interval) or (
                    self.white_background
                    and it0 < opt.densify_from_iter <= it1):
                self.ts = self._loop.reset_opacity_step(self.ts)
            if self.auto_grow and "densify" in metrics:
                if self.maybe_grow():
                    metrics["grew_capacity"] = self.ts.params.xyz.shape[0]

        if self.auto_tune_capacity and crossed(self.tune_interval):
            new_settings, tuned = self._loop.tune_capacity(
                self.settings, int(metrics["num_rendered"]),
                int(metrics["aligned_demand"]))
            if tuned:
                self.settings = new_settings
                metrics["retuned_capacity"] = new_settings.capacity
        return metrics

    def maybe_grow(self, headroom: float = 0.85, factor: int = 2) -> bool:
        """Capacity growth on sharded state (duck-typed reuse of
        Trainer.maybe_grow — it only touches ``self.ts`` — followed by
        re-replication and a step-cache flush for the new bucket shape)."""
        grown = self._loop.Trainer.maybe_grow(self, headroom, factor)
        if grown:
            self.ts = replicate_state(self.mesh, self.ts)
            self._steps.clear()
        return grown

    # reference-format pickle checkpoints, reusing the single-device
    # implementations (they only touch self.gaussians / self.ts); restore
    # re-places the state onto the mesh
    def save_checkpoint(self, path: str, iteration: int):
        self._loop.Trainer.save_checkpoint(self, path, iteration)

    def restore_checkpoint(self, path: str) -> int:
        it = self._loop.Trainer.restore_checkpoint(self, path)
        self.ts = replicate_state(self.mesh, self.ts)
        self._camera_iter = it
        self._steps.clear()
        return it

    def sync_model(self):
        self.gaussians.params = self.ts.params
        self.gaussians.state = self.ts.gstate


def training_dp(scene, trainer: DPTrainer, iterations: int, log_every=100,
                progress=None):
    """DP analog of train/loop.py:training — consumes the camera stack in
    batches of ``trainer.batch_size``; ``iterations`` counts cameras
    (reference iterations), not optimizer steps."""
    import numpy as np
    rng = np.random.default_rng(0)
    stack, cam_cache = [], {}
    history = []
    while trainer._camera_iter < iterations:
        b = trainer.batch_size
        while len(stack) < b:
            stack.extend(rng.permutation(len(scene.get_train_cameras())))
        picks = [scene.get_train_cameras()[int(stack.pop())]
                 for _ in range(b)]
        cams = [cam_cache.setdefault(c.uid, c.params()) for c in picks]
        gts = jnp.stack([jnp.asarray(c.image) for c in picks])
        metrics = trainer.step(cams, gts)
        it = trainer._camera_iter
        if it % log_every < b or it >= iterations:
            m = {k: float(v) for k, v in metrics.items() if k != "densify"}
            m["iter"] = it
            history.append(m)
            if progress:
                progress(m)
    trainer.sync_model()
    return history
