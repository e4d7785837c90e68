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
                return (losses.photometric_loss(out["render"], gt,
                                                lambda_dssim),
                        out["radii"])
            per_cam_loss, radii = jax.vmap(one)(cams, gts, off)
            return per_cam_loss.mean(), radii

        (loss, radii), (gparams, goff) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True)(
                ts.params, jnp.zeros((b, n, 2), jnp.float32))

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
        metrics = {"loss": loss}
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
