"""Optax optimizer mirroring the reference per-group Adam setup.

Behavioral parity target: reference scene/gaussian_model.py:252-291
(``training_setup``: per-group LRs, Adam eps=1e-15; xyz on the exponential
log-lerp schedule with sine delay of utils/general_utils.py:29-62, scaled by
``spatial_lr_scale``) and arguments/__init__.py:71-90 for the default values.

The torch per-group Adam becomes ``optax.multi_transform`` over the
GaussianParams pytree labels; optimizer-state "surgery" during densification
becomes pure index ops on this state (see train/densify.py).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import optax

from neuralgaussiansplatting_tpu.models.gaussians import GaussianParams


@dataclasses.dataclass(frozen=True)
class OptimizationParams:
    """Reference arguments/__init__.py:71-90 (OptimizationParams)."""

    iterations: int = 30_000
    position_lr_init: float = 0.00016
    position_lr_final: float = 0.0000016
    position_lr_delay_mult: float = 0.01
    position_lr_max_steps: int = 30_000
    feature_lr: float = 0.0025
    opacity_lr: float = 0.05
    scaling_lr: float = 0.005
    rotation_lr: float = 0.001
    percent_dense: float = 0.01
    lambda_dssim: float = 0.2
    densification_interval: int = 100
    opacity_reset_interval: int = 3000
    densify_from_iter: int = 500
    densify_until_iter: int = 15_000
    densify_grad_threshold: float = 0.0002
    random_background: bool = False


def expon_lr_schedule(lr_init, lr_final, lr_delay_steps=0, lr_delay_mult=1.0,
                      max_steps=1_000_000):
    """Log-lerp decay with optional sine delay; reference
    utils/general_utils.py:29-62 (jax-traceable)."""

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        if lr_init == 0.0 and lr_final == 0.0:
            return jnp.zeros_like(step)
        if lr_delay_steps > 0:
            delay_rate = lr_delay_mult + (1 - lr_delay_mult) * jnp.sin(
                0.5 * jnp.pi * jnp.clip(step / lr_delay_steps, 0, 1))
        else:
            delay_rate = 1.0
        t = jnp.clip(step / max_steps, 0, 1)
        log_lerp = jnp.exp(jnp.log(lr_init) * (1 - t) + jnp.log(lr_final) * t)
        return delay_rate * log_lerp

    return schedule


PARAM_LABELS = GaussianParams(
    xyz="xyz", normals="frozen", features_dc="f_dc", features_rest="f_rest",
    features="features", scaling="scaling", rotation="rotation",
    opacity="opacity",
)


def _adam(lr, eps=1e-15):
    return optax.chain(optax.scale_by_adam(eps=eps),
                       optax.scale_by_learning_rate(lr))


def make_optimizer(opt: OptimizationParams, spatial_lr_scale: float):
    """Per-group Adam over GaussianParams; LRs per reference training_setup.

    ``normals`` are not in any reference optimizer group (they are carried
    data, gaussian_model.py:478-479 concatenates them outside the optimizer);
    we freeze them explicitly.
    """
    xyz_schedule = expon_lr_schedule(
        lr_init=opt.position_lr_init * spatial_lr_scale,
        lr_final=opt.position_lr_final * spatial_lr_scale,
        lr_delay_mult=opt.position_lr_delay_mult,
        max_steps=opt.position_lr_max_steps,
    )
    tx = optax.multi_transform(
        {
            "xyz": _adam(xyz_schedule),
            "f_dc": _adam(opt.feature_lr),
            "f_rest": _adam(opt.feature_lr / 20.0),
            "features": _adam(opt.feature_lr),
            "opacity": _adam(opt.opacity_lr),
            "scaling": _adam(opt.scaling_lr),
            "rotation": _adam(opt.rotation_lr),
            "frozen": optax.set_to_zero(),
        },
        PARAM_LABELS,
    )
    return tx
