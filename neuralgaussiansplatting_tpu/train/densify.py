"""Adaptive density control under static shapes (clone / split / prune).

Behavioral parity target: reference scene/gaussian_model.py
(``densify_and_clone`` :517-532, ``densify_and_split`` :490-515,
``densify_and_prune`` :534-548, ``add_densification_stats`` :550-552,
``reset_opacity`` :331-334, ``densification_postfix`` accumulator resets :466-
488, Adam-state surgery :394-464).

TPU-native redesign: all arrays are capacity-padded with an ``alive`` mask, so
clone = masked scatter of candidate rows into free (dead) slots; split = one
sampled replacement in place + one sampled copy into a free slot (identical to
the reference's "emit N=2 new, prune the original"); prune = mask clear.
Optimizer moments ride along: rows written by clone/split are zeroed (the
reference's cat_tensors_to_optimizer zero-init), everything else is untouched
(the reference's _prune_optimizer gather is the identity here because slots
never move). No reallocation, no host sync, fully jittable.

Replicated reference quirk (documented deliberately): ``densification_postfix``
zeroes ``max_radii2D`` *before* the prune step reads it (gaussian_model.py:488
vs :543), so the screen-size prune (``big_points_vs``) can never fire; only
the opacity and world-size prunes are active. We reproduce that behavior
exactly rather than "fixing" the training dynamics.

If free capacity runs out, surplus clones/splits are skipped (deepest-indexed
candidates first); the true demand is returned for monitoring so the host can
re-bucket capacity between jit shapes.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from neuralgaussiansplatting_tpu.models.gaussians import (
    GaussianParams, GaussianState, get_opacity, get_scaling,
)
from neuralgaussiansplatting_tpu.ops.transforms import inverse_sigmoid, quat_to_rotmat


class DensifyReport(NamedTuple):
    num_cloned: jnp.ndarray
    num_split: jnp.ndarray
    num_pruned: jnp.ndarray
    num_alive: jnp.ndarray
    demand: jnp.ndarray  # clones+splits requested (incl. skipped for capacity)


def _row_mask(mask: jnp.ndarray, like: jnp.ndarray) -> jnp.ndarray:
    return mask.reshape(mask.shape + (1,) * (like.ndim - 1))


def _scatter_rows(dst: jnp.ndarray, target: jnp.ndarray, src: jnp.ndarray):
    """dst[target[i]] = src[i] for in-range targets (out-of-range dropped)."""
    return dst.at[target].set(src, mode="drop")


def zero_moment_rows(opt_state, written: jnp.ndarray, capacity: int):
    """Zero optimizer-moment rows for freshly (re)written slots.

    Works structurally on any optax state: every array leaf whose leading axis
    equals the Gaussian capacity is treated as a per-Gaussian moment.
    """
    def fix(leaf):
        if hasattr(leaf, "ndim") and leaf.ndim >= 1 and leaf.shape[0] == capacity:
            return jnp.where(_row_mask(written, leaf), jnp.zeros_like(leaf), leaf)
        return leaf
    return jax.tree_util.tree_map(fix, opt_state)


def add_densification_stats(state: GaussianState, radii: jnp.ndarray,
                            means2d_grad: jnp.ndarray) -> GaussianState:
    """Per-iteration stats accumulation (reference train.py:115-116 +
    gaussian_model.py:550-552): mean-2D grad norms and max screen radii over
    visible Gaussians."""
    visible = radii > 0
    gnorm = jnp.linalg.norm(means2d_grad[:, :2], axis=-1)
    return state._replace(
        max_radii2d=jnp.where(
            visible, jnp.maximum(state.max_radii2d, radii.astype(jnp.float32)),
            state.max_radii2d),
        xyz_gradient_accum=state.xyz_gradient_accum + jnp.where(visible, gnorm, 0.0),
        denom=state.denom + visible.astype(jnp.float32),
    )


def densify_and_prune(
    params: GaussianParams,
    state: GaussianState,
    opt_state,
    key: jax.Array,
    max_grad: float,
    min_opacity: float,
    extent: float,
    use_size_prune: bool,
    percent_dense: float,
):
    """One density-control round (reference densify_and_prune :534-548)."""
    capacity = params.xyz.shape[0]
    alive = state.alive

    grads = jnp.where(state.denom > 0,
                      state.xyz_gradient_accum / jnp.maximum(state.denom, 1.0),
                      0.0)
    scal = get_scaling(params)
    smax = jnp.max(scal, axis=-1)

    hot = alive & (grads >= max_grad)
    clone_mask = hot & (smax <= percent_dense * extent)
    split_mask = hot & (smax > percent_dense * extent)

    # Free-slot allocation: dead slots in index order.
    free_slots = jnp.argsort(alive, stable=True)  # False (dead) sorts first
    num_free = capacity - jnp.sum(alive)

    clone_rank = jnp.cumsum(clone_mask) - 1
    clone_ok = clone_mask & (clone_rank < num_free)
    clone_target = jnp.where(
        clone_ok, free_slots[jnp.clip(clone_rank, 0, capacity - 1)], capacity)

    n_clones = jnp.sum(clone_ok)
    split_rank = jnp.cumsum(split_mask) - 1
    split_ok = split_mask & (n_clones + split_rank < num_free)
    split_target = jnp.where(
        split_ok,
        free_slots[jnp.clip(n_clones + split_rank, 0, capacity - 1)],
        capacity)

    # --- clone: copy candidate rows verbatim into free slots (:517-532).
    new_params = jax.tree_util.tree_map(
        lambda leaf: _scatter_rows(leaf, clone_target, leaf), params)

    # --- split: two N(mean, scale) samples rotated into world space
    # (:490-515); sample A replaces the original row, sample B goes to a
    # free slot; both get scaling / (0.8 * N) with N=2.
    k1, k2 = jax.random.split(key)
    R = quat_to_rotmat(params.rotation)
    samp_a = params.xyz + jnp.einsum(
        "nij,nj->ni", R, jax.random.normal(k1, scal.shape) * scal)
    samp_b = params.xyz + jnp.einsum(
        "nij,nj->ni", R, jax.random.normal(k2, scal.shape) * scal)
    new_scaling = jnp.log(scal / (0.8 * 2))

    # sample B rows into free slots: every attribute copies, xyz/scaling new
    split_src = params._replace(xyz=samp_b, scaling=new_scaling)
    new_params = jax.tree_util.tree_map(
        lambda dst, src: _scatter_rows(dst, split_target, src),
        new_params, split_src)
    # sample A in place
    m = _row_mask(split_ok, params.xyz)
    new_params = new_params._replace(
        xyz=jnp.where(m, samp_a, new_params.xyz),
        scaling=jnp.where(_row_mask(split_ok, params.scaling), new_scaling,
                          new_params.scaling),
    )

    alive = alive | jnp.zeros_like(alive).at[clone_target].set(True, mode="drop")
    alive = alive | jnp.zeros_like(alive).at[split_target].set(True, mode="drop")

    written = (jnp.zeros_like(alive).at[clone_target].set(True, mode="drop")
               | jnp.zeros_like(alive).at[split_target].set(True, mode="drop")
               | split_ok)
    opt_state = zero_moment_rows(opt_state, written, capacity)

    # --- prune (:541-547). big_points_vs is omitted: the reference resets
    # max_radii2D in densification_postfix before this comparison, so it is
    # always false (see module docstring).
    op = get_opacity(new_params, alive)
    prune = alive & (op < min_opacity)
    if use_size_prune:
        smax_new = jnp.max(get_scaling(new_params), axis=-1)
        prune = prune | (alive & (smax_new > 0.1 * extent))
    alive = alive & ~prune

    # postfix: reset accumulators & radii (:486-488)
    new_state = GaussianState(
        alive=alive,
        max_radii2d=jnp.zeros_like(state.max_radii2d),
        xyz_gradient_accum=jnp.zeros_like(state.xyz_gradient_accum),
        denom=jnp.zeros_like(state.denom),
    )
    report = DensifyReport(
        num_cloned=jnp.sum(clone_ok),
        num_split=jnp.sum(split_ok),
        num_pruned=jnp.sum(prune),
        num_alive=jnp.sum(alive),
        demand=jnp.sum(clone_mask) + jnp.sum(split_mask),
    )
    return new_params, new_state, opt_state, report


def reset_opacity(params: GaussianParams, opt_state):
    """Clamp opacity to <= 0.01 and zero its Adam moments (reference
    reset_opacity :331-334 + replace_tensor_to_optimizer :394-407)."""
    capacity = params.opacity.shape[0]
    new_op = inverse_sigmoid(jnp.minimum(
        jax.nn.sigmoid(params.opacity), 0.01))
    params = params._replace(opacity=new_op)

    # zero the opacity group's moments only: rows of arrays shaped like it
    def fix(leaf):
        if (hasattr(leaf, "ndim") and leaf.ndim == params.opacity.ndim
                and leaf.shape == params.opacity.shape):
            return jnp.zeros_like(leaf)
        return leaf
    opt_state = jax.tree_util.tree_map(fix, opt_state)
    return params, opt_state
