"""Quaternion / scaling / 3D-covariance math.

Behavioral parity targets (reference, /root/reference):
- utils/general_utils.py:78-110 (``build_rotation``, ``build_scaling_rotation``)
- submodules/diff-gaussian-rasterization/cuda_rasterizer/forward.cu:118-152
  (``computeCov3D``: Sigma = M^T M with M = S * R in glm column-major, which in
  row-major convention is Sigma = R S S^T R^T).

All functions are batched over a leading N axis and are plain JAX (VPU work).
Quaternion layout is (w, x, y, z), matching the reference.
"""

from __future__ import annotations

import jax.numpy as jnp


def quat_to_rotmat(q: jnp.ndarray, normalize: bool = True) -> jnp.ndarray:
    """(N, 4) wxyz quaternions -> (N, 3, 3) rotation matrices.

    Matches reference utils/general_utils.py:78-99 (which normalizes) and the
    CUDA forward (which receives already-normalized quats).
    """
    if normalize:
        q = q / jnp.sqrt(jnp.maximum(
            jnp.sum(q * q, axis=-1, keepdims=True), 1e-16))
    r, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    R = jnp.stack(
        [
            1.0 - 2.0 * (y * y + z * z), 2.0 * (x * y - r * z), 2.0 * (x * z + r * y),
            2.0 * (x * y + r * z), 1.0 - 2.0 * (x * x + z * z), 2.0 * (y * z - r * x),
            2.0 * (x * z - r * y), 2.0 * (y * z + r * x), 1.0 - 2.0 * (x * x + y * y),
        ],
        axis=-1,
    )
    return R.reshape(q.shape[:-1] + (3, 3))


def build_scaling_rotation(s: jnp.ndarray, q: jnp.ndarray) -> jnp.ndarray:
    """L = R @ diag(s); reference utils/general_utils.py:101-110."""
    R = quat_to_rotmat(q)
    return R * s[..., None, :]


def build_covariance_3d(scaling: jnp.ndarray, scaling_modifier: float,
                        rotation: jnp.ndarray) -> jnp.ndarray:
    """(N, 3) scales + (N, 4) quats -> (N, 3, 3) world covariance.

    Sigma = L L^T with L = R diag(s * mod); reference
    scene/gaussian_model.py:36-43 / forward.cu:118-152.
    """
    L = build_scaling_rotation(scaling * scaling_modifier, rotation)
    return L @ jnp.swapaxes(L, -1, -2)


def strip_symmetric(cov: jnp.ndarray) -> jnp.ndarray:
    """(N, 3, 3) symmetric -> (N, 6) upper-triangular packing.

    Order (xx, xy, xz, yy, yz, zz), reference forward.cu:145-151.
    """
    return jnp.stack(
        [cov[..., 0, 0], cov[..., 0, 1], cov[..., 0, 2],
         cov[..., 1, 1], cov[..., 1, 2], cov[..., 2, 2]],
        axis=-1,
    )


def unstrip_symmetric(cov6: jnp.ndarray) -> jnp.ndarray:
    """(N, 6) packed -> (N, 3, 3) symmetric."""
    xx, xy, xz, yy, yz, zz = [cov6[..., i] for i in range(6)]
    return jnp.stack(
        [jnp.stack([xx, xy, xz], -1),
         jnp.stack([xy, yy, yz], -1),
         jnp.stack([xz, yz, zz], -1)],
        axis=-2,
    )


def inverse_sigmoid(x: jnp.ndarray) -> jnp.ndarray:
    """Reference utils/general_utils.py:18-19."""
    return jnp.log(x / (1.0 - x))
