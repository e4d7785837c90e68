"""Spherical-harmonics evaluation (degrees 0..3) and RGB<->SH DC helpers.

Behavioral parity targets (reference, /root/reference):
- utils/sh_utils.py:57-118 (``eval_sh``, ``RGB2SH``, ``SH2RGB``)
- submodules/diff-gaussian-rasterization/cuda_rasterizer/forward.cu:20-72
  (``computeColorFromSH``: +0.5 shift, clamp-at-zero with clamp tracking)

TPU notes: everything here is plain vectorized JAX — elementwise polynomials
over (N, 3) direction arrays map straight onto the VPU; no kernel needed.
"""

from __future__ import annotations

import jax.numpy as jnp

SH_C0 = 0.28209479177387814
SH_C1 = 0.4886025119029199
SH_C2 = (
    1.0925484305920792,
    -1.0925484305920792,
    0.31539156525252005,
    -1.0925484305920792,
    0.5462742152960396,
)
SH_C3 = (
    -0.5900435899266435,
    2.890611442640554,
    -0.4570457994644658,
    0.3731763325901154,
    -0.4570457994644658,
    1.445305721320277,
    -0.5900435899266435,
)


def num_sh_coeffs(degree: int) -> int:
    return (degree + 1) ** 2


def eval_sh(deg: int, sh: jnp.ndarray, dirs: jnp.ndarray) -> jnp.ndarray:
    """Evaluate real SH at unit directions.

    Args:
      deg: static degree in {0, 1, 2, 3}.
      sh: (..., K, C) coefficients with K >= (deg+1)**2, OR flat
        (..., K*3) in coefficient-major order ([l0 rgb, l1 rgb, ...]).
        The flat layout is the production one: rank-3 (N, K, 3) arrays get
        a TPU tiled layout that pads the 3-wide minor dim to 128 lanes
        (42x memory at multi-million-Gaussian scale — an observed 41 GB
        input-staging copy at 5M); flat 2-D coefficients avoid it.
      dirs: (..., 3) unit directions.

    Returns:
      (..., C) values (no +0.5 shift, no clamp — see ``sh_to_rgb_color``).
    """
    assert 0 <= deg <= 3
    if sh.ndim == dirs.ndim:          # flat coefficient-major layout
        c = lambda l: sh[..., 3 * l:3 * l + 3]
    else:
        c = lambda l: sh[..., l, :]
    result = SH_C0 * c(0)
    if deg > 0:
        x = dirs[..., 0:1]
        y = dirs[..., 1:2]
        z = dirs[..., 2:3]
        result = (
            result
            - SH_C1 * y * c(1)
            + SH_C1 * z * c(2)
            - SH_C1 * x * c(3)
        )
        if deg > 1:
            xx, yy, zz = x * x, y * y, z * z
            xy, yz, xz = x * y, y * z, x * z
            result = (
                result
                + SH_C2[0] * xy * c(4)
                + SH_C2[1] * yz * c(5)
                + SH_C2[2] * (2.0 * zz - xx - yy) * c(6)
                + SH_C2[3] * xz * c(7)
                + SH_C2[4] * (xx - yy) * c(8)
            )
            if deg > 2:
                result = (
                    result
                    + SH_C3[0] * y * (3.0 * xx - yy) * c(9)
                    + SH_C3[1] * xy * z * c(10)
                    + SH_C3[2] * y * (4.0 * zz - xx - yy) * c(11)
                    + SH_C3[3] * z * (2.0 * zz - 3.0 * xx - 3.0 * yy) * c(12)
                    + SH_C3[4] * x * (4.0 * zz - xx - yy) * c(13)
                    + SH_C3[5] * z * (xx - yy) * c(14)
                    + SH_C3[6] * x * (xx - 3.0 * yy) * c(15)
                )
    return result


def sh_to_rgb_color(deg: int, sh: jnp.ndarray, means: jnp.ndarray,
                    campos: jnp.ndarray) -> jnp.ndarray:
    """Per-Gaussian view-dependent RGB, reference ``computeColorFromSH``.

    The max(., 0) clamp is differentiable in JAX exactly like the reference's
    clamp-mask bookkeeping: grad is zeroed where the output was clamped
    (reference backward.cu:29-34 replicated for free by autodiff).

    Args:
      deg: SH degree (static).
      sh: (N, K, 3) or flat (N, K*3) coefficient-major.
      means: (N, 3) world positions.
      campos: (3,) camera center.

    Returns:
      (N, 3) clamped RGB colors.
    """
    dirs = means - campos[None, :]
    # safe normalize: a Gaussian sitting exactly at the camera is culled by
    # the near plane anyway, but an unguarded 0-norm here turns the VJP into
    # NaN for that (alive) row and Adam then poisons it permanently
    # the guard must sit inside the sqrt: linalg.norm's VJP at the exact
    # zero vector is 0/0 even when the downstream cotangent is zero
    norm = jnp.sqrt(jnp.maximum(
        jnp.sum(dirs * dirs, axis=-1, keepdims=True), 1e-16))
    dirs = dirs / norm
    return jnp.maximum(eval_sh(deg, sh, dirs) + 0.5, 0.0)


def RGB2SH(rgb: jnp.ndarray) -> jnp.ndarray:
    """Reference utils/sh_utils.py:114-115."""
    return (rgb - 0.5) / SH_C0


def SH2RGB(sh: jnp.ndarray) -> jnp.ndarray:
    """Reference utils/sh_utils.py:117-118."""
    return sh * SH_C0 + 0.5
