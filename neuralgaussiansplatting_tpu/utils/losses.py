"""Training losses and image metrics.

Behavioral parity target: reference utils/loss_utils.py (l1 :17, l2 :20,
windowed SSIM :23-63 — 11x11 Gaussian window sigma 1.5, C1=0.01^2, C2=0.03^2)
and utils/image_utils.py:18-24 (mse, psnr). SSIM is a depthwise convolution,
which XLA lowers to MXU-friendly fused convs on TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def l1_loss(pred: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    return jnp.abs(pred - gt).mean()


def l2_loss(pred: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    return ((pred - gt) ** 2).mean()


def mse(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return ((a - b) ** 2).mean()


def psnr(pred: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    return 20.0 * jnp.log10(1.0 / jnp.sqrt(mse(pred, gt)))


@functools.lru_cache(maxsize=None)
def _gaussian_window_1d(window_size: int, sigma: float) -> np.ndarray:
    xs = np.arange(window_size, dtype=np.float64)
    g = np.exp(-((xs - window_size // 2) ** 2) / (2.0 * sigma ** 2))
    return (g / g.sum()).astype(np.float32)


def _depthwise_conv(img: jnp.ndarray, window1d: jnp.ndarray) -> jnp.ndarray:
    """(C, H, W) Gaussian blur as two separable 1D passes.

    The 2D Gaussian window is rank-1, so row+column 1D convs are exact and
    ~W/2 x cheaper than the reference's dense 11x11 depthwise conv (which XLA
    maps poorly onto the TPU anyway — grouped convs skip the MXU). Channels
    ride the batch dimension.
    """
    ws = window1d.shape[0]
    c = img.shape[0]
    x = img[:, None]  # (C, 1, H, W): depthwise via batch
    kh = window1d.reshape(1, 1, ws, 1)
    kw = window1d.reshape(1, 1, 1, ws)
    x = jax.lax.conv_general_dilated(
        x, kh, (1, 1), [(ws // 2, ws // 2), (0, 0)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    x = jax.lax.conv_general_dilated(
        x, kw, (1, 1), [(0, 0), (ws // 2, ws // 2)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"))
    return x[:, 0]


def ssim(img1: jnp.ndarray, img2: jnp.ndarray, window_size: int = 11,
         sigma: float = 1.5) -> jnp.ndarray:
    """Mean SSIM over a (C, H, W) pair; reference loss_utils.py:23-63."""
    window = jnp.asarray(_gaussian_window_1d(window_size, sigma))
    mu1 = _depthwise_conv(img1, window)
    mu2 = _depthwise_conv(img2, window)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = _depthwise_conv(img1 * img1, window) - mu1_sq
    sigma2_sq = _depthwise_conv(img2 * img2, window) - mu2_sq
    sigma12 = _depthwise_conv(img1 * img2, window) - mu1_mu2
    c1, c2 = 0.01 ** 2, 0.03 ** 2
    ssim_map = ((2 * mu1_mu2 + c1) * (2 * sigma12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (sigma1_sq + sigma2_sq + c2))
    return ssim_map.mean()


def photometric_loss(pred: jnp.ndarray, gt: jnp.ndarray,
                     lambda_dssim: float = 0.2) -> jnp.ndarray:
    """0.8*L1 + 0.2*(1-SSIM); reference train.py:91-92."""
    return ((1.0 - lambda_dssim) * l1_loss(pred, gt)
            + lambda_dssim * (1.0 - ssim(pred, gt)))
