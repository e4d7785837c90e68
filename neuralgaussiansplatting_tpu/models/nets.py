"""Screen-space neural decoders (Flax) for the neural-feature pipeline.

Behavioral parity target: reference utils/net_utils.py —
``FeatureToRGBMLP`` (:5-31), ``DoubleConv`` (:33-53), ``UNet`` (:55-92),
``SmallUNet`` (:94-124), ``CNN`` (:136-166, the 81-channel dynamic-kernel
predictor with its middle layers commented out upstream), ``PureCNN``
(:168-198) and the unfold-based dynamic-filter ``Denoiser`` (:201-228).

All modules take a single (H, W, C) image (the reference constraint) in NHWC;
convolutions run on the MXU. Weight init is Kaiming-normal (fan_in) with zero
bias, matching ``nn.init.kaiming_normal_`` defaults (fan_in, ReLU gain).
The Denoiser's ``F.unfold`` + per-pixel 9x9 weighted sum becomes an unrolled
shift-multiply-accumulate that XLA fuses into a single VPU pass (see
``denoise``).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

# torch kaiming_normal_ default: fan_in mode, gain sqrt(2) (leaky_relu a=0)
kaiming = nn.initializers.variance_scaling(2.0, "fan_in", "normal")

# All modules accept ``dtype`` (compute precision; params stay f32). bf16
# doubles conv throughput on the MXU; outputs are cast back to f32.
#
# Negative result (round 5, kept for the record): reformulating the convs
# as unrolled per-tap (H*W, Cin) @ (Cin, Cout) MXU matmuls (shift-MAC, the
# trick that wins for SSIM/denoise constant windows) LOSES 3x at these
# shapes — every tap's shifted window reshape materializes a full
# activation-sized copy (164-256 MB at 800^2), so the formulation is
# memory-bound at ~GBs per conv while XLA's native conv fuses window
# extraction and reads the input ~once. jax.checkpoint around the taps
# avoids the 16 GB residual OOM but not the traffic.


class FeatureToRGBMLP(nn.Module):
    hidden_features: int = 128
    out_features: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):  # (H, W, C)
        h, w, c = x.shape
        x = x.reshape(-1, c)
        d = self.dtype
        x = nn.relu(nn.Dense(self.hidden_features, kernel_init=kaiming,
                             dtype=d)(x))
        x = nn.relu(nn.Dense(self.hidden_features, kernel_init=kaiming,
                             dtype=d)(x))
        x = nn.Dense(self.out_features, kernel_init=kaiming, dtype=d)(x)
        return x.reshape(h, w, self.out_features).astype(jnp.float32)


class DoubleConv(nn.Module):
    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):  # (1, H, W, C)
        x = nn.relu(nn.Conv(self.features, (3, 3), padding=1,
                            kernel_init=kaiming, dtype=self.dtype)(x))
        x = nn.relu(nn.Conv(self.features, (3, 3), padding=1,
                            kernel_init=kaiming, dtype=self.dtype)(x))
        return x


class UNet(nn.Module):
    """3-level encoder/decoder with transpose-conv upsampling + skips."""

    out_channels: int = 3
    base_channels: int = 64
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):  # (H, W, C) -> (H, W, out)
        h, w, _ = x.shape
        x = x[None]
        d = self.dtype
        pool = lambda y: nn.max_pool(y, (2, 2), strides=(2, 2))
        e1 = DoubleConv(self.base_channels, d)(x)
        e2 = DoubleConv(self.base_channels * 2, d)(pool(e1))
        e3 = DoubleConv(self.base_channels * 4, d)(pool(e2))
        up2 = nn.ConvTranspose(self.base_channels * 2, (2, 2), strides=(2, 2),
                               kernel_init=kaiming, dtype=d)(e3)
        d2 = DoubleConv(self.base_channels * 2, d)(
            jnp.concatenate([up2, e2], axis=-1))
        up1 = nn.ConvTranspose(self.base_channels, (2, 2), strides=(2, 2),
                               kernel_init=kaiming, dtype=d)(d2)
        d1 = DoubleConv(self.base_channels, d)(
            jnp.concatenate([up1, e1], axis=-1))
        out = nn.Conv(self.out_channels, (1, 1), kernel_init=kaiming,
                      dtype=d)(d1)
        return out[0].astype(jnp.float32)


class SmallUNet(nn.Module):
    """2-level variant (reference :94-124; unused by the render paths but
    part of the public surface)."""

    out_channels: int = 3
    base_channels: int = 64

    @nn.compact
    def __call__(self, x):
        x = x[None]
        pool = lambda y: nn.max_pool(y, (2, 2), strides=(2, 2))
        e1 = DoubleConv(self.base_channels)(x)
        e2 = DoubleConv(self.base_channels * 2)(pool(e1))
        up1 = nn.ConvTranspose(self.base_channels, (2, 2), strides=(2, 2),
                               kernel_init=kaiming)(e2)
        d1 = DoubleConv(self.base_channels)(
            jnp.concatenate([up1, e1], axis=-1))
        out = nn.Conv(self.out_channels, (1, 1), kernel_init=kaiming)(d1)
        return out[0]


class CNN(nn.Module):
    """5x5 conv kernel-predictor: 64 -> 100 -> 81 channels (9x9 kernels)."""

    mid_channels: int = 100
    out_channels: int = 81
    kernel_size: int = 5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):  # (H, W, C) -> (H, W, 81)
        pad = self.kernel_size // 2
        x = x[None]
        x = nn.relu(nn.Conv(self.mid_channels,
                            (self.kernel_size, self.kernel_size),
                            padding=pad, kernel_init=kaiming,
                            dtype=self.dtype)(x))
        x = nn.Conv(self.out_channels,
                    (self.kernel_size, self.kernel_size),
                    padding=pad, kernel_init=kaiming, dtype=self.dtype)(x)
        return x[0].astype(jnp.float32)


class PureCNN(nn.Module):
    """Direct-to-RGB variant of CNN (reference :168-198)."""

    mid_channels: int = 100
    out_channels: int = 3
    kernel_size: int = 5

    @nn.compact
    def __call__(self, x):
        pad = self.kernel_size // 2
        x = x[None]
        x = nn.relu(nn.Conv(self.mid_channels,
                            (self.kernel_size, self.kernel_size),
                            padding=pad, kernel_init=kaiming)(x))
        x = nn.Conv(self.out_channels,
                    (self.kernel_size, self.kernel_size),
                    padding=pad, kernel_init=kaiming)(x)
        return x[0]


def denoise(unet_out: jnp.ndarray, cnn_out: jnp.ndarray,
            kernel_size: int = 9) -> jnp.ndarray:
    """Dynamic per-pixel filtering (reference Denoiser, :201-228).

    ``unet_out`` (H, W, 3) is reflect-padded, 9x9 patches are extracted and
    weighted by the per-pixel kernels in ``cnn_out`` (H, W, 81). Stateless,
    so a plain function rather than a Module (the reference Module holds no
    parameters either).
    """
    h, w, c = unet_out.shape
    assert c == 3
    k = kernel_size
    pad = k // 2
    img = jnp.pad(unet_out, ((pad, pad), (pad, pad), (0, 0)), mode="reflect")
    kernels = cnn_out.reshape(h, w, k * k)
    # Unrolled shift-multiply-accumulate over the k*k taps (tap i = ky*k+kx,
    # torch-unfold order). XLA fuses all taps into one pass; this avoids
    # materializing the (3*k*k, H, W) patch tensor (622 MB at 800p) that a
    # conv_general_dilated_patches formulation writes out, and keeps the
    # contraction in f32 on the VPU (einsum would route it through the MXU
    # at bf16 default precision). ~13x faster fwd+bwd on v5e.
    out = jnp.zeros_like(unet_out)
    for i in range(k * k):
        dy, dx = i // k, i % k
        out = out + img[dy:dy + h, dx:dx + w, :] * kernels[:, :, i:i + 1]
    return out
