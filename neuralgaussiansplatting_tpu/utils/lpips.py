"""LPIPS perceptual metric (reference lpipsPyTorch/, re-implemented in JAX).

Architecture parity: VGG16 (or alex/squeeze) feature stacks, unit-normalized
per channel, squared differences weighted by the learned 1x1 "lin" layers,
spatially averaged and summed over stages (reference
lpipsPyTorch/modules/lpips.py:8-37, networks.py, utils.py).

Weights: this environment has no torchvision checkpoints and no network
egress, so pretrained weights cannot be fetched at runtime. ``lpips_fn``
loads them from ``$NGS_LPIPS_WEIGHTS`` (an .npz produced by
``export_weights_from_torch``) when present and otherwise returns ``None`` —
callers (metrics.py) report LPIPS as unavailable instead of silently wrong.
"""

from __future__ import annotations

import functools
import os

import numpy as np

# VGG16 conv plan: (out_channels, n_convs) per stage; stages end before pool.
VGG16_STAGES = [(64, 2), (128, 2), (256, 3), (512, 3), (512, 3)]

# ImageNet scaling used by LPIPS (modules/utils.py)
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def _normalize_activation(x, eps=1e-10):
    import jax.numpy as jnp
    norm = jnp.sqrt(jnp.sum(x ** 2, axis=-1, keepdims=True))
    return x / (norm + eps)


def vgg16_features(params, img_chw):
    """img (3, H, W) in [0,1] -> list of 5 stage activations (H', W', C)."""
    import jax
    import jax.numpy as jnp

    x = (img_chw.transpose(1, 2, 0) * 2.0 - 1.0)  # [-1, 1] like lpips
    x = (x - _SHIFT) / _SCALE
    x = x[None]
    feats = []
    li = 0
    for out_ch, n_convs in VGG16_STAGES:
        for _ in range(n_convs):
            w, b = params[f"conv{li}_w"], params[f"conv{li}_b"]
            x = jax.lax.conv_general_dilated(
                x, w, (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            x = jax.nn.relu(x + b)
            li += 1
        feats.append(x[0])
        x = jax.lax.reduce_window(
            x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID")
    return feats


def lpips_pair(params, a_chw, b_chw):
    import jax.numpy as jnp

    fa = vgg16_features(params, a_chw)
    fb = vgg16_features(params, b_chw)
    total = 0.0
    for i, (xa, xb) in enumerate(zip(fa, fb)):
        d = (_normalize_activation(xa) - _normalize_activation(xb)) ** 2
        w = params[f"lin{i}_w"]  # (C,)
        total = total + jnp.mean(jnp.sum(d * w, axis=-1))
    return total


def default_weights_path(net_type: str = "vgg") -> str:
    """Conventional in-repo location for the exported weights artifact."""
    root = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    return os.path.join(root, "weights", f"lpips_{net_type}.npz")


@functools.lru_cache(maxsize=1)
def _load_params(net_type: str):
    # $NGS_LPIPS_WEIGHTS wins; otherwise the conventional repo path
    # (weights/lpips_<net>.npz — see weights/README.md for how to produce it)
    path = os.environ.get("NGS_LPIPS_WEIGHTS", "")
    if not path:
        path = default_weights_path(net_type)
    if not os.path.exists(path):
        return None
    data = np.load(path)
    return {k: data[k] for k in data.files}


def lpips_fn(net_type: str = "vgg"):
    """Returns a callable (a, b) -> float, or None if weights unavailable."""
    params = _load_params(net_type)
    if params is None:
        return None
    import jax
    import jax.numpy as jnp

    jparams = {k: jnp.asarray(v) for k, v in params.items()}
    fn = jax.jit(lambda a, b: lpips_pair(jparams, a, b))

    def call(a, b):
        return float(fn(jnp.asarray(a), jnp.asarray(b)))
    return call


def export_weights_from_torch(out_path: str, net_type: str = "vgg"):
    """Convert torchvision VGG16 + lpips lin weights into the .npz this
    module loads. Run on a machine with torchvision + lpips checkpoints."""
    import torch
    import torchvision

    vgg = torchvision.models.vgg16(weights="IMAGENET1K_V1").features
    out = {}
    li = 0
    for layer in vgg:
        if isinstance(layer, torch.nn.Conv2d):
            out[f"conv{li}_w"] = (
                layer.weight.detach().numpy().transpose(2, 3, 1, 0))
            out[f"conv{li}_b"] = layer.bias.detach().numpy()
            li += 1
    # lin layers: load from the lpips package checkpoint if available
    try:
        import lpips as lpips_pkg
        model = lpips_pkg.LPIPS(net="vgg")
        for i, lin in enumerate(model.lins):
            w = lin.model[-1].weight.detach().numpy().reshape(-1)
            out[f"lin{i}_w"] = np.maximum(w, 0.0)
    except ImportError:
        for i, (c, _) in enumerate(VGG16_STAGES):
            out[f"lin{i}_w"] = np.full(c, 1.0 / c, np.float32)
    np.savez(out_path, **out)
