"""NeuralGaussianSplatting-TPU: a TPU-native 3D Gaussian Splatting framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
Augustine-2049/NeuralGaussianSplatting (an Inria-3DGS fork with an additional
neural-feature pipeline). The compute path is JAX + Pallas TPU kernels; scaling
is expressed with `jax.sharding` meshes instead of per-process CUDA state.

Subpackages
-----------
- ``ops``       core differentiable ops: SH, covariance, projection, tile
                binning, the tile rasterizer (XLA + Pallas paths), the
                per-pixel z-buffer ("idxmap") op of the neural pipeline.
- ``models``    the Gaussian point-cloud model (a pytree of capacity-padded
                parameter arrays) and the screen-space neural decoders.
- ``scene``     dataset loading (COLMAP / Blender), cameras, PLY I/O.
- ``train``     optimizers, densification, training loops.
- ``parallel``  device-mesh construction and sharded train/render steps.
- ``utils``     losses, metrics, image helpers.
"""

__version__ = "0.1.0"

import os as _os

if _os.environ.get("NGS_PLATFORM"):
    # Escape hatch for CI/tests: this environment's sitecustomize pins the
    # axon TPU backend in every process; the config knob (unlike the
    # JAX_PLATFORMS env var, which sitecustomize overrides) still demotes.
    import jax as _jax

    _jax.config.update("jax_platforms", _os.environ["NGS_PLATFORM"])

if not _os.environ.get("NGS_NO_COMPILE_CACHE"):
    # Persistent XLA compilation cache: recompiles of the rasterizer /
    # train-step shape buckets are the dominant startup cost (remote-compile
    # environments especially); cache hits cut them to ~100 ms.
    import jax as _jax

    _cache_dir = _os.environ.get(
        "NGS_COMPILE_CACHE",
        _os.path.join(_os.path.expanduser("~"), ".cache", "ngs-jax-cache"))
    try:
        _os.makedirs(_cache_dir, exist_ok=True)
        _jax.config.update("jax_compilation_cache_dir", _cache_dir)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # cache is an optimization only
