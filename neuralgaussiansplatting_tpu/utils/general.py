"""General utilities (reference utils/general_utils.py equivalents).

``safe_state`` (:112-133): stdout line-timestamping + deterministic seeding.
The reference also pins ``cuda:0`` here; device selection in this framework
belongs to jax platform config instead.
"""

from __future__ import annotations

import random
import sys
from datetime import datetime

import numpy as np


class _TimestampedStdout:
    def __init__(self, inner, silent: bool):
        self.inner = inner
        self.silent = silent

    def write(self, x):
        if self.silent:
            return
        if x.endswith("\n"):
            ts = datetime.now().strftime("%d/%m %H:%M:%S")
            x = x.replace("\n", f" [{ts}]\n")
        self.inner.write(x)

    def flush(self):
        self.inner.flush()

    def __getattr__(self, name):
        return getattr(self.inner, name)


def safe_state(silent: bool = False, seed: int = 0):
    """Timestamp stdout lines, seed python/numpy (reference: also torch/cuda;
    JAX randomness is explicit-key based so nothing global to seed there)."""
    sys.stdout = _TimestampedStdout(sys.stdout, silent)
    random.seed(seed)
    np.random.seed(seed)


def inverse_sigmoid(x):
    from neuralgaussiansplatting_tpu.ops.transforms import inverse_sigmoid as f
    return f(x)


def pil_to_array(image, resolution):
    from neuralgaussiansplatting_tpu.scene.loader import pil_to_array as f
    return f(image, resolution)


def get_expon_lr_func(lr_init, lr_final, lr_delay_steps=0, lr_delay_mult=1.0,
                      max_steps=1_000_000):
    from neuralgaussiansplatting_tpu.train.optim import expon_lr_schedule
    return expon_lr_schedule(lr_init, lr_final, lr_delay_steps,
                             lr_delay_mult, max_steps)


def build_rotation(q):
    from neuralgaussiansplatting_tpu.ops.transforms import quat_to_rotmat
    return quat_to_rotmat(q)


def build_scaling_rotation(s, q):
    from neuralgaussiansplatting_tpu.ops.transforms import build_scaling_rotation as f
    return f(s, q)
