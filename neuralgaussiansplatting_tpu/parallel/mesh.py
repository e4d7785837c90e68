"""Mesh helpers.

Axes:
- ``data``: cameras within a step's batch (DP). Gaussian parameters are
  replicated across it; their gradients are all-reduced over ICI (inserted by
  XLA from the sharding annotations — see scaling-book recipe).
- ``tile``: optional second axis to shard a single large frame's tiles across
  chips (the sequence-parallel analog for this workload, SURVEY §2.3).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: int | None = None, n_tile: int = 1,
              devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    if n_data is None:
        n_data = len(devices) // n_tile
    devs = np.asarray(devices[: n_data * n_tile]).reshape(n_data, n_tile)
    return Mesh(devs, ("data", "tile"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharded(mesh: Mesh) -> NamedSharding:
    """Shard the leading (camera-batch) axis across ``data``."""
    return NamedSharding(mesh, P("data"))
