"""Multi-host orchestration (jax.distributed + cross-host meshes).

The reference has no distributed execution (SURVEY §2.3); this is the new
capability for pod-slice training: DP camera batches span hosts over DCN
while each host's chips carry tile/strip (SP) sharding over ICI. Gradients
all-reduce over the ``data`` axis — XLA routes the intra-host portion over
ICI and the cross-host portion over DCN from the mesh topology.

Usage (one process per host):
    from neuralgaussiansplatting_tpu.parallel import distributed
    distributed.initialize()          # reads env or explicit args
    mesh = distributed.make_global_mesh(n_tile=2)
    ...
Every process must execute the same jitted computation; use
``process_local_batch_slice`` to feed each host its shard of the camera
batch and ``host_broadcast_pytree`` to agree on host-side decisions (e.g.
capacity-growth triggers) without divergence.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None):
    """jax.distributed.initialize passthrough; no-op if already initialized
    or single-process."""
    if jax.process_count() > 1:
        return  # already initialized
    if coordinator_address is not None or num_processes is not None:
        # explicit multi-process request: fail loudly (a swallowed error
        # here silently degrades to single-process training). Must be
        # called before anything initializes the jax backend.
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id)
        return
    try:
        jax.distributed.initialize()
    except (ValueError, RuntimeError):
        # single-process (no coordinator env): local devices only
        pass


def make_global_mesh(n_tile: int = 1) -> Mesh:
    """(data, tile) mesh over all global devices; the data axis spans hosts
    (DCN) first so each host's ICI carries the tile axis."""
    devices = np.asarray(jax.devices())
    n = len(devices)
    assert n % n_tile == 0
    return Mesh(devices.reshape(n // n_tile, n_tile), ("data", "tile"))


def process_local_batch_slice(global_batch: int):
    """(start, size) of this process's slice of a global camera batch."""
    per = global_batch // jax.process_count()
    return jax.process_index() * per, per


def host_broadcast_pytree(tree, root: int = 0):
    """Agree on host-side values across processes (e.g. whether to grow
    capacity this round) — all hosts must re-jit identically."""
    if jax.process_count() == 1:
        return tree
    from jax.experimental import multihost_utils
    return multihost_utils.broadcast_one_to_all(tree, is_source=(
        jax.process_index() == root))


def assert_synchronized(value: int):
    """Debug guard: all hosts observe the same value (shape decisions)."""
    if jax.process_count() == 1:
        return
    from jax.experimental import multihost_utils
    multihost_utils.assert_equal(value, f"host-divergent value: {value}")
