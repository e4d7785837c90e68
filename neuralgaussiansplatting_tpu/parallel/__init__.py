"""Device-mesh construction and sharded train/render steps.

The reference has no distributed execution at all (SURVEY §2.3: single
process, ``cuda:0`` pinned). This package is the new capability demanded by
the TPU port: data-parallel camera batches with replicated Gaussians and
ICI-all-reduced gradients, plus tile/pixel sharding for large frames.
"""

from neuralgaussiansplatting_tpu.parallel.mesh import make_mesh  # noqa: F401
