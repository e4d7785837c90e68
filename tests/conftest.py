"""Test config: hermetic CPU runs with a virtual 8-device mesh.

Must set env before the first jax import anywhere in the test process.
"""

import os
import sys

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

# The environment's sitecustomize force-registers the axon TPU backend and
# pins JAX_PLATFORMS=axon, so the env var alone cannot demote to CPU; the
# config knob (read at backend-init time) can.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
