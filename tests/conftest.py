"""Test harness: run all tests on a virtual 8-device CPU mesh.

Multi-chip sharding logic is validated without TPU hardware by forcing the
host platform to expose 8 XLA CPU devices (the reference had no analog —
its DDP paths could only be validated on real multi-GPU boxes).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The axon TPU plugin ignores the JAX_PLATFORMS env var at import time;
# force the CPU backend explicitly so tests never run over the TPU tunnel.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu"
