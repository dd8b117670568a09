"""Test configuration: force an 8-device virtual CPU mesh.

This is the TPU project's answer to "test multi-chip without a pod": all
tests run on CPU with XLA's forced host device count, so sharding tests
exercise real collectives (see SURVEY.md §4 test-strategy notes).
"""

import os

# Force local CPU: the ambient environment pins JAX_PLATFORMS to the
# remote TPU tunnel, which must never serve unit tests.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The axon sitecustomize hard-registers the remote-TPU backend and
# overrides JAX_PLATFORMS; the jax.config knob still wins.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)
# XLA:CPU dots default to low-precision accumulation; tests compare against
# float32 oracles, so force full precision (TPU runs set per-op precision).
jax.config.update("jax_default_matmul_precision", "highest")
