"""Test config: run JAX on CPU with 8 virtual devices so sharding tests
need no TPU (SURVEY §4 implication: CPU-only correctness CI).

Note the container's sitecustomize pins ``JAX_PLATFORMS=axon`` (the TPU
tunnel) before conftest runs, so the env var alone is not enough — we must
also update jax.config before any computation.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import matplotlib

matplotlib.use("Agg")
