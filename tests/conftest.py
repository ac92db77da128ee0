"""Test env: force CPU with 8 virtual devices so multi-chip sharding paths
(`shard_map` over a Mesh) are exercised without TPU hardware.

Note: the environment's sitecustomize pre-imports jax and registers a remote
TPU PJRT plugin (JAX_PLATFORMS=axon), and remote compiles cost ~30-60 s each,
so env vars alone are not enough — `jax.config.update` overrides the platform
after the fact.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
