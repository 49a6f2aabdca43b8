"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip sharding is validated on host-CPU virtual devices
(``xla_force_host_platform_device_count``); real-hardware throughput runs via
``bench.py`` on the TPU chip instead.  Note: the environment's sitecustomize
pre-imports jax with ``JAX_PLATFORMS=axon`` (one tunneled TPU chip), so we
must override the already-imported config, not just env vars.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def toy_batch():
    """Deterministic 4-image batch at 32x32 with toy-model labels."""
    rng = np.random.RandomState(0)
    x = rng.rand(4, 32, 32, 3).astype(np.float32)
    y = rng.randint(0, 10, size=(4,)).astype(np.int32)
    return x, y
