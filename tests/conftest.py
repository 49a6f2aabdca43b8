"""Test configuration: force an 8-device virtual CPU mesh before jax imports.

Multi-chip sharding is validated on host-CPU virtual devices
(``xla_force_host_platform_device_count``); real-hardware throughput runs via
``bench.py`` on the TPU chip instead.
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def toy_batch():
    """Deterministic 4-image batch at 32x32 with toy-model labels."""
    rng = np.random.RandomState(0)
    x = rng.rand(4, 32, 32, 3).astype(np.float32)
    y = rng.randint(0, 10, size=(4,)).astype(np.int32)
    return x, y
