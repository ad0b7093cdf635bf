"""Test configuration.

Tests run on the CPU backend with 8 virtual devices so collective /
sharded code paths are exercised without a multi-chip TPU (SURVEY.md
§5.3).  This must be set before jax initializes, hence module import
order here.
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


@pytest.fixture
def rng():
    return np.random.default_rng(12345)
