"""Test configuration.

Tests run on the CPU backend with 8 virtual devices so collective /
sharded code paths are exercised without a multi-chip TPU (SURVEY.md
§5.3) and without dragging every tiny test case through the TPU tunnel.

This environment pre-imports jax at interpreter startup (PYTHONPATH
sitecustomize) with JAX_PLATFORMS=axon already set, so mutating
os.environ here is too late for jax's config snapshot; instead we use
jax.config.update, which works any time before backend initialization.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # for any subprocesses we spawn
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

# persistent compile cache: the sharded-pipeline tests compile dozens of
# programs; caching them across runs cuts suite wall-clock several-fold
from shannon_tpu.utils.jaxcache import enable_compilation_cache  # noqa: E402

enable_compilation_cache(
    os.path.join(os.path.dirname(__file__), "..", ".pytest_jax_cache")
)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session", autouse=True)
def _assert_cpu_backend():
    devs = jax.devices()
    assert devs[0].platform == "cpu", f"tests must run on CPU, got {devs}"
    assert len(devs) == 8, f"expected 8 virtual CPU devices, got {len(devs)}"
    yield


@pytest.fixture
def rng():
    return np.random.default_rng(12345)
