"""Test config: run everything on a virtual 8-device CPU mesh.

The JAX idiom for testing pjit/shard_map without TPUs:
``--xla_force_host_platform_device_count=8`` + forcing the cpu platform.

Note: this image's sitecustomize force-registers the axon TPU platform and
overrides JAX_PLATFORMS, so the env var alone is not enough — we must also flip
``jax.config`` before the backend is first used.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture(scope="session")
def jax_cpu_devices():
    devs = jax.devices()
    assert devs[0].platform == "cpu"
    return devs
