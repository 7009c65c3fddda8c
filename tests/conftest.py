"""Test config: run everything on a virtual 8-device CPU mesh.

The JAX idiom for testing pjit/shard_map without TPUs:
``--xla_force_host_platform_device_count=8`` + forcing the cpu platform.
All the platform plumbing (including the sitecustomize workaround and
disabling the persistent compilation cache, which is unsafe for CPU AOT)
lives in image_caption_tpu.utils.platform.force_cpu.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from image_caption_tpu.utils.platform import force_cpu  # noqa: E402

force_cpu(num_devices=8)

import jax  # noqa: E402
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
