"""Test configuration: run JAX on a virtual 8-device CPU mesh.

The container's sitecustomize pre-imports jax and registers the axon TPU
plugin, so env vars alone don't switch platforms; ``jax.config.update`` after
import does. XLA_FLAGS must still be set before the CPU backend is first
initialized to get 8 virtual devices.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
