"""Test configuration: run JAX on a virtual 8-device CPU mesh.

The container's sitecustomize pre-imports jax and registers the axon TPU
plugin, so env vars alone don't switch platforms; ``jax.config.update`` after
import does. XLA_FLAGS must still be set before the CPU backend is first
initialized to get 8 virtual devices.
"""

import os
from pathlib import Path

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# persistent compile cache: the suite rebuilds the same tiny models each run.
# Repo-local dir (shared with __graft_entry__.py and BENCH_SMOKE): suite runs
# pre-warm the driver's dry-run compiles, and /tmp does not reliably survive
# across sessions.
jax.config.update(
    "jax_compilation_cache_dir",
    str(Path(__file__).resolve().parents[1] / ".jax_cache_cpu"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
