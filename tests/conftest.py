"""Test config: run everything on a virtual 8-device CPU mesh so sharding
logic is exercised without TPU hardware (SURVEY.md §4).

NOTE: this environment's sitecustomize registers an `axon` TPU PJRT plugin
and forces jax_platforms='axon,cpu' via jax.config, which overrides the
JAX_PLATFORMS env var — so we must override via jax.config too, before any
backend is initialized.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# The package enables a persistent compilation cache (great for the TPU
# remote-compile relay, ~1-2 min/program). Under pytest it's a liability:
# CPU compiles are fast, and concurrent test/bench processes sharing the
# cache dir have produced corrupted entries whose deserialization
# segfaults the whole suite mid-run — so tests always compile fresh.
jax.config.update("jax_enable_compilation_cache", False)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Free compiled executables after each test module: the suite compiles
    hundreds of XLA:CPU programs, and letting them pile up in one process
    has crashed the compiler (segfault inside backend_compile) late in the
    run. Costs some recompilation, buys a suite that finishes."""
    yield
    jax.clear_caches()
