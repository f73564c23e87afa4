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

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
