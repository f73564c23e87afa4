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

import atexit
import shutil
import tempfile

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Persistent compilation cache, but in a PRIVATE per-run directory. The
# machine-wide shared dir was a double liability under pytest: concurrent
# test/bench processes corrupted entries (deserialization segfaults), and
# entries AOT-compiled on other machine types spam cpu_aot_loader errors.
# A fresh per-run dir keeps both away while letting the big pipeline
# programs (track_full & co, ~30-60 s of XLA:CPU each) survive the
# per-module jax.clear_caches() below — recompiles across test modules
# with the same config become disk hits, which is most of the suite's
# former wall-clock.
#
# ORB_TPU_TEST_NO_PCACHE=1 disables the disk cache entirely: XLA:CPU's
# executable DEserialization hard-aborts (CHECK failure, not a catchable
# error) on some of the big stream programs when an entry written earlier
# in the same run is read back — the round-4 "segfault at test 100/103".
if os.environ.get("ORB_TPU_TEST_NO_PCACHE"):
    jax.config.update("jax_enable_compilation_cache", False)
else:
    _cache_dir = tempfile.mkdtemp(prefix="jax_cache_pytest_")
    atexit.register(shutil.rmtree, _cache_dir, ignore_errors=True)
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

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
