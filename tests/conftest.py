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
elif os.environ.get("ORB_TPU_TEST_CACHE_DIR"):
    # per-module subprocess run (see pytest_cmdline_main below): the PARENT
    # owns one shared cache dir for the whole suite run, so the big pipeline
    # programs compile once and every later module's subprocess disk-hits
    jax.config.update(
        "jax_compilation_cache_dir", os.environ["ORB_TPU_TEST_CACHE_DIR"]
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
else:
    _cache_dir = tempfile.mkdtemp(prefix="jax_cache_pytest_")
    atexit.register(shutil.rmtree, _cache_dir, ignore_errors=True)
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_cmdline_main(config):
    """Full-suite isolation: running all ~17 modules in ONE process crashes
    XLA:CPU late in the run — a hard SIGABRT inside backend_compile after
    ~100 tests' worth of accumulated compilation (reproduced at round-4 and
    round-5 HEAD on test_stream's 6th test; per-module jax.clear_caches()
    does not prevent it). When the invocation targets the whole tests/
    directory with no -k/-m selection, re-run each test module in its OWN
    subprocess, sharing one persistent compile-cache dir so big programs
    compile once. A module whose subprocess dies on a signal is retried
    once with the disk cache disabled (ORB_TPU_TEST_NO_PCACHE) before being
    reported as failed. Single-module / -m smoke / -k runs are unaffected.
    """
    if os.environ.get("ORB_TPU_SUBPROC"):
        return None
    inv = [str(a) for a in config.invocation_params.args]
    if config.getoption("-m", default="") or config.getoption(
        "-k", default=""
    ):
        return None
    here = os.path.dirname(os.path.abspath(__file__))
    pos = [a for a in inv if not a.startswith("-")]
    if len(pos) != 1 or os.path.abspath(pos[0]).rstrip("/") != here:
        return None

    import glob
    import subprocess
    import sys

    modules = sorted(glob.glob(os.path.join(here, "test_*.py")))
    opts = [a for a in inv if a.startswith("-")]
    cache_dir = tempfile.mkdtemp(prefix="jax_cache_pytest_suite_")
    atexit.register(shutil.rmtree, cache_dir, ignore_errors=True)
    stop_on_fail = "-x" in opts or "--exitfirst" in opts
    results = {}
    for mod in modules:
        name = os.path.basename(mod)
        env = dict(os.environ)
        env["ORB_TPU_SUBPROC"] = "1"
        env["ORB_TPU_TEST_CACHE_DIR"] = cache_dir
        cmd = [sys.executable, "-m", "pytest", mod] + opts
        rc = subprocess.call(cmd, env=env)
        if rc < 0 or rc == 134:      # died on a signal: retry, no disk cache
            print(f"[suite-runner] {name} crashed (rc={rc}); retrying "
                  "with the persistent compile cache disabled", flush=True)
            env.pop("ORB_TPU_TEST_CACHE_DIR", None)
            env["ORB_TPU_TEST_NO_PCACHE"] = "1"
            rc = subprocess.call(cmd, env=env)
        results[name] = rc
        if stop_on_fail and rc not in (0, 5):
            break
    bad = {n: rc for n, rc in results.items() if rc not in (0, 5)}
    print("[suite-runner] per-module subprocess isolation: "
          f"{len(results)} modules, {len(bad)} failed"
          + (f" -> {bad}" if bad else ""), flush=True)
    return 1 if bad else 0


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
