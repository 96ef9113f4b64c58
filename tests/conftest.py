"""Test env: run everything on CPU with an 8-device virtual mesh.

The container's sitecustomize registers the axon TPU PJRT plugin in *every*
python process and monkeypatches jax's backend resolution so the axon backend
is used even under JAX_PLATFORMS=cpu — meaning "CPU" test arrays actually
route through the single-chip TPU relay, which intermittently deadlocks when
another process holds the claim (np.asarray of a jax array blocks on a
futex). Since sitecustomize has already run by the time conftest is imported,
the only reliable fix is to re-exec the test process with the plugin stripped
from the environment. We do it in pytest_configure with capture suspended so
the re-exec'd pytest's output reaches the real stdout. Guarded by a sentinel
to run exactly once.
"""
import os
import sys

_SENTINEL = "BLOOMSCENE_TEST_SANITIZED"


def pytest_configure(config):
    if os.environ.get(_SENTINEL) == "1":
        return
    env = dict(os.environ)
    env[_SENTINEL] = "1"
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env.pop("PALLAS_AXON_REMOTE_COMPILE", None)
    # persistent compilation cache: the suite is compile-dominated
    # (~30 min cold); repeat runs hit the cache. Keyed on HLO, so code
    # changes invalidate exactly the affected entries.
    env.setdefault("JAX_COMPILATION_CACHE_DIR",
                   os.path.join(os.path.dirname(os.path.dirname(
                       os.path.abspath(__file__))), ".jax_cache"))
    env.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")
    env.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
    env["PYTHONPATH"] = ":".join(
        p for p in env.get("PYTHONPATH", "").split(":")
        if p and ".axon_site" not in p)
    flags = env.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        env["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()
    capman = config.pluginmanager.getplugin("capturemanager")
    if capman is not None:
        capman.stop_global_capturing()
    sys.stdout.flush()
    sys.stderr.flush()
    os.execve(sys.executable,
              [sys.executable, "-m", "pytest", *config.invocation_params.args],
              env)


import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
