"""Multi-host validation: 2 REAL processes x 4 virtual CPU devices.

The SURVEY.md section 4 recipe: jax.distributed over CPU with
--xla_force_host_platform_device_count, proving the sharded train steps
compile, execute, and AGREE with single-process results across a process
boundary (the reference has no distributed path at all; BASELINE.md's
north star is >=80% tile-throughput scaling to 2 hosts — this is the
correctness half of that story, runnable in CI without TPU pods).
"""
import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _worker_env(repo_root: str) -> dict:
    env = dict(os.environ)
    flags = [f for f in env.get("XLA_FLAGS", "").split()
             if "host_platform_device_count" not in f]
    env["XLA_FLAGS"] = " ".join(
        flags + ["--xla_force_host_platform_device_count=4"])
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = repo_root + (
        ":" + env["PYTHONPATH"] if env.get("PYTHONPATH") else "")
    return env


@pytest.mark.slow
def test_two_process_dp_and_tile_parallel_match_single_process():
    here = os.path.dirname(os.path.abspath(__file__))
    repo_root = os.path.dirname(here)
    worker = os.path.join(here, "multihost_worker.py")
    port = _free_port()
    coord = f"localhost:{port}"
    env = _worker_env(repo_root)
    procs = [subprocess.Popen(
        [sys.executable, worker, coord, str(i), "2"],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        env=env, cwd=repo_root)
        for i in range(2)]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, f"worker failed:\n{err[-4000:]}"
        outs.append(json.loads(out.strip().splitlines()[-1]))

    # both processes see the same (fully replicated) losses
    assert outs[0]["dp_loss"] == pytest.approx(outs[1]["dp_loss"], abs=1e-7)
    assert outs[0]["tp_loss"] == pytest.approx(outs[1]["tp_loss"], abs=1e-7)

    # single-process reference on this process's 8 local devices
    sys.path.insert(0, here)
    from multihost_worker import run
    dp_ref, tp_ref = run()
    assert np.isfinite(dp_ref) and np.isfinite(tp_ref)
    # 2-host mesh (2x4) vs single-process mesh (2x4 over 8 local devices):
    # same math, different partitioning -> tiny f32 reduction skew allowed
    assert outs[0]["dp_loss"] == pytest.approx(dp_ref, rel=1e-5)
    assert outs[0]["tp_loss"] == pytest.approx(tp_ref, rel=1e-5)
