"""Multi-host distribution: 2 processes x 4 virtual CPU devices.

The standard JAX multi-host recipe (``jax.distributed.initialize`` with a
shared coordinator; SURVEY.md §2.3, BASELINE.md): each spawned worker
contributes local devices to ONE global 8-device mesh and runs the same
SPMD row-tiled matching program; collectives cross the process boundary
(DCN-analog). Process 0 checks the gathered output against the
single-device kernel. On a real multi-host TPU pod the identical worker
runs unchanged with the TPU backend.
"""

import os
import socket
import subprocess
import sys

import pytest

WORKER = os.path.join(os.path.dirname(__file__), "..", "benchmarks",
                      "multihost_worker.py")


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.parametrize("consistent", ["0", "1"])
def test_two_process_row_tiling(consistent):
    port = _free_port()
    env = dict(os.environ)
    # APPEND to PYTHONPATH: clobbering it drops the axon sitecustomize and
    # breaks jax init (CLAUDE.md); the workers force CPU themselves.
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    env.pop("XLA_FLAGS", None)  # workers set their own device count

    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(pid), "2", str(port), "4",
             consistent],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True)
        for pid in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=600)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out}"
    assert "MULTIHOST-OK" in outs[0], outs[0]
    assert "processes=2" in outs[0]
