"""Two-process jax.distributed smoke test (ROADMAP infra item 11).

The reference could only test multi-node behaviour on EPFL's SLURM
cluster; here two local processes rendezvous over loopback, form an
8-device global mesh (4 virtual CPU devices each), and run the
unchanged sharded solver across the process boundary (collectives over
Gloo)."""

import os
import socket
import subprocess
import sys

import pytest


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_distributed_smoke():
    port = _free_port()
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = os.path.join(root, "tests", "multiprocess", "worker.py")
    procs = []
    for pid in (0, 1):
        env = dict(os.environ)
        env.update(
            XLA_FLAGS="--xla_force_host_platform_device_count=4",
            JAX_PLATFORMS="cpu",
            MP_PROC_ID=str(pid),
            MP_COORD=f"127.0.0.1:{port}",
            PYTHONPATH=root + os.pathsep + env.get("PYTHONPATH", ""),
        )
        procs.append(
            subprocess.Popen(
                [sys.executable, worker],
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
                text=True,
            )
        )
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=300)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out}"
        assert "SMOKE-OK" in out, f"proc {pid} missing marker:\n{out}"
