"""Worker for the two-process jax.distributed smoke test.

Launched (twice) by tests/test_multiprocess.py with MP_PROC_ID/MP_COORD
set. Exercises the REAL multi-host code path the reference needed a
SLURM cluster for (SURVEY §4: 'multi-node testing without a cluster:
not addressed'): jax.distributed over two local processes, a global
mesh spanning both, and the unchanged sharded_cg_solve on it.
"""
import os
import sys

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

pid = int(os.environ["MP_PROC_ID"])

from cgx.parallel.multihost import global_mesh, initialize_from_env, is_multihost

initialize_from_env(
    coordinator_address=os.environ["MP_COORD"],
    num_processes=2,
    process_id=pid,
)

import numpy as np

import cgx
from cgx.parallel.sharded_cg import sharded_cg_solve

assert is_multihost(), "expected 2 processes"
assert jax.process_count() == 2
assert jax.device_count() == 8, jax.device_count()

mesh = global_mesh()
n = 256
dia = cgx.lap2d_reference(n)
b = cgx.source_term(n)
res = sharded_cg_solve(dia, b, mesh=mesh, tol=1e-8)
assert bool(res.converged), "solve did not converge"

# the solution spans non-addressable devices: all-gather it to every
# host before the true-residual check
from jax.experimental import multihost_utils

x = np.asarray(multihost_utils.process_allgather(res.x, tiled=True))
rel = np.linalg.norm(dia.to_dense() @ x - b) / np.linalg.norm(b)
assert rel < 1e-8, rel
print(f"proc {pid}: iters={int(res.iterations)} rel={rel:.3e} SMOKE-OK",
      flush=True)
sys.exit(0)
