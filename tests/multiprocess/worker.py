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

a = dia.to_dense()


def check(tag, xg, rhs, thresh=1e-8):
    xh = np.asarray(multihost_utils.process_allgather(xg, tiled=True))
    rel = np.linalg.norm(a @ xh - rhs) / np.linalg.norm(rhs)
    assert rel < thresh, (tag, rel)
    print(f"proc {pid}: {tag} rel={rel:.3e} ok", flush=True)


check("cg", res.x, b)

# the other sharded entry points must also survive the process split
from cgx.parallel.mg_sharded import sharded_mg_cg_solve
from cgx.parallel.sharded_cg import (
    sharded_block_cg_solve,
    sharded_refine_fixed_sweeps,
)

fd = cgx.lap2d_fd(16)  # 256 = 16x16 grid for the V-cycle geometry
bfd = cgx.source_term(256)
afd = fd.to_dense()
mg = sharded_mg_cg_solve(fd, bfd, mesh=mesh, tol=1e-8)
xh = np.asarray(multihost_utils.process_allgather(mg.x, tiled=True))
relmg = np.linalg.norm(afd @ xh - bfd) / np.linalg.norm(bfd)
assert relmg < 1e-8, relmg
print(f"proc {pid}: mg rel={relmg:.3e} ok", flush=True)

rf = sharded_refine_fixed_sweeps(dia, b, mesh=mesh, sweeps=5)
check("refine", rf.x, b)
assert bool(rf.converged)

B = np.stack([b, 0.5 * b + 1.0], axis=1)
blk = sharded_block_cg_solve(dia, B, mesh=mesh, tol=1e-8)
xb = np.asarray(multihost_utils.process_allgather(blk.x, tiled=True))
for j in range(2):
    relb = np.linalg.norm(a @ xb[:, j] - B[:, j]) / np.linalg.norm(B[:, j])
    assert relb < 1e-8, relb
print(f"proc {pid}: block ok", flush=True)

# deflated: Lanczos runs identically host-side on BOTH processes (same
# seed -> same basis), then W rides the global mesh row-sharded
from cgx.parallel.sharded_cg import sharded_deflated_cg_solve

dfl = sharded_deflated_cg_solve(dia, b, k=8, mesh=mesh, tol=1e-8)
check("deflated", dfl.x, b)
assert bool(dfl.converged)

# communication-hiding gvpipe: the fused psum + guarded replacement
# must survive the process split (replacement cond predicate is
# mesh-replicated)
gv = sharded_cg_solve(dia, b, mesh=mesh, method="gvpipe", tol=1e-8)
check("gvpipe", gv.x, b)
assert bool(gv.converged)

# recycling harvest across processes: the window gathers row-sharded,
# the Ritz extraction runs identically host-side on both processes
from cgx.parallel.sharded_cg import sharded_cg_solve_harvest

hres, wbasis = sharded_cg_solve_harvest(dia, b, k=8, mesh=mesh, tol=1e-8)
assert wbasis is not None and wbasis.shape[0] == n
d2 = sharded_deflated_cg_solve(dia, b, w=wbasis, mesh=mesh, tol=1e-8)
check("harvest+deflated", d2.x, b)

# sharded triple-word refinement: the multi-chip fp64-QUALITY path
# (reference gates quality on its distributed solver, cg.cc:144-154)
from cgx.parallel.tw_sharded import sharded_tw_solve

tw = sharded_tw_solve(
    dia, np.asarray(b, np.float64), mesh=mesh, rtol=1e-12,
    precond=None,
)
assert bool(tw.converged)
check("tw", tw.x, b, thresh=1e-12)

# MG-preconditioned block CG with the fp32 cycle + GS smoothing
from cgx.parallel.mg_sharded import sharded_mg_block_cg_solve

Bm = np.stack([bfd, 0.5 * bfd + 1.0], axis=1)
mgb = sharded_mg_block_cg_solve(
    fd, Bm, mesh=mesh, tol=1e-8, smoother="gs", cycle_precision="fp32"
)
xm = np.asarray(multihost_utils.process_allgather(mgb.x, tiled=True))
for j in range(2):
    relm = np.linalg.norm(afd @ xm[:, j] - Bm[:, j]) / (
        np.linalg.norm(Bm[:, j])
    )
    assert relm < 1e-8, relm
print(f"proc {pid}: mg-block ok", flush=True)

print(f"proc {pid}: iters={int(res.iterations)} SMOKE-OK", flush=True)
sys.exit(0)
