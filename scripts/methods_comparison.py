"""Generate results/methods_virtualmesh.csv: every sharded method's
iteration count and per-iteration collective budget on one problem.

Run on 8 virtual CPU devices (same shard_map code as a TPU slice):

    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    JAX_PLATFORMS=cpu python scripts/methods_comparison.py
"""
from __future__ import annotations

import sys

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np


def main() -> int:
    import cgx
    from cgx.parallel.mesh import make_mesh
    from cgx.parallel.mg_sharded import sharded_mg_cg_solve
    from cgx.parallel.sharded_cg import sharded_cg_solve

    n = 4096  # 64x64 quasi-Laplacian grid; also a true FD grid for MG
    dia = cgx.lap2d_reference(n)
    fd = cgx.lap2d_fd(64)
    b = cgx.source_term(n)
    mesh = make_mesh(8)
    a_ref = dia.to_dense()
    a_fd = fd.to_dense()

    rows = [
        "method,iterations,reductions_per_iter,gathers_per_iter,"
        "true_rel_residual,notes"
    ]

    def record(name, res, reds, gathers, a, note):
        x = np.asarray(res.x)
        rel = np.linalg.norm(a @ x - b) / np.linalg.norm(b)
        assert bool(res.converged), name
        rows.append(
            f"{name},{int(res.iterations)},{reds},{gathers},{rel:.3e},{note}"
        )

    record("reference", sharded_cg_solve(dia, b, mesh=mesh), "2", "0(halo)",
           a_ref, "comm-parity CG; halo mat-vec")
    record("reference+neumann",
           sharded_cg_solve(dia, b, mesh=mesh, precond="neumann"),
           "3", "0(2 halos)", a_ref, "degree-1 polynomial PCG")
    record("pipelined", sharded_cg_solve(dia, b, mesh=mesh, method="pipelined"),
           "1(fused x2)", "0(halo)", a_ref, "Chronopoulos-Gear")
    record("pipelined+neumann",
           sharded_cg_solve(dia, b, mesh=mesh, method="pipelined",
                            precond="neumann"),
           "1(fused x3)", "0(2 halos)", a_ref, "")
    record("chebyshev",
           sharded_cg_solve(dia, b, mesh=mesh, method="chebyshev"),
           "1/32", "0(halo)", a_ref, "zero per-iter reductions")
    record("sstep(s=4)", sharded_cg_solve(dia, b, mesh=mesh, method="sstep"),
           "1/4 (9x9 Gram)", "0(halo)", a_ref, "communication-avoiding CG")
    record("mg-pcg", sharded_mg_cg_solve(fd, b, mesh=mesh), "2",
           "0(halos/level)", a_fd, "bilinear V-cycle; true FD grid")

    from cgx.parallel.sharded_cg import (
        sharded_block_cg_solve,
        sharded_refine_fixed_sweeps,
    )

    ref = sharded_refine_fixed_sweeps(dia, b, mesh=mesh)
    x = np.asarray(ref.x)
    rel = np.linalg.norm(a_ref @ x - b) / np.linalg.norm(b)
    assert bool(ref.converged)
    rows.append(
        f"mixed-refine,{int(ref.iterations)} sweeps "
        f"({int(np.asarray(ref.history).sum())} fp32 inner),"
        f"2 fp32/iter + 1 fp64/sweep,0(halo),{rel:.3e},"
        "fp32 inner CG + fp64 outer sweeps"
    )
    # independent columns: near-linearly-dependent RHS make the block
    # Gram ill-conditioned (jitter keeps it running but slows it and
    # lets the recursive residual drift) — see cgx/solver/blockcg.py
    B = np.random.default_rng(0).standard_normal((n, 3))
    blk = sharded_block_cg_solve(dia, B, mesh=mesh)
    xb = np.asarray(blk.x)
    rel = max(
        np.linalg.norm(a_ref @ xb[:, j] - B[:, j]) / np.linalg.norm(B[:, j])
        for j in range(3)
    )
    assert bool(blk.converged.all())
    rows.append(
        f"block-cg(3 rhs),{int(blk.iterations)},2 (s x s Gram psums),"
        f"0(halo),{rel:.3e},one shared Krylov space for all columns"
    )

    out = "results/methods_virtualmesh.csv"
    with open(out, "w") as f:
        f.write("\n".join(rows) + "\n")
    print("\n".join(rows))
    print(f"\nwrote {out}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
