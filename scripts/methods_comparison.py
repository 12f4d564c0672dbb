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
    from cgx.parallel.sharded_cg import (
        sharded_cg_solve,
        sharded_deflated_cg_solve,
    )

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
    record("gvpipe", sharded_cg_solve(dia, b, mesh=mesh, method="gvpipe"),
           "1(fused x2)", "0(halo)", a_ref,
           "Ghysels-Vanroose comm-hiding: psum overlaps the mat-vec "
           "(collective critical depth 1); guarded residual replacement")
    record("gvpipe+neumann",
           sharded_cg_solve(dia, b, mesh=mesh, method="gvpipe",
                            precond="neumann"),
           "1(fused x3)", "0(2 halos)", a_ref, "")
    record("chebyshev",
           sharded_cg_solve(dia, b, mesh=mesh, method="chebyshev"),
           "1/32", "0(halo)", a_ref, "zero per-iter reductions")
    record("sstep(s=4)", sharded_cg_solve(dia, b, mesh=mesh, method="sstep"),
           "1/4 (9x9 Gram)", "0(halo)", a_ref,
           "communication-avoiding CG; guarded residual replacement")
    record("sstep(s=4 deephalo)",
           sharded_cg_solve(dia, b, mesh=mesh, method="sstep",
                            sstep_powers="deephalo"),
           "1/4 (9x9 Gram)", "0(1 deep halo/4 it)", a_ref,
           "distributed matrix-powers basis; 2 ppermutes+1 psum per block")
    record("sstep(s=12 newton)",
           sharded_cg_solve(dia, b, mesh=mesh, method="sstep", sstep_s=12,
                            sstep_basis="newton"),
           "1/12 (25x25 Gram)", "0(halo)", a_ref,
           "deep-s CA-CG; Leja-Newton basis")
    record("deflated(k=16)",
           sharded_deflated_cg_solve(dia, b, k=16, mesh=mesh),
           "2 + 1 (2k,) fused", "0(halo)", a_ref,
           "converged-Ritz deflation; W row-sharded")
    record("mg-pcg", sharded_mg_cg_solve(fd, b, mesh=mesh), "2",
           "0(halos/level)", a_fd, "bilinear V-cycle; true FD grid")
    record("mg-pcg(gs,fp32 cycle)",
           sharded_mg_cg_solve(fd, b, mesh=mesh, smoother="gs",
                               cycle_precision="fp32"),
           "2", "0(halos/level)", a_fd,
           "red-black GS smoothing; fp32 V-cycle inside fp64 CG")

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
    B = np.random.default_rng(0).standard_normal((n, 3))
    blk = sharded_block_cg_solve(dia, B, mesh=mesh)
    xb = np.asarray(blk.x)
    rel = max(
        np.linalg.norm(a_ref @ xb[:, j] - B[:, j]) / np.linalg.norm(B[:, j])
        for j in range(3)
    )
    assert bool(blk.converged.all())
    rows.append(
        f"block-cg(3 rhs),{int(blk.iterations)},1 fused (3s x 3s) Gram,"
        f"0(halo),{rel:.3e},breakdown-free shared Krylov space"
    )

    # dependent columns: the case the breakdown-free default exists for
    Bd = np.stack([b, b, 0.3 * b + 1.0], axis=1)
    blkd = sharded_block_cg_solve(dia, Bd, mesh=mesh)
    xd = np.asarray(blkd.x)
    reld = max(
        np.linalg.norm(a_ref @ xd[:, j] - Bd[:, j]) / np.linalg.norm(Bd[:, j])
        for j in range(3)
    )
    assert bool(blkd.converged.all()) and not bool(blkd.breakdown)
    rows.append(
        f"block-cg(3 dependent rhs),{int(blkd.iterations)},"
        f"1 fused (3s x 3s) Gram,0(halo),{reld:.3e},"
        "duplicate+related columns; rank-revealing directions"
    )

    from cgx.parallel.sharded_cg import sharded_block_deflated_cg_solve

    blkd2 = sharded_block_deflated_cg_solve(dia, Bd, k=16, mesh=mesh)
    xd2 = np.asarray(blkd2.x)
    reld2 = max(
        np.linalg.norm(a_ref @ xd2[:, j] - Bd[:, j])
        / np.linalg.norm(Bd[:, j])
        for j in range(3)
    )
    assert bool(blkd2.converged.all())
    rows.append(
        f"deflated-block-cg(3 dependent rhs),{int(blkd2.iterations)},"
        f"3 (Gram + guard + dir),0(halo),{reld2:.3e},"
        "shared Krylov block + Ritz recycling (k=16)"
    )

    from cgx.parallel.mg_sharded import sharded_mg_block_cg_solve

    bfd = b  # the FD grid shares n
    Bm = np.stack([bfd, 0.5 * bfd + 1.0, bfd], axis=1)
    mgb = sharded_mg_block_cg_solve(
        fd, Bm, mesh=mesh, smoother="gs", cycle_precision="fp32"
    )
    xm = np.asarray(mgb.x)
    relm = max(
        np.linalg.norm(a_fd @ xm[:, j] - Bm[:, j]) / np.linalg.norm(Bm[:, j])
        for j in range(3)
    )
    assert bool(mgb.converged.all())
    rows.append(
        f"mg-block-cg(3 rhs),{int(mgb.iterations)},"
        f"2 Gram psums + s vcycles,0(halos/level),{relm:.3e},"
        "grid-independent multi-RHS; vmapped per-column V-cycles"
    )

    out = "results/methods_virtualmesh.csv"
    with open(out, "w") as f:
        f.write("\n".join(rows) + "\n")
    print("\n".join(rows))
    print(f"\nwrote {out}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
