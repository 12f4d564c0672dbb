"""A runnable tour of cgx's solver ladder on one problem.

    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    JAX_PLATFORMS=cpu python examples/solver_ladder.py

Prints, for the reference's generated problem (lap2d_reference) and
its true-FD sibling, every method/preconditioner path with its
iteration count, per-iteration reduction budget, and true residual —
the framework's answer to the reference's single recurrence.
"""
from __future__ import annotations

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

import cgx


def main() -> None:
    n = 4096
    dia = cgx.lap2d_reference(n)
    fd = cgx.lap2d_fd(64)  # true FD grid (multigrid geometry)
    op = cgx.DiaOperator.from_host(dia)
    b = cgx.source_term(n)
    bj = jnp.asarray(b)
    a = dia.to_dense()

    def show(name, res, reductions):
        x = np.asarray(res.x)
        rel = np.linalg.norm(a @ x - b) / np.linalg.norm(b)
        print(f"{name:34s} iters={int(res.iterations):5d}  "
              f"reductions/iter={reductions:12s}  true_rel={rel:.2e}")

    print(f"N={n}, abs tol 1e-10 (the reference's setting)\n")
    show("cg (reference parity)", cgx.cg_solve(op, bj), "2")
    show("pipelined (Chronopoulos-Gear)", cgx.pipelined_cg_solve(op, bj),
         "1 (fused)")
    show("gvpipe (comm-hiding GV)", cgx.gv_cg_solve(op, bj),
         "1 (overlapped)")
    show("s-step CG (s=4)", cgx.sstep_cg_solve(op, bj, s=4), "1/4")
    show("chebyshev iteration", cgx.chebyshev_solve(op, bj), "1/32")

    from cgx.solver.precond import chebyshev_poly, neumann_banded

    pc_n = neumann_banded(op.bands, op.offsets, sweeps=2)
    show("cg + neumann", cgx.cg_solve(op, bj, precond=pc_n), "2")
    lo, hi = cgx.spectral_bounds(op, n)
    pc_c = chebyshev_poly(op.matvec, lo, hi, degree=3)
    show("cg + chebyshev(3)", cgx.cg_solve(op, bj, precond=pc_c), "2")

    basis = cgx.DeflationBasis.from_lanczos(op, k=16, m=256)
    show("deflated cg (16 Ritz)", cgx.deflated_cg_solve(op, bj, basis), "2")
    _, basis_h = cgx.cg_solve_harvest(op, bj, k=16)
    show("deflated cg (harvested basis)",
         cgx.deflated_cg_solve(op, bj, basis_h), "2")

    # multigrid wants the true FD geometry
    afd = fd.to_dense()
    bfd = cgx.source_term(64 * 64)
    mg = cgx.mg_preconditioner(fd)
    res = cgx.cg_solve(cgx.as_operator(fd), jnp.asarray(bfd), precond=mg.apply)
    x = np.asarray(res.x)
    rel = np.linalg.norm(afd @ x - bfd) / np.linalg.norm(bfd)
    print(f"{'cg + multigrid (64x64 FD grid)':34s} iters={int(res.iterations):5d}  "
          f"reductions/iter={'2':12s}  true_rel={rel:.2e}")

    mg_gs = cgx.mg_preconditioner(fd, smoother="gs")
    res = cgx.cg_solve(
        cgx.as_operator(fd), jnp.asarray(bfd), precond=mg_gs.apply
    )
    x = np.asarray(res.x)
    rel = np.linalg.norm(afd @ x - bfd) / np.linalg.norm(bfd)
    print(f"{'cg + multigrid (red-black GS)':34s} iters={int(res.iterations):5d}  "
          f"reductions/iter={'2':12s}  true_rel={rel:.2e}")

    Bfd = np.stack([bfd, np.roll(bfd, 17), bfd], axis=1)  # incl. a duplicate
    blk = cgx.block_cg_solve(
        cgx.as_operator(fd), jnp.asarray(Bfd), precond=mg_gs.apply
    )
    print(f"{'MG block cg (3 rhs, 1 duplicate)':34s} iters={int(blk.iterations):5d}  "
          f"reductions/iter={'2 Gram psums':12s}  "
          f"conv={bool(blk.converged.all())}")

    if len(jax.devices()) >= 8:
        print("\nsharded (8 devices, halo strategy):")
        show("sharded cg", cgx.sharded_cg_solve(dia, b, n_devices=8), "2 psum")
        show("sharded pipelined+neumann",
             cgx.sharded_cg_solve(dia, b, n_devices=8, method="pipelined",
                                  precond="neumann"), "1 fused psum")
        show("sharded s-step",
             cgx.sharded_cg_solve(dia, b, n_devices=8, method="sstep"),
             "1 psum / 4 it")
        B = np.stack([b, np.roll(b, 17)], axis=1)
        blk = cgx.sharded_block_cg_solve(dia, B, n_devices=8)
        print(f"{'sharded block cg (2 rhs)':34s} iters={int(blk.iterations):5d}  "
              f"reductions/iter={'1 fused Gram':12s}  "
              f"conv={bool(blk.converged.all())}")
        blk = cgx.sharded_block_cg_solve(
            dia, B, n_devices=8, precond="neumann"
        )
        print(f"{'sharded block cg + neumann':34s} iters={int(blk.iterations):5d}  "
              f"reductions/iter={'2 Gram psums':12s}  "
              f"conv={bool(blk.converged.all())}")
        dfl = cgx.sharded_deflated_cg_solve(dia, b, k=16, n_devices=8)
        print(f"{'sharded deflated cg (k=16)':34s} iters={int(dfl.iterations):5d}  "
              f"reductions/iter={'2 + (2k,)':12s}  "
              f"conv={bool(dfl.converged)}")
        Bfd2 = np.stack([bfd, 0.5 * bfd + 1.0], axis=1)
        mgb = cgx.sharded_mg_block_cg_solve(
            fd, Bfd2, n_devices=8, smoother="gs", cycle_precision="fp32"
        )
        print(f"{'sharded MG block cg (fp32 cycle)':34s} iters={int(mgb.iterations):5d}  "
              f"reductions/iter={'2 Gram psums':12s}  "
              f"conv={bool(mgb.converged.all())}")


if __name__ == "__main__":
    main()
