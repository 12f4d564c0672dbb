"""CLI driver (reference L5) supporting both reference grammars.

MPI grammar (MPI/cg_main.cc:13-69, README.md:62-72):

    python -m cgx.cli.main <N> <out.txt> [maxIter]

  generates the reference Laplacian of size N, solves, and appends the
  CSV row ``N,psize,elapsed`` (cg_main.cc:57-64), where psize is the
  number of mesh devices used.

CUDA grammar (CUDA/cg_main.cc:16-63, README.md:96-105):

    python -m cgx.cli.main <matrix.mtx> <NUM_THREADS> <BLOCK_WIDTH> \
        <true|false> <out.txt>

  reads the MatrixMarket file, solves dense with the Pallas kernel
  tiled (NUM_THREADS x BLOCK_WIDTH) — the reference's thread/block
  sweep parameters map to row/column tile sizes — and appends
  ``NUM_THREADS,BLOCK_WIDTH,elapsed`` (cg_main.cc:56-60). The boolean
  selects the fused-transpose-style kernel path (MatVecT analogue:
  fused mat-vec + dot).

Extra options (after the positionals, all optional):

    --format {dense,dia,ell,csr}   device operator format
    --precision {fp64,fp32,bf16}   mat-vec precision (reductions track
                                   the widest enabled float)
    --devices P                    shard over P devices (sharded solve)
    --strategy {auto,allgather,reducescatter,halo}
    --tol T / --history H          solver knobs
    --no-debug                     suppress the [STEP k] summary line

Both paths print the reference's DEBUG line (cg.cc:144-154):

    \t[STEP k] residual = R, ||x|| = X, ||Ax - b||/||b|| = E
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np


def _build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="cgx",
        description="TPU-native conjugate-gradient solver (reference-parity CLI)",
    )
    p.add_argument("positionals", nargs="+", help="reference-grammar positionals")
    p.add_argument("--format", dest="fmt", default=None,
                   choices=["dense", "dia", "ell", "csr"])
    p.add_argument("--precision", default="fp64", choices=["fp64", "fp32", "bf16"])
    p.add_argument("--devices", type=int, default=None)
    p.add_argument("--strategy", default="auto",
                   choices=["auto", "allgather", "reducescatter", "halo"])
    p.add_argument("--method", default="reference",
                   choices=["reference", "pipelined", "gvpipe",
                            "chebyshev", "sstep"],
                   help="recurrence: comm-parity CG, single-all-reduce "
                        "Chronopoulos-Gear CG, communication-hiding "
                        "Ghysels-Vanroose CG (all-reduce overlaps the "
                        "mat-vec), zero-reduction Chebyshev iteration, "
                        "or s-step CG (s iters/reduction)")
    p.add_argument("--precond", default=None,
                   choices=["jacobi", "block_jacobi", "neumann",
                            "chebyshev", "mg"])
    p.add_argument("--precond-block-size", type=int, default=None,
                   help="precond=block_jacobi: rows per diagonal block "
                        "(default 32; the apply is one batched MXU "
                        "matmul, no collectives on sharded solves)")
    p.add_argument("--tol", type=float, default=None)
    p.add_argument("--history", type=int, default=0)
    p.add_argument("--maxiter", type=int, default=None)
    p.add_argument("--mg-smoother", default="richardson",
                   choices=["richardson", "gs"],
                   help="precond=mg: scalar-damped Richardson or "
                        "multicolor Gauss-Seidel smoothing")
    p.add_argument("--mg-cycle", default="fp64",
                   choices=["fp32", "fp64"],
                   help="precond=mg: V-cycle arithmetic (default fp64 "
                        "= solve precision; fp32 is iteration-neutral "
                        "on the tested grids and ~1.8x faster on TPU)")
    p.add_argument("--sstep-s", type=int, default=4,
                   help="method=sstep: iterations per Gram reduction")
    p.add_argument("--sstep-basis", default="chebyshev",
                   choices=["chebyshev", "newton"],
                   help="method=sstep: basis family (newton = "
                        "Leja-ordered Ritz shifts)")
    p.add_argument("--sstep-powers", default="off",
                   choices=["off", "deephalo", "pallas"],
                   help="method=sstep: matrix-powers basis build "
                        "(deephalo: one deep halo exchange per block "
                        "on sharded solves; pallas: fused HBM kernel "
                        "on single-device fp32/bf16 banded solves)")
    p.add_argument("--sstep-replace-every", type=int, default=2,
                   help="method=sstep: guarded residual-replacement "
                        "cadence in outer blocks (0 = off)")
    p.add_argument("--gv-replace-every", type=int, default=25,
                   help="method=gvpipe: guarded residual-replacement "
                        "cadence (0 = off)")
    p.add_argument("--no-debug", action="store_true")
    p.add_argument("--pallas", action="store_true",
                   help="use Pallas kernels for the mat-vec (fp32/bf16)")
    return p


def main(argv=None) -> int:
    args = _build_parser().parse_args(argv)
    pos = args.positionals

    import jax

    if args.precision == "fp64":
        from cgx.config import enable_x64

        enable_x64()

    import jax.numpy as jnp

    from cgx.config import DEFAULT_TOLERANCE
    from cgx.mats.containers import COOMatrix, CSRMatrix, DIAMatrix, ELLMatrix
    from cgx.mats.generators import lap2d_reference, source_term
    from cgx.solver.cg import cg_solve
    from cgx.solver.operators import as_operator

    dtype = {"fp64": jnp.float64, "fp32": jnp.float32, "bf16": jnp.bfloat16}[
        args.precision
    ]
    dot_precision = None
    if args.precision != "fp64":
        # mixed-precision mode: accumulate scalars in the widest float
        dot_precision = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32

    tol = args.tol if args.tol is not None else DEFAULT_TOLERANCE

    if _is_int(pos[0]):
        # ---- MPI grammar: N out.txt [maxIter] ----
        if len(pos) < 2:
            print("usage: cgx <N> <out.txt> [maxIter]", file=sys.stderr)
            return 1
        n = int(pos[0])
        out_file = pos[1]
        maxiter = int(pos[2]) if len(pos) >= 3 else args.maxiter
        fmt = args.fmt or "dense"
        mat = lap2d_reference(n)
        b_np = source_term(n)
        csv_row_fn = lambda psize, secs: f"{n},{psize},{secs}"
    else:
        # ---- CUDA grammar: mtx NT BW T out.txt ----
        if len(pos) < 5:
            print(
                "usage: cgx <matrix.mtx> <NUM_THREADS> <BLOCK_WIDTH> "
                "<true|false> <out.txt>",
                file=sys.stderr,
            )
            return 1
        mtx_path = pos[0]
        num_threads = _stoi(pos[1])
        block_width = _stoi(pos[2])
        # reference semantics: 'true' selects the coalesced MatVecT
        # kernel (cg_main.cc:27-30); here it selects the hand-tiled
        # Pallas dense kernel, 'false' the XLA-tiled matvec
        fused = pos[3].strip().lower() == "true"
        out_file = pos[4]
        coo = COOMatrix.read(mtx_path)
        n = coo.shape[0]
        fmt = args.fmt or "dense"
        mat = coo
        b_np = source_term(n)
        maxiter = args.maxiter
        csv_row_fn = lambda psize, secs: f"{num_threads},{block_width},{secs}"
        if fused:
            args.pallas = True
            args.pallas_tiles = (num_threads, block_width)

    # Build the operator in the requested format.
    if isinstance(mat, COOMatrix):
        host = {
            "dense": lambda: mat.to_dense(),
            "dia": lambda: DIAMatrix.from_coo(mat),
            "ell": lambda: ELLMatrix.from_coo(mat),
            "csr": lambda: CSRMatrix.from_coo(mat),
        }[fmt]()
    else:  # DIAMatrix from the generator
        host = {
            "dense": lambda: mat.to_dense(),
            "dia": lambda: mat,
            "ell": lambda: _dia_to_ell(mat),
            "csr": lambda: _dia_to_csr(mat),
        }[fmt]()

    b = jnp.asarray(b_np, dtype=dtype)

    if args.devices is not None and args.devices > 1:
        from cgx.parallel.mesh import make_mesh
        from cgx.parallel.sharded_cg import sharded_cg_solve

        mesh = make_mesh(args.devices)
        psize = args.devices
        host_mat = (
            host
            if isinstance(host, (DIAMatrix, ELLMatrix, CSRMatrix))
            else _as_dense_np(host)
        )
        if args.precision == "bf16":
            print(
                "warning: sharded mode runs bf16 requests in fp32",
                file=sys.stderr,
            )
        b_host = b_np if args.precision == "fp64" else b_np.astype(np.float32)
        t1 = time.perf_counter()
        if args.precond == "mg":
            from cgx.parallel.mg_sharded import sharded_mg_cg_solve

            if not isinstance(host_mat, DIAMatrix):
                print("error: --precond mg needs a banded (dia) operator",
                      file=sys.stderr)
                return 1
            res = sharded_mg_cg_solve(
                host_mat, b_host, mesh=mesh, tol=tol, maxiter=maxiter,
                history=args.history, smoother=args.mg_smoother,
                cycle_precision=args.mg_cycle,
            )
        else:
            res = sharded_cg_solve(
                host_mat,
                b_host,
                mesh=mesh,
                strategy=args.strategy,
                method=args.method,
                precond=args.precond,
                precond_block_size=args.precond_block_size,
                tol=tol,
                maxiter=maxiter,
                history=args.history,
                dot_precision=dot_precision,
                sstep_s=args.sstep_s,
                sstep_basis=args.sstep_basis,
                sstep_replace_every=args.sstep_replace_every,
                sstep_powers=args.sstep_powers,
                gv_replace_every=args.gv_replace_every,
            )
        res.x.block_until_ready()
        elapsed = time.perf_counter() - t1
    else:
        psize = 1
        use_pallas = bool(getattr(args, "pallas", False))
        if use_pallas and args.precision == "fp64":
            print(
                "warning: Pallas kernels are fp32/bf16; fp64 request "
                "falls back to the XLA mat-vec",
                file=sys.stderr,
            )
            use_pallas = False
        if use_pallas and fmt == "dense":
            # the reference's NUM_THREADS x BLOCK_WIDTH sweep drives the
            # Pallas tile sizes (sublane-/lane-aligned and clamped)
            from cgx.solver.operators import PallasDenseOperator

            if hasattr(args, "pallas_tiles"):
                nt, bw = args.pallas_tiles
            else:
                # no explicit tiles requested: use the per-device
                # autotune cache (static defaults when never tuned)
                from cgx.bench.autotune import tuned_tiles

                nt, bw = tuned_tiles(n, dtype)
            br = max(8, min((nt // 8) * 8 or 8, 1024))
            bc = max(128, min((bw // 128) * 128 or 128, 4096))
            # an operator pytree, NOT a closure: capturing a_dev in a
            # lambda would bake the whole matrix into the compiled
            # program as a constant (multi-GB compile payloads on
            # relay-compiled backends)
            op = PallasDenseOperator(
                jnp.asarray(_as_dense_np(host), dtype=dtype),
                block_rows=br, block_cols=bc,
            )
        else:
            op = as_operator(host, dtype=dtype)
        t1 = time.perf_counter()
        pc = None
        if args.precond is not None:
            from cgx.solver.operators import DiaOperator
            from cgx.solver.precond import jacobi as mk_jacobi
            from cgx.solver.precond import neumann_banded

            # reuse the operator built above unless the Pallas path
            # replaced it with a bare callable
            base_op = op if hasattr(op, "diagonal") else as_operator(
                host, dtype=dtype
            )
            if args.precond == "jacobi":
                pc = mk_jacobi(base_op.diagonal())
            elif args.precond == "block_jacobi":
                from cgx.solver.precond import block_jacobi

                m_bj = args.precond_block_size or min(32, n)
                pc = block_jacobi(base_op, m_bj, dtype=dtype)
            elif args.precond == "chebyshev":
                from cgx.solver.chebyshev import spectral_bounds
                from cgx.solver.precond import chebyshev_poly

                lo, hi = spectral_bounds(base_op, n)
                pc = chebyshev_poly(base_op.matvec, lo, hi, degree=3)
            elif args.precond == "mg":
                from cgx.solver.multigrid import mg_preconditioner

                mg_src = base_op if isinstance(base_op, DiaOperator) else (
                    host if isinstance(host, DIAMatrix) else None
                )
                if mg_src is None:
                    print(
                        "error: --precond mg needs a banded grid operator "
                        "(--format dia)",
                        file=sys.stderr,
                    )
                    return 1
                if args.mg_cycle == "fp32" and args.precision == "fp64":
                    import jax.numpy as _jnp

                    pc = mg_preconditioner(
                        mg_src, smoother=args.mg_smoother,
                        dtype=_jnp.float32,
                    ).apply_mixed
                else:
                    pc = mg_preconditioner(
                        mg_src, smoother=args.mg_smoother
                    ).apply
            elif isinstance(base_op, DiaOperator):
                pc = neumann_banded(base_op.bands, base_op.offsets, sweeps=2)
            else:
                print(
                    "warning: --precond neumann needs a banded operator; "
                    "falling back to jacobi",
                    file=sys.stderr,
                )
                pc = mk_jacobi(base_op.diagonal())
        if args.method == "pipelined":
            from cgx.solver.pipelined import pipelined_cg_solve

            res = pipelined_cg_solve(
                op, b, tol=tol, maxiter=maxiter, history=args.history,
                dot_precision=dot_precision, precond=pc,
            )
        elif args.method == "gvpipe":
            from cgx.solver.gvpipe import gv_cg_solve

            res = gv_cg_solve(
                op, b, tol=tol, maxiter=maxiter, history=args.history,
                dot_precision=dot_precision, precond=pc,
                replace_every=args.gv_replace_every,
            )
        elif args.method == "chebyshev":
            from cgx.solver.chebyshev import chebyshev_solve

            if pc is not None:
                print(
                    "warning: chebyshev takes no preconditioner; ignoring",
                    file=sys.stderr,
                )
            # bounds estimation needs .matvec; the Pallas path's bare
            # callable falls back to the XLA operator
            cheb_op = op if hasattr(op, "matvec") else as_operator(host, dtype=dtype)
            res = chebyshev_solve(cheb_op, b, tol=tol, maxiter=maxiter)
        elif args.method == "sstep":
            from cgx.solver.sstep import sstep_cg_solve

            ss_op = op if hasattr(op, "matvec") else as_operator(host, dtype=dtype)
            res = sstep_cg_solve(
                ss_op, b, tol=tol, maxiter=maxiter, s=args.sstep_s,
                basis=args.sstep_basis,
                replace_every=args.sstep_replace_every,
                powers=args.sstep_powers,
            )
        else:
            res = cg_solve(
                op,
                b,
                tol=tol,
                maxiter=maxiter,
                history=args.history,
                dot_precision=dot_precision,
                precond=pc,
            )
        res.x.block_until_ready()
        elapsed = time.perf_counter() - t1

    if not args.no_debug:
        x = np.asarray(res.x, dtype=np.float64)
        a_host = _as_dense_np(host) if n <= 20000 else None
        if a_host is not None:
            r_true = a_host @ x - b_np
            rel = np.linalg.norm(r_true) / np.linalg.norm(b_np)
        else:
            rel = float("nan")
        # reference parity: print sqrt(rsold) (stale by one iteration,
        # cg.cc:152). Under a preconditioner rsold is <r,z>, not
        # ||r||^2, so print the actual residual norm instead.
        if args.precond is None:
            shown = float(np.sqrt(np.asarray(res.rsold, np.float64)))
        else:
            shown = float(np.asarray(res.residual_norm, np.float64))
        print(
            "\t[STEP {}] residual = {:e}, ||x|| = {:e}, ||Ax - b||/||b|| = {:e}".format(
                int(res.iterations),
                shown,
                float(np.linalg.norm(x)),
                rel,
            )
        )

    print(f"Time for CG ({fmt} solver)  = {elapsed} [s]")
    with open(out_file, "a") as f:
        f.write(csv_row_fn(psize, elapsed) + "\n")
    return 0


def _is_int(s: str) -> bool:
    try:
        int(s)
        return True
    except ValueError:
        return False


def _stoi(s: str) -> int:
    """std::stoi parity: parse the leading integer, ignore trailing junk
    (the reference's cg.run passes '2,'-style tokens — SURVEY §3.5)."""
    out = []
    for i, c in enumerate(s):
        if c.isdigit() or (i == 0 and c in "+-"):
            out.append(c)
        else:
            break
    if not out:
        raise ValueError(f"cannot parse integer from {s!r}")
    return int("".join(out))


def _as_dense_np(host) -> np.ndarray:
    from cgx.mats.containers import CSRMatrix, DIAMatrix, ELLMatrix

    if isinstance(host, np.ndarray):
        return host
    if isinstance(host, DIAMatrix):
        return host.to_dense()
    if isinstance(host, CSRMatrix):
        n = host.shape[0]
        dense = np.zeros(host.shape)
        lengths = np.diff(host.indptr)
        rows = np.repeat(np.arange(n), lengths)
        dense[rows, host.indices] = host.values
        return dense
    if isinstance(host, ELLMatrix):
        dense = np.zeros(host.shape)
        rows = np.repeat(np.arange(host.shape[0]), host.indices.shape[1])
        # add.at: ELL padding points at column 0 with value 0, which may
        # coincide with a real (i, 0) entry — plain fancy assignment
        # would drop one of them
        np.add.at(dense, (rows, host.indices.ravel()), host.values.ravel())
        return dense
    raise TypeError(type(host))


def _dia_to_ell(dia):
    from cgx.mats.containers import COOMatrix, ELLMatrix

    dense = dia.to_dense()
    rows, cols = np.nonzero(dense)
    coo = COOMatrix(
        dia.shape, rows.astype(np.int32), cols.astype(np.int32), dense[rows, cols]
    )
    return ELLMatrix.from_coo(coo)


def _dia_to_csr(dia):
    from cgx.mats.containers import COOMatrix, CSRMatrix

    dense = dia.to_dense()
    rows, cols = np.nonzero(dense)
    coo = COOMatrix(
        dia.shape, rows.astype(np.int32), cols.astype(np.int32), dense[rows, cols]
    )
    return CSRMatrix.from_coo(coo)


if __name__ == "__main__":
    sys.exit(main())
