"""High-level solve entry point driven by :class:`cgx.SolveConfig`.

One call that dispatches across the framework's paths:

    import cgx
    res = cgx.solve(matrix, b)                         # defaults
    res = cgx.solve(matrix, b, cgx.SolveConfig(
        precision="fp32", use_pallas=True, history=64))
    res = cgx.solve(matrix, b, n_devices=8)            # sharded

Dispatch rules:
- host containers become their natural device operator
  (:func:`cgx.solver.operators.as_operator`);
- ``n_devices > 1`` routes to the shard_map solver (DIA and dense);
- ``use_pallas`` + banded + fp32/bf16 routes to the VMEM-resident
  whole-solve kernel when the state fits in VMEM; larger problems run
  the core XLA-fused loop (measured faster than per-iteration Pallas
  launches once the bands stream from HBM);
- everything else runs the core jitted while-loop solver.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from cgx.config import SolveConfig, VMEM_BUDGET_BYTES
from cgx.mats.containers import DenseMatrix, DIAMatrix
from cgx.solver.cg import CGResult, cg_solve
from cgx.solver.operators import DiaOperator, as_operator

_DTYPES = {"fp64": jnp.float64, "fp32": jnp.float32, "bf16": jnp.bfloat16}



def _build_precond(cfg: SolveConfig, op, n: int):
    """Single-device preconditioner from the config (single-vector
    callable — the block path vmaps it across columns)."""
    if cfg.precond is None:
        return None
    from cgx.solver.precond import jacobi as mk_jacobi
    from cgx.solver.precond import neumann_banded

    if cfg.precond == "jacobi":
        return mk_jacobi(op.diagonal())
    if cfg.precond == "block_jacobi":
        from cgx.solver.precond import block_jacobi

        m = cfg.precond_block_size or min(32, n)
        return block_jacobi(op, m, dtype=op.dtype)
    if cfg.precond == "neumann":
        if not isinstance(op, DiaOperator):
            raise ValueError("precond='neumann' needs a banded operator")
        return neumann_banded(op.bands, op.offsets, sweeps=2)
    if cfg.precond == "chebyshev":
        from cgx.solver.chebyshev import spectral_bounds
        from cgx.solver.precond import chebyshev_poly

        lo, hi = spectral_bounds(op, n)
        return chebyshev_poly(op.matvec, lo, hi, degree=3)
    if cfg.precond == "mg":
        from cgx.solver.multigrid import infer_grid_ndim, mg_preconditioner

        if not isinstance(op, DiaOperator):
            raise ValueError("precond='mg' needs a banded grid operator")
        nd = infer_grid_ndim(op.shape[0], op.offsets)
        if (
            cfg.mg_cycle_precision == "fp32"
            and op.dtype == jnp.float64
        ):
            mg = mg_preconditioner(
                op, ndim=nd, smoother=cfg.mg_smoother, dtype=jnp.float32
            )
            return mg.apply_mixed
        return mg_preconditioner(op, ndim=nd, smoother=cfg.mg_smoother).apply
    raise ValueError(f"unknown precond {cfg.precond!r}")


def _sharded_powers(cfg):
    if cfg.sstep_powers == "auto":
        # sharded 'auto' stays with per-mat-vec halo exchanges:
        # 'deephalo' trades message count for halo depth s*h, which
        # only pays when the shard is much deeper than the stencil
        # reach — an explicit topology decision, not a default
        return "off"
    if cfg.sstep_powers in ("off", "deephalo", "fused"):
        # 'fused' runs the fused streaming s-step block per shard
        # under the deep-halo collective pattern
        # (cgx.parallel.sstep_fused); its plane-tiling geometry
        # contract is checked at build and raises with the concrete
        # numbers when the shard cannot tile
        return cfg.sstep_powers
    if cfg.sstep_powers in ("pallas", "interpret"):
        raise ValueError(
            f"sstep_powers={cfg.sstep_powers!r} is a single-device mode; "
            "use sstep_powers='deephalo' or 'fused' for sharded solves"
        )
    raise ValueError(f"unknown sstep_powers {cfg.sstep_powers!r}")


def _single_powers(cfg, op=None):
    if cfg.sstep_powers == "auto":
        # round-4 routing decision (VERDICT item 1): the fused
        # streaming block is the DEFAULT inside its measured envelope
        # — banded fp32/bf16 operator, s <= 6 (the fp32 basis-
        # conditioning cap), accelerator backend. Trusted 2.03x over
        # the aliased stream kernel at N=1.024e7 (spread <= 0.21,
        # results/hw_queue_r4/sstep_race_a1.json), and it degrades
        # GRACEFULLY on basis rank collapse: the replay freezes at a
        # valid iterate and fallback='auto' finishes on the plain
        # streaming kernel — quality-matched at the flagship size
        # (sstep_gate4.json: true_rel 2.57 vs stream 2.47 at the
        # shared f32 floor). CPU backends keep 'off' (the interpreted
        # kernel is a test vehicle, not a route).
        import jax

        from cgx.solver.operators import DiaOperator

        if (
            isinstance(op, DiaOperator)
            and op.dtype != jnp.float64
            and int(cfg.sstep_s) <= 6
            and jax.default_backend() != "cpu"
        ):
            return "fused"
        return "off"
    if cfg.sstep_powers in ("off", "pallas", "interpret", "fused"):
        return cfg.sstep_powers
    if cfg.sstep_powers == "deephalo":
        raise ValueError(
            "sstep_powers='deephalo' is a sharded mode (needs a device "
            "mesh); use sstep_powers='pallas' single-device"
        )
    raise ValueError(f"unknown sstep_powers {cfg.sstep_powers!r}")


def solve(
    mat,
    b,
    config: Optional[SolveConfig] = None,
    *,
    n_devices: Optional[int] = None,
    mesh=None,
    strategy: str = "auto",
    method: Optional[str] = None,
    x0=None,
) -> CGResult:
    """Solve ``A x = b`` with the configuration's preferred path.

    A 2-D ``b`` of shape (n, s) solves all s right-hand sides in ONE
    breakdown-free block-CG Krylov space (cgx.solver.blockcg),
    honoring the config's preconditioner — sharded when
    ``n_devices``/``mesh`` is given (precond='mg' routes to
    sharded_mg_block_cg_solve).

    ``x0`` warm-starts the solve: single-RHS paths (reference /
    pipelined / gvpipe / chebyshev / sstep, single-device and sharded)
    take it directly; multi-RHS block solves use the exact shift
    identity (solve A D = B - A X0 from zero, return X0 + D). The
    Pallas whole-solve/streaming kernels assume a zero start, so a
    warm start routes those requests to the XLA loop.
    """
    cfg = config or SolveConfig()
    if method is None:
        method = cfg.method
    if x0 is not None and cfg.precision in ("mixed", "tw"):
        raise ValueError(
            f"precision={cfg.precision!r} manages its own inner starts; "
            "x0 is not supported there"
        )
    if np.ndim(b) == 2:  # rank check only — no host transfer of b
        if cfg.multi_rhs == "batched":
            return _solve_batched_rhs(
                mat, b, cfg, n_devices=n_devices, mesh=mesh,
                method=method, x0=x0,
            )
        if cfg.multi_rhs != "block":
            raise ValueError(f"unknown multi_rhs {cfg.multi_rhs!r}")
        return _solve_block(
            mat, b, cfg,
            n_devices=n_devices, mesh=mesh, strategy=strategy,
            method=method, x0=x0,
        )
    if cfg.precision == "mixed":
        return _solve_mixed(mat, b, cfg, n_devices=n_devices, mesh=mesh,
                            strategy=strategy, method=method)
    if cfg.precision == "tw":
        return _solve_tw(mat, b, cfg, n_devices=n_devices, mesh=mesh,
                         method=method)
    dtype = _DTYPES[cfg.precision]
    if cfg.precision == "fp64" and not jax.config.jax_enable_x64:
        raise ValueError(
            "precision='fp64' requires x64: call cgx.enable_x64() first "
            "(or pass precision='fp32')"
        )

    b_np = np.asarray(b)
    n = b_np.shape[0]
    maxiter = cfg.maxiter
    if maxiter is None:
        # Chebyshev trades constant factors for comm: give it headroom
        maxiter = 4 * n if method == "chebyshev" else n
    dot_precision = None
    if cfg.precision != "fp64" and jax.config.jax_enable_x64:
        dot_precision = jnp.float64  # mixed-precision reductions

    if (n_devices is not None and n_devices > 1) or mesh is not None:
        from cgx.parallel.sharded_cg import sharded_cg_solve

        host = (
            mat if _is_host(mat) or isinstance(mat, np.ndarray) else _to_host(mat)
        )
        if cfg.precond == "mg":
            from cgx.parallel.mg_sharded import sharded_mg_cg_solve
            from cgx.solver.multigrid import infer_grid_ndim

            if method != "reference":
                raise ValueError(
                    "precond='mg' sharded runs the reference recurrence"
                )
            if not isinstance(host, DIAMatrix):
                raise ValueError("precond='mg' needs a banded grid operator")
            if x0 is not None:
                raise ValueError(
                    "x0 warm starts are not supported on the sharded "
                    "MG path"
                )
            return sharded_mg_cg_solve(
                host,
                b_np.astype(
                    np.float64 if cfg.precision == "fp64" else np.float32
                ),
                mesh=mesh,
                n_devices=n_devices,
                tol=cfg.tolerance,
                maxiter=maxiter,
                nearzero=cfg.nearzero,
                history=cfg.history,
                smoother=cfg.mg_smoother,
                cycle_precision=cfg.mg_cycle_precision,
                ndim=infer_grid_ndim(host.shape[0], host.offsets),
            )
        return sharded_cg_solve(
            host,
            b_np.astype(np.float64 if cfg.precision == "fp64" else np.float32),
            mesh=mesh,
            n_devices=n_devices,
            strategy=strategy,
            method=method,
            precond=cfg.precond,
            precond_block_size=cfg.precond_block_size,
            tol=cfg.tolerance,
            maxiter=maxiter,
            nearzero=cfg.nearzero,
            history=cfg.history,
            dot_precision=dot_precision,
            check_every=cfg.check_every,
            sstep_s=cfg.sstep_s,
            sstep_basis=cfg.sstep_basis,
            sstep_replace_every=cfg.sstep_replace_every,
            sstep_powers=_sharded_powers(cfg),
            sstep_fallback=getattr(cfg, "sstep_fallback", "auto"),
            gv_replace_every=cfg.gv_replace_every,
            dense_fp64=getattr(cfg, "dense_fp64", "auto"),
            local_kernel=getattr(cfg, "local_kernel", "auto"),
            x0=None if x0 is None else np.asarray(x0),
        )

    op = mat if hasattr(mat, "matvec") and not _is_host(mat) else as_operator(
        mat, dtype=dtype
    )
    op = _maybe_ozaki(op, cfg)
    b_dev = jnp.asarray(b_np, dtype=dtype)
    x0_dev = None if x0 is None else jnp.asarray(np.asarray(x0), dtype=dtype)
    pc = _build_precond(cfg, op, n)

    if method == "chebyshev":
        from cgx.solver.chebyshev import chebyshev_solve

        if pc is not None:
            raise ValueError("chebyshev_solve does not take a preconditioner")
        return chebyshev_solve(
            op, b_dev, x0_dev, tol=cfg.tolerance, maxiter=maxiter,
            check_every=cfg.check_every,
        )
    if method == "sstep":
        from cgx.solver.sstep import sstep_cg_solve

        if pc is not None:
            raise ValueError("sstep_cg_solve does not take a preconditioner")
        return sstep_cg_solve(
            op, b_dev, x0_dev, tol=cfg.tolerance, maxiter=maxiter,
            s=cfg.sstep_s,
            basis=cfg.sstep_basis,
            replace_every=cfg.sstep_replace_every,
            powers=_single_powers(cfg, op),
            fallback=getattr(cfg, "sstep_fallback", "auto"),
        )
    if method == "pipelined":
        from cgx.solver.pipelined import pipelined_cg_solve

        return pipelined_cg_solve(
            op, b_dev, x0_dev, tol=cfg.tolerance, maxiter=maxiter,
            nearzero=cfg.nearzero, history=cfg.history,
            dot_precision=dot_precision, precond=pc,
        )
    if method == "gvpipe":
        from cgx.solver.gvpipe import gv_cg_solve

        return gv_cg_solve(
            op, b_dev, x0_dev, tol=cfg.tolerance, maxiter=maxiter,
            nearzero=cfg.nearzero, history=cfg.history,
            dot_precision=dot_precision, precond=pc,
            replace_every=cfg.gv_replace_every,
        )
    if method != "reference":
        raise ValueError(f"unknown method {method!r}")

    if (
        cfg.use_pallas
        and isinstance(op, DiaOperator)
        and cfg.precision != "fp64"
        and cfg.precond in (None, "neumann")
        and x0 is None  # the kernels assume a zero start
    ):
        ndiag = op.bands.shape[0]
        interp = jax.default_backend() == "cpu"
        from cgx.ops.cg_kernel import dia_cg_solve_vmem, vmem2d_scoped_bytes

        item = b_dev.dtype.itemsize
        scoped = vmem2d_scoped_bytes(
            ndiag, n, op.bands.dtype.itemsize, item,
            precond=cfg.precond == "neumann",
        )
        if scoped <= VMEM_BUDGET_BYTES:
            # whole-solve VMEM kernel, (rows, cols)-plane layout:
            # hardware-raced at 1.3-48.6 us/iter for n=2.5e5..2.0e6 —
            # 3-11x the XLA-fused loop (results/hw_queue_r2s8).
            # The kernel's in-kernel PCG IS the degree-1 Neumann apply.
            try:
                return dia_cg_solve_vmem(
                    op, b_dev, tol=cfg.tolerance, maxiter=maxiter,
                    nearzero=cfg.nearzero, interpret=interp, layout="2d",
                    precond=cfg.precond == "neumann",
                )
            except jax.errors.JaxRuntimeError as e:
                # Compile-service rejection, not a math failure: fall
                # through to the streaming kernel (always compilable —
                # its scoped VMEM is block-sized, not state-sized).
                # Measured trigger: the relay's chipless AOT compile
                # helper rejects Pallas programs with scoped VMEM
                # >~48 MB (HTTP 500 between 46.4 and 51.8 MB, round-4
                # session 2) even though the chip has 128 MB — earlier
                # rounds compiled 113 MB programs on the same chip.
                import warnings

                warnings.warn(
                    "vmem2d whole-solve kernel failed to compile "
                    f"({str(e)[:120]}...); falling back to the "
                    "streaming kernel", RuntimeWarning, stacklevel=2,
                )
        # State larger than VMEM: cfg.large_banded picks between the
        # fused-iteration streaming kernel (cgx.ops.cg_stream — default,
        # 2x the XLA loop on v5e at N=4e6..1e7) and the XLA-fused
        # while-loop ("xla").
        if cfg.large_banded == "stream" and cfg.precond is None:
            from cgx.ops.cg_stream import dia_cg_solve_stream

            return dia_cg_solve_stream(
                op, b_dev, tol=cfg.tolerance, maxiter=maxiter,
                nearzero=cfg.nearzero, interpret=interp,
                # bf16 band planes when (and only when) the cast
                # roundtrip is bit-exact, so the solved operator is
                # untouched: the full 15/12.5 analytic traffic win on
                # the aliased kernel (282.8 vs 333-349 us/iter at
                # N=4e6, iteration-neutral — BENCHMARKS round 3)
                bands_dtype="auto",
            )
        if cfg.large_banded == "stream" and cfg.precond == "neumann":
            from cgx.ops.cg_stream import dia_cg_solve_stream_pcg

            # the kernel's in-slab PCG IS neumann_banded(sweeps=2)
            return dia_cg_solve_stream_pcg(
                op, b_dev, tol=cfg.tolerance, maxiter=maxiter,
                nearzero=cfg.nearzero, interpret=interp,
            )
        if cfg.large_banded not in ("xla", "stream"):
            raise ValueError(f"unknown large_banded {cfg.large_banded!r}")

    return cg_solve(
        op,
        b_dev,
        x0_dev,
        tol=cfg.tolerance,
        maxiter=maxiter,
        nearzero=cfg.nearzero,
        history=cfg.history,
        dot_precision=dot_precision,
        precond=pc,
    )


def _solve_mixed(mat, b, cfg, *, n_devices, mesh, strategy, method):
    """precision='mixed': fp32 inner CG + fp64 refinement sweeps.

    Tolerance semantics are RELATIVE here (always: cfg.tolerance is
    rtol — refinement recomputes the true residual, which cannot drop
    below the fp64 floor, so absolute targets don't transfer).
    cfg.maxiter caps the INNER fp32 solve; cfg.history is not
    supported on this path (per-sweep inner counts are returned in
    CGResult.history by the sharded variant)."""
    if not jax.config.jax_enable_x64:
        raise ValueError("precision='mixed' needs x64 for the fp64 sweeps")
    if method != "reference" or cfg.precond is not None:
        raise ValueError(
            "precision='mixed' runs the reference recurrence without an "
            "outer preconditioner (the fp32 inner solve is the "
            "acceleration)"
        )
    host = mat if isinstance(mat, DIAMatrix) else _to_host(mat)
    if not isinstance(host, DIAMatrix):
        raise ValueError("precision='mixed' needs a banded operator")
    b_np = np.asarray(b, np.float64)
    if (n_devices is not None and n_devices > 1) or mesh is not None:
        from cgx.parallel.sharded_cg import sharded_refine_fixed_sweeps

        return sharded_refine_fixed_sweeps(
            host, b_np, mesh=mesh, n_devices=n_devices, strategy=strategy,
            rtol=cfg.tolerance,
        )
    op64 = DiaOperator.from_host(host, dtype=jnp.float64)
    n = b_np.shape[0]
    ndiag = op64.bands.shape[0]
    from cgx.ops.cg_kernel import vmem2d_scoped_bytes

    scoped = vmem2d_scoped_bytes(ndiag, n, 4, 4, precond=True)
    on_cpu = jax.default_backend() == "cpu"
    if scoped <= VMEM_BUDGET_BYTES:
        from cgx.solver.refine import refine_fixed_sweeps

        res = refine_fixed_sweeps(
            op64, jnp.asarray(b_np), rtol=cfg.tolerance,
            inner_maxiter=cfg.maxiter, layout="2d",
            interpret=on_cpu,
        )
    else:
        # inner state exceeds VMEM: the fused streaming Neumann-PCG
        # inner (via iterative_refinement's use_pallas dispatch) is
        # ~1.8x the XLA-fused loop on hardware; on CPU keep the XLA
        # path (interpret-mode streaming at n > 2e6 is impractical)
        from cgx.solver.refine import iterative_refinement

        res = iterative_refinement(
            op64, jnp.asarray(b_np), tol=0.0, rtol=cfg.tolerance,
            inner_maxiter=cfg.maxiter, use_pallas=not on_cpu,
        )
    return CGResult(
        x=res.x,
        iterations=jnp.asarray(res.outer_iterations, jnp.int32),
        residual_norm=res.residual_norm,
        converged=res.converged,
        rsold=res.residual_norm**2,
        history=jnp.zeros((0,), jnp.float64),
        breakdown=jnp.asarray(False),
    )


def _solve_tw(mat, b, cfg, *, n_devices, mesh, method):
    """precision='tw': triple-word f32 refinement sweeps around an fp32
    (MG-)PCG inner — the beyond-fp64-floor quality route.

    Tolerance semantics are RELATIVE (cfg.tolerance is rtol against
    ||b||), judged on the tw-evaluated TRUE residual — meaningful below
    the fp64 evaluation floor, where even exact fp64 arithmetic cannot
    certify a residual (cgx/ops/tw32.py; at N=4e6 the floor is ~5e-10
    while this path certifies 4.8e-12, host-longdouble-verified —
    results/hw_queue_r3/fp64q_g2000_tw.json). cfg.maxiter caps the
    INNER solve per sweep; cfg.precond: None/'mg' build an fp32 MG
    V-cycle when the operator decodes on a grid, falling back to an
    unpreconditioned fp32 inner otherwise."""
    if not jax.config.jax_enable_x64:
        raise ValueError("precision='tw' needs x64 for the fp64 splits")
    if method != "reference":
        raise ValueError("precision='tw' runs the reference recurrence")
    if cfg.precond not in (None, "mg"):
        raise ValueError(
            "precision='tw' supports precond=None or 'mg' "
            f"(got {cfg.precond!r})"
        )
    if (n_devices is not None and n_devices > 1) or mesh is not None:
        # multi-chip fp64-quality path (round-4 VERDICT item 4): the
        # reference's quality gate runs on its DISTRIBUTED solver
        # (cg.cc:144-154); tw sweeps over the sharded MG-PCG inner
        from cgx.parallel.tw_sharded import sharded_tw_solve

        host = mat if isinstance(mat, DIAMatrix) else _to_host(mat)
        if not isinstance(host, DIAMatrix):
            try:
                host = DIAMatrix.from_coo(host)
            except Exception as e:
                raise ValueError(
                    "precision='tw' needs a banded operator"
                ) from e
        res = sharded_tw_solve(
            host, np.asarray(b, np.float64),
            mesh=mesh, n_devices=n_devices,
            rtol=cfg.tolerance,
            precond="mg" if cfg.precond == "mg" else "auto",
            inner_maxiter=int(cfg.maxiter) if cfg.maxiter else None,
        )
        return CGResult(
            x=res.x,
            iterations=jnp.asarray(res.outer_iterations, jnp.int32),
            residual_norm=res.residual_norm,
            converged=res.converged,
            rsold=res.residual_norm**2,
            history=jnp.zeros((0,), jnp.float64),
            breakdown=jnp.asarray(False),
        )
    from cgx.solver.refine import refine_pcg_sweeps_tw

    host = mat if isinstance(mat, DIAMatrix) else _to_host(mat)
    if not isinstance(host, DIAMatrix):
        raise ValueError("precision='tw' needs a banded operator")
    op64 = DiaOperator.from_host(host, dtype=jnp.float64)
    b64 = jnp.asarray(np.asarray(b, np.float64))
    pc = None
    if cfg.precond == "mg" or cfg.precond is None:
        from cgx.solver.multigrid import (
            infer_grid_ndim, mg_preconditioner,
        )

        try:
            nd = infer_grid_ndim(op64.shape[0], op64.offsets)
            pc = mg_preconditioner(
                op64, ndim=nd, smoother=cfg.mg_smoother,
                dtype=jnp.float32,
            ).apply
        except ValueError:
            if cfg.precond == "mg":
                raise
            pc = None  # non-grid operator: plain fp32 inner
    inner_maxiter = cfg.maxiter if cfg.maxiter else (
        80 if pc is not None else b64.shape[0]
    )
    res = refine_pcg_sweeps_tw(
        op64, b64, precond=pc, rtol=cfg.tolerance,
        inner_maxiter=int(inner_maxiter),
    )
    return CGResult(
        x=res.x,
        iterations=jnp.asarray(res.outer_iterations, jnp.int32),
        residual_norm=res.residual_norm,
        converged=res.converged,
        rsold=res.residual_norm**2,
        history=jnp.zeros((0,), jnp.float64),
        breakdown=jnp.asarray(False),
    )


def _maybe_ozaki(op, cfg: SolveConfig):
    """Route dense fp64 mat-vecs through the Ozaki bf16-slice scheme
    (cgx.ops.ozaki) per cfg.dense_fp64: fp64 matmuls are emulated at
    ~1.7% of peak on TPU, while the Ozaki route runs on the MXU with
    error below fp64 mat-vec roundoff."""
    from cgx.solver.operators import DenseOperator

    if not isinstance(op, DenseOperator) or op.dtype != jnp.float64:
        return op
    mode = getattr(cfg, "dense_fp64", "auto")
    if mode == "emulated":
        return op
    if mode == "auto" and jax.default_backend() == "cpu":
        return op  # fp64 is hardware on CPU; slicing would only slow it
    if mode not in ("auto", "ozaki"):
        raise ValueError(f"unknown dense_fp64 mode {mode!r}")
    from cgx.ops.ozaki import OzakiDenseOperator

    return OzakiDenseOperator.from_dense(op.a)


def _is_host(mat) -> bool:
    from cgx.mats.containers import COOMatrix, CSRMatrix, ELLMatrix

    return isinstance(mat, (DIAMatrix, DenseMatrix, COOMatrix, CSRMatrix, ELLMatrix))


def _to_host(op):
    if isinstance(op, DiaOperator):
        return DIAMatrix(
            op.shape, tuple(op.offsets), np.asarray(op.bands, np.float64)
        )
    raise TypeError(f"cannot shard operator type {type(op)}; pass a host container")


def _fetch_global(x) -> np.ndarray:
    """Host copy of a possibly-globally-sharded array: on a multi-host
    mesh a plain np.asarray raises ('spans non-addressable devices');
    gather to every process instead."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        return np.asarray(multihost_utils.process_allgather(x, tiled=True))
    return np.asarray(x)


def _solve_batched_rhs(mat, b, cfg, *, n_devices, mesh, method, x0=None):
    """Multi-RHS dispatch for multi_rhs='batched': independent
    per-column recurrences (exact reference semantics per column).
    b is (n, s) like the block path; single-device solves vmap
    (cgx.solver.batched), sharded solves run the (rows x rhs) 2-D-mesh
    loop (cgx.parallel.batched2d — method reference/pipelined/gvpipe,
    jacobi/neumann preconditioning)."""
    if cfg.precision not in ("fp64", "fp32"):
        raise ValueError(
            f"multi-RHS solves support fp64/fp32, not {cfg.precision!r}"
        )
    dtype = _DTYPES[cfg.precision]
    n = np.shape(b)[0]
    maxiter = cfg.maxiter if cfg.maxiter is not None else n
    x0_np = None
    if x0 is not None:
        x0_np = np.asarray(x0, np.float64)
        if x0_np.shape != tuple(np.shape(b)):
            raise ValueError(
                f"x0 must match b's shape {tuple(np.shape(b))}; "
                f"got {x0_np.shape}"
            )

    sharded = (n_devices is not None and n_devices > 1) or mesh is not None
    if sharded:
        from cgx.parallel.batched2d import (
            make_mesh2d,
            sharded_cg_solve_batched,
        )

        host = (
            mat if _is_host(mat) or isinstance(mat, np.ndarray)
            else _to_host(mat)
        )
        if not isinstance(host, DIAMatrix):
            raise ValueError(
                "multi_rhs='batched' sharded needs a banded (DIA) matrix"
            )
        if mesh is None:
            mesh = make_mesh2d(int(n_devices), 1)
        elif "rhs" not in mesh.axis_names:
            # a 1-D rows mesh (make_mesh) adapts to (rows x 1)
            if mesh.devices.ndim != 1:
                raise ValueError(
                    "multi_rhs='batched' needs a (rows x rhs) mesh or a "
                    f"1-D rows mesh; got axes {mesh.axis_names}"
                )
            mesh = make_mesh2d(
                mesh.devices.size, 1, devices=list(mesh.devices.ravel())
            )
        if cfg.history > 0:
            raise ValueError(
                "the sharded batched loop carries no history buffer; "
                "use multi_rhs='block' or history=0"
            )
        cast = np.float64 if cfg.precision == "fp64" else np.float32
        b_t = np.asarray(b).T.astype(cast)  # (s, n)
        if x0_np is not None:
            # shift identity (see _solve_block): zero-start kernels
            ax0 = np.stack(
                [host.mat_vec(x0_np[:, j])
                 for j in range(x0_np.shape[1])], axis=1,
            )
            b_t = b_t - ax0.T.astype(cast)
        x_t, iters, resn, conv, brk = sharded_cg_solve_batched(
            host, b_t, mesh=mesh, tol=cfg.tolerance, maxiter=maxiter,
            nearzero=cfg.nearzero, method=method, precond=cfg.precond,
            gv_replace_every=cfg.gv_replace_every,
        )
        x_out = jnp.transpose(x_t)
        if x0_np is not None:
            x_out = x_out + jnp.asarray(x0_np, x_out.dtype)
        return CGResult(
            x=x_out,
            iterations=iters,
            residual_norm=resn,
            converged=conv,
            rsold=resn * resn,
            history=jnp.zeros((0,), x_out.dtype),
            breakdown=brk,
        )

    if method != "reference":
        raise ValueError(
            "single-device multi_rhs='batched' runs the vmapped "
            f"reference recurrence; method={method!r} needs a mesh"
        )
    if cfg.precond is not None:
        raise ValueError(
            "single-device multi_rhs='batched' takes no preconditioner "
            "(use the sharded path or multi_rhs='block')"
        )
    from cgx.solver.batched import cg_solve_batched

    op = mat if hasattr(mat, "matvec") and not _is_host(mat) else as_operator(
        mat, dtype=dtype
    )
    b_t = jnp.asarray(np.asarray(b).T, dtype=dtype)  # (s, n)
    x0_t = (
        None if x0_np is None else jnp.asarray(x0_np.T, dtype=dtype)
    )
    res = cg_solve_batched(
        op, b_t, x0_t, tol=cfg.tolerance, maxiter=maxiter,
        nearzero=cfg.nearzero, history=cfg.history,
    )
    return res._replace(x=jnp.transpose(res.x))


def _solve_block(mat, b, cfg, *, n_devices, mesh, strategy, method,
                 x0=None):
    """Multi-RHS dispatch for a 2-D b: ONE shared breakdown-free
    block-CG Krylov space for all columns (cgx.solver.blockcg),
    config-preconditioned; sharded over the mesh when requested.

    ``x0`` (n, s) warm-starts via the exact shift identity: solve
    A D = B - A X0 from zero, return X0 + D — same residuals, same
    absolute stopping semantics, works for every block backend."""
    if method not in ("reference",):
        raise ValueError(
            "multi-RHS solves use the breakdown-free block recurrence; "
            f"method={method!r} applies to single-RHS solves only"
        )
    if cfg.precision not in ("fp64", "fp32"):
        raise ValueError(
            f"multi-RHS solves support fp64/fp32, not {cfg.precision!r}"
        )
    n = b.shape[0]
    maxiter = cfg.maxiter if cfg.maxiter is not None else n

    x0_np = None
    if x0 is not None:
        x0_np = np.asarray(x0, np.float64)
        if x0_np.shape != tuple(np.shape(b)):
            raise ValueError(
                f"x0 must match b's shape {tuple(np.shape(b))}; "
                f"got {x0_np.shape}"
            )

    def _shift(bb, host_mat):
        """B - A X0 on the host (O(nnz*s), once per solve)."""
        if x0_np is None:
            return bb, None
        if isinstance(host_mat, np.ndarray):
            ax0 = host_mat @ x0_np
        else:
            ax0 = np.stack(
                [host_mat.mat_vec(x0_np[:, j])
                 for j in range(x0_np.shape[1])], axis=1,
            )
        return bb - ax0.astype(bb.dtype), x0_np

    if (n_devices is not None and n_devices > 1) or mesh is not None:
        host = (
            mat if _is_host(mat) or isinstance(mat, np.ndarray)
            else _to_host(mat)
        )
        b_cast = np.asarray(b).astype(
            np.float64 if cfg.precision == "fp64" else np.float32
        )
        b_cast, shift = _shift(b_cast, host)
        if cfg.precond == "mg":
            from cgx.parallel.mg_sharded import sharded_mg_block_cg_solve
            from cgx.solver.multigrid import infer_grid_ndim

            if not isinstance(host, DIAMatrix):
                raise ValueError("precond='mg' needs a banded grid operator")
            res = sharded_mg_block_cg_solve(
                host,
                b_cast,
                mesh=mesh,
                n_devices=n_devices,
                tol=cfg.tolerance,
                maxiter=maxiter,
                smoother=cfg.mg_smoother,
                cycle_precision=cfg.mg_cycle_precision,
                ndim=infer_grid_ndim(host.shape[0], host.offsets),
            )
            return res if shift is None else res._replace(
                x=res.x + jnp.asarray(shift, res.x.dtype)
            )
        from cgx.parallel.sharded_cg import sharded_block_cg_solve

        res = sharded_block_cg_solve(
            host,
            b_cast,
            mesh=mesh,
            n_devices=n_devices,
            strategy=strategy,
            tol=cfg.tolerance,
            maxiter=maxiter,
            precond=cfg.precond,
            dense_fp64=getattr(cfg, "dense_fp64", "auto"),
        )
        return res if shift is None else res._replace(
            x=res.x + jnp.asarray(shift, res.x.dtype)
        )

    from cgx.solver.blockcg import block_cg_solve

    dtype = _DTYPES[cfg.precision]
    op = mat if hasattr(mat, "matvec") and not _is_host(mat) else as_operator(
        mat, dtype=dtype
    )
    if cfg.precision == "fp64":
        op = _maybe_ozaki(op, cfg)  # matvec handles (n, s) blocks
    pc = _build_precond(cfg, op, n)
    if x0_np is None:
        b_arr, shift = b, None  # no host round-trip of a device B
    else:
        host_for_shift = mat if _is_host(mat) or isinstance(
            mat, np.ndarray
        ) else None
        if host_for_shift is None:
            # device operator input: shift with the operator itself
            ax0 = np.asarray(op.matvec(jnp.asarray(x0_np, dtype=dtype)))
            b_arr = np.asarray(b) - ax0
            shift = x0_np
        else:
            b_arr, shift = _shift(
                np.asarray(b, np.float64), host_for_shift
            )
    res = block_cg_solve(
        op,
        jnp.asarray(b_arr, dtype=dtype),
        tol=cfg.tolerance,
        maxiter=maxiter,
        precond=pc,
    )
    return res if shift is None else res._replace(
        x=res.x + jnp.asarray(shift, res.x.dtype)
    )


def solve_sequence(
    mat,
    bs,
    config: Optional[SolveConfig] = None,
    *,
    k: int = 16,
    window: Optional[int] = None,
    warm_start: bool = False,
    n_devices: Optional[int] = None,
    mesh=None,
    strategy: str = "auto",
):
    """Solve a SEQUENCE ``A x_t = b_t`` (time stepping, outer
    optimisation loops) with spectral recycling: the first solve runs
    plain CG and harvests up to ``k`` converged Ritz vectors from its
    own iterates (zero extra mat-vecs — cgx.cg_solve_harvest /
    sharded_cg_solve_harvest), and every subsequent solve runs
    deflated CG on that basis. Measured on the N=400 quasi-Laplacian:
    97 plain iterations -> 52 for every later right-hand side.

    ``bs`` is an iterable of length-n vectors (or an (s, n) array).
    ``mat`` may also be a SEQUENCE of matrices (one per step) for the
    slowly-varying-operator scenario (time-dependent coefficients,
    Newton outer loops): the basis is harvested once from the first
    solve and REUSED — per step only the cheap basis data (A_t W, the
    (k, k) Gram inverse) is rebuilt at k mat-vecs, never the window.
    Deflation quality degrades gracefully as A_t drifts from A_0;
    re-harvest by starting a new sequence when it no longer pays.
    Returns a list of CGResult, in order. Single-device by default;
    pass ``n_devices``/``mesh`` for the row-sharded path (the basis
    is harvested from the sharded first solve and reused via
    sharded_deflated_cg_solve). Uses the config's tolerance/maxiter.
    The config's ``precond`` ('jacobi'/'neumann') composes with the
    deflation (deflated PCG) on every solve AFTER the first — the
    harvesting first solve runs plain CG (its iterates must be A's
    Krylov vectors, not M^-1 A's).

    ``warm_start=True`` seeds each solve with the previous step's
    solution — the right default when consecutive b_t (or A_t) vary
    smoothly; it composes with the deflation (the init projector
    re-centres any x0).

    If the harvest finds no converged Ritz pair (window too short,
    pathological spectrum), the sequence degrades gracefully to plain
    CG for the remaining systems.
    """
    cfg = config or SolveConfig()
    if cfg.precision == "fp64" and not jax.config.jax_enable_x64:
        raise ValueError(
            "precision='fp64' requires x64: call cgx.enable_x64() first "
            "(or pass precision='fp32')"
        )
    if cfg.method != "reference":
        raise ValueError(
            "solve_sequence runs the reference recurrence (plain "
            "harvesting first solve + deflated PCG remainder); "
            f"method={cfg.method!r} is not supported here — solve those "
            "systems individually via cgx.solve"
        )
    dtype = _DTYPES[cfg.precision]
    bs = [np.asarray(b) for b in bs]
    if not bs:
        return []
    mats = (
        list(mat)
        if isinstance(mat, (list, tuple))
        else [mat] * len(bs)
    )
    if len(mats) != len(bs):
        raise ValueError(
            f"got {len(mats)} matrices for {len(bs)} right-hand sides"
        )
    n = bs[0].shape[0]
    maxiter = cfg.maxiter if cfg.maxiter is not None else n
    sharded = (n_devices is not None and n_devices > 1) or mesh is not None

    results = []
    if sharded:
        from cgx.parallel.sharded_cg import (
            sharded_cg_solve,
            sharded_cg_solve_harvest,
            sharded_deflated_cg_solve,
        )

        def _host(m):
            return (
                m if _is_host(m) or isinstance(m, np.ndarray)
                else _to_host(m)
            )

        varying = isinstance(mat, (list, tuple))
        host0 = _host(mats[0])
        cast = np.float64 if cfg.precision == "fp64" else np.float32
        # strict=False: a failed Ritz extraction returns (res, None)
        # rather than discarding the completed first solve
        res0, w = sharded_cg_solve_harvest(
            host0, bs[0].astype(cast), k=k, window=window,
            mesh=mesh, n_devices=n_devices, strategy=strategy,
            tol=cfg.tolerance, maxiter=maxiter, nearzero=cfg.nearzero,
            strict=False,
        )
        results.append(res0)
        plain_solver = None
        if w is None and not varying:
            # operator-resident path: upload A and jit ONCE for the
            # whole sequence instead of per step
            from cgx.parallel.sharded_cg import make_sharded_solver

            plain_solver = make_sharded_solver(
                host0, bs[0].shape[0], dtype=cast, mesh=mesh,
                n_devices=n_devices, strategy=strategy,
                tol=cfg.tolerance, maxiter=maxiter,
                nearzero=cfg.nearzero,
            )
        for m, b in zip(mats[1:], bs[1:]):
            host_t = _host(m) if varying else host0
            x_prev = (
                _fetch_global(results[-1].x) if warm_start else None
            )
            if plain_solver is not None:
                results.append(
                    plain_solver.solve(b.astype(cast), x0=x_prev)
                )
            elif w is None:
                results.append(sharded_cg_solve(
                    host_t, b.astype(cast), mesh=mesh,
                    n_devices=n_devices, strategy=strategy,
                    tol=cfg.tolerance, maxiter=maxiter,
                    nearzero=cfg.nearzero, x0=x_prev,
                ))
            else:
                # sharded_deflated rebuilds A_t W / the Gram inverse
                # from w per call, so varying operators come free
                results.append(sharded_deflated_cg_solve(
                    host_t, b.astype(cast), w=w, mesh=mesh,
                    n_devices=n_devices, strategy=strategy,
                    tol=cfg.tolerance, maxiter=maxiter,
                    nearzero=cfg.nearzero, precond=cfg.precond,
                    x0=x_prev,
                ))
        return results

    from cgx.solver.cg import cg_solve
    from cgx.solver.deflated import (
        DeflationBasis,
        cg_solve_harvest,
        deflated_cg_solve,
    )

    def _op(m):
        return (
            m if hasattr(m, "matvec") and not _is_host(m)
            else as_operator(m, dtype=dtype)
        )

    varying = isinstance(mat, (list, tuple))
    op0 = _op(mats[0])
    res0, basis = cg_solve_harvest(
        op0, jnp.asarray(bs[0], dtype=dtype), k=k, window=window,
        tol=cfg.tolerance, maxiter=maxiter, nearzero=cfg.nearzero,
        strict=False,
    )
    results.append(res0)
    # built ONCE: a fresh closure per solve would miss the jit cache
    # (static precond arg) and recompile the deflated loop per RHS
    pc = None if basis is None else _build_precond(cfg, op0, n)
    for m, b in zip(mats[1:], bs[1:]):
        bj = jnp.asarray(b, dtype=dtype)
        op_t = _op(m) if varying else op0
        x_prev = results[-1].x if warm_start else None
        if basis is None:
            results.append(cg_solve(
                op_t, bj, x_prev, tol=cfg.tolerance, maxiter=maxiter,
                nearzero=cfg.nearzero,
            ))
        else:
            # varying A: reuse the harvested W, rebuild the cheap
            # per-operator basis data (A_t W + (k, k) inverse)
            basis_t = (
                DeflationBasis(op_t, basis.w) if varying else basis
            )
            results.append(deflated_cg_solve(
                op_t, bj, basis_t, x_prev, tol=cfg.tolerance,
                maxiter=maxiter, nearzero=cfg.nearzero, precond=pc,
            ))
    return results
