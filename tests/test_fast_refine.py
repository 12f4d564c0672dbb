"""Fused Pallas CG loop (interpret mode) and mixed-precision
iterative refinement tests."""

import jax.numpy as jnp
import numpy as np

from cgx import DiaOperator, cg_solve, lap2d_reference, source_term
from cgx.mats.generators import lap2d_fd
from cgx.solver.fast import dia_cg_solve_pallas
from cgx.solver.refine import iterative_refinement


def test_fast_pallas_loop_matches_core():
    n = 512
    dia = lap2d_reference(n)
    op64 = DiaOperator.from_host(dia)
    op32 = DiaOperator.from_host(dia, dtype=jnp.float32)
    b64 = jnp.asarray(source_term(n))
    b32 = b64.astype(jnp.float32)
    tol = 1e-3 * float(jnp.linalg.norm(b64))  # fp32-comfortable
    core = cg_solve(op32, b32, tol=tol)
    fast = dia_cg_solve_pallas(op32, b32, tol=tol, block=256, interpret=True)
    assert bool(fast.converged)
    assert abs(int(fast.iterations) - int(core.iterations)) <= 2
    # solutions agree at fp32 level
    np.testing.assert_allclose(
        np.asarray(fast.x, np.float64),
        np.asarray(core.x, np.float64),
        rtol=2e-3, atol=2e-3 * float(jnp.max(jnp.abs(core.x))),
    )


def test_refinement_reaches_fp64_quality():
    dia = lap2d_fd(24)  # N=576
    n = dia.shape[0]
    b = jnp.asarray(source_term(n))
    op = DiaOperator.from_host(dia)
    res = iterative_refinement(op, b, tol=1e-10, use_pallas=False)
    assert bool(res.converged)
    x = np.asarray(res.x)
    A = dia.to_dense()
    rel = np.linalg.norm(A @ x - np.asarray(b)) / np.linalg.norm(np.asarray(b))
    assert rel < 1e-12
    assert int(res.outer_iterations) <= 5


def test_refinement_pallas_inner_interpret():
    dia = lap2d_fd(16)  # N=256
    n = dia.shape[0]
    b = jnp.asarray(source_term(n))
    op = DiaOperator.from_host(dia)
    res = iterative_refinement(
        op, b, tol=1e-10, use_pallas=True, block=256, interpret=True
    )
    assert bool(res.converged)
    x = np.asarray(res.x)
    A = dia.to_dense()
    rel = np.linalg.norm(A @ x - np.asarray(b)) / np.linalg.norm(np.asarray(b))
    assert rel < 1e-11


def test_breakdown_detection():
    """Indefinite matrix: CG must flag breakdown (<p,Ap> <= 0) rather
    than silently return garbage (the reference only clamps alpha)."""
    n = 32
    a = np.diag(np.concatenate([np.ones(n // 2), -np.ones(n // 2)]))
    res = cg_solve(jnp.asarray(a), jnp.ones(n, dtype=jnp.float64), maxiter=8)
    assert bool(res.breakdown)
    spd = lap2d_reference(64)
    ok = cg_solve(DiaOperator.from_host(spd), jnp.asarray(source_term(64)))
    assert not bool(ok.breakdown)


def test_dense_refinement_mxu_inner():
    """Dense fp32 inner + fp64 refinement (the dense-path answer to
    fp64 being emulated on TPU): the inner operator must actually be
    a low-precision DenseOperator (so the mat-vec runs at fp32 on the
    MXU), and the refined answer must reach reference quality."""
    import numpy as np

    from cgx.mats.generators import lap2d_fd, source_term
    from cgx.solver.operators import DenseOperator
    from cgx.solver.refine import iterative_refinement

    g = 32
    dia = lap2d_fd(g)
    op = DenseOperator(jnp.asarray(dia.to_dense()))
    assert op.dtype == jnp.float64
    b = jnp.asarray(source_term(g * g))
    res = iterative_refinement(op, b, inner_tol_factor=1e-6)
    assert bool(res.converged)
    x = np.asarray(res.x)
    rel = np.linalg.norm(dia.mat_vec(x) - np.asarray(b)) / np.linalg.norm(
        np.asarray(b)
    )
    assert rel < 1e-11, rel


def test_pallas_dense_operator_solves():
    """PallasDenseOperator (matrix as pytree leaf, tiles static): the
    regression for the constant-embedding bug — and it must solve."""
    import numpy as np

    from cgx.mats.generators import lap2d_fd, source_term
    from cgx.solver.cg import cg_solve
    from cgx.solver.operators import PallasDenseOperator

    g = 16
    dia = lap2d_fd(g)
    op = PallasDenseOperator(
        jnp.asarray(dia.to_dense(), jnp.float32), 64, 128
    )
    b = jnp.asarray(source_term(g * g), jnp.float32)
    res = cg_solve(op, b, tol=1e-4, maxiter=g * g)
    x = np.asarray(res.x, np.float64)
    rel = np.linalg.norm(dia.mat_vec(x) - np.asarray(b, np.float64)) / (
        np.linalg.norm(np.asarray(b, np.float64))
    )
    assert rel < 1e-3, rel
    # the matrix must be an ARGUMENT of the traced program, not a
    # constant (the 413-payload bug): check the jaxpr holds no
    # matrix-sized literals
    import jax

    jaxpr = jax.make_jaxpr(lambda o, bb: o.matvec(bb))(op, b)
    big_consts = [
        c for c in jaxpr.consts if getattr(c, "size", 0) >= g * g * g * g
    ]
    assert not big_consts


def test_refine_pcg_sweeps_mg_inner():
    """Single-dispatch fp64 refinement with an fp32 MG-PCG inner reaches
    the true-residual quality gate (the large-N flagship path, scaled
    down to a CI grid)."""
    from cgx.solver.multigrid import mg_preconditioner
    from cgx.solver.refine import refine_pcg_sweeps

    g = 32
    n = g * g
    dia = lap2d_fd(g)
    op64 = DiaOperator.from_host(dia)
    b64 = jnp.asarray(source_term(n))
    mg32 = mg_preconditioner(dia, dtype=jnp.float32)
    res = refine_pcg_sweeps(
        op64, b64, precond=mg32.apply, sweeps=8, inner_tol=1e-6,
        inner_maxiter=64,
    )
    assert bool(res.converged)
    x = np.asarray(res.x, np.float64)
    b = np.asarray(b64, np.float64)
    rel = np.linalg.norm(dia.mat_vec(x) - b) / np.linalg.norm(b)
    assert rel < 1e-10, rel
    # with MG the inner counts are small and grid-independent
    assert int(res.inner_iterations[0]) < 8 * 40
    assert res.outer_iterations <= 5
