"""Preconditioned and batched multi-RHS CG tests."""

import jax.numpy as jnp
import numpy as np
import pytest

from cgx import DiaOperator, cg_solve, lap2d_reference, source_term
from cgx.solver.batched import cg_solve_batched
from cgx.solver.precond import jacobi, neumann_banded


def scaled_problem(n, seed=3):
    """Variable-diagonal SPD problem where Jacobi actually helps:
    D^(1/2) A D^(1/2) with a wide random scaling D."""
    rs = np.random.default_rng(seed)
    a = lap2d_reference(n).to_dense()
    d = np.exp(rs.uniform(-3, 3, n))
    a_scaled = (a * d[None, :]) * d[:, None]
    b = source_term(n)
    return a_scaled, b


def test_jacobi_reduces_iterations():
    n = 256
    a, b = scaled_problem(n)
    tol = 1e-6 * np.linalg.norm(b)
    plain = cg_solve(jnp.asarray(a), jnp.asarray(b), tol=tol, maxiter=4 * n)
    pc = cg_solve(
        jnp.asarray(a),
        jnp.asarray(b),
        tol=tol,
        maxiter=4 * n,
        precond=jacobi(jnp.asarray(np.diagonal(a))),
    )
    assert bool(pc.converged)
    assert int(pc.iterations) < int(plain.iterations)
    # solution quality
    x = np.asarray(pc.x)
    assert np.linalg.norm(a @ x - b) / np.linalg.norm(b) < 1e-5


def test_jacobi_identity_matches_plain():
    """With a constant diagonal, Jacobi is a uniform scaling: same x."""
    n = 128
    dia = lap2d_reference(n)
    b = jnp.asarray(source_term(n))
    op = DiaOperator.from_host(dia)
    plain = cg_solve(op, b, tol=1e-8)
    pc = cg_solve(op, b, tol=1e-8, precond=jacobi(op.diagonal()))
    np.testing.assert_allclose(
        np.asarray(pc.x), np.asarray(plain.x), rtol=1e-6, atol=1e-6
    )


def test_neumann_preconditioner():
    n = 256
    dia = lap2d_reference(n)
    b = jnp.asarray(source_term(n))
    op = DiaOperator.from_host(dia)
    pc_apply = neumann_banded(op.bands, op.offsets, omega=0.9, sweeps=3)
    plain = cg_solve(op, b, tol=1e-8, maxiter=4 * n)
    pc = cg_solve(op, b, tol=1e-8, maxiter=4 * n, precond=pc_apply)
    assert bool(pc.converged)
    assert int(pc.iterations) < int(plain.iterations)
    x = np.asarray(pc.x)
    a = dia.to_dense()
    assert np.linalg.norm(a @ x - np.asarray(b)) / np.linalg.norm(np.asarray(b)) < 1e-8


def test_batched_multi_rhs():
    n = 128
    dia = lap2d_reference(n)
    op = DiaOperator.from_host(dia)
    a = dia.to_dense()
    rs = np.random.default_rng(0)
    B = rs.standard_normal((4, n))
    res = cg_solve_batched(op, jnp.asarray(B), tol=1e-8)
    assert res.x.shape == (4, n)
    assert bool(np.asarray(res.converged).all())
    X = np.asarray(res.x)
    for i in range(4):
        np.testing.assert_allclose(a @ X[i], B[i], atol=1e-7)
    # per-RHS iteration counts are independent
    ks = np.asarray(res.iterations)
    assert ks.shape == (4,)


def test_batched_mixed_convergence():
    """RHS with very different scales: each row must stop at its own k."""
    n = 128
    dia = lap2d_reference(n)
    op = DiaOperator.from_host(dia)
    b1 = source_term(n)
    B = np.stack([b1, 1e-8 * b1])
    res = cg_solve_batched(op, jnp.asarray(B), tol=1e-9)
    ks = np.asarray(res.iterations)
    assert bool(np.asarray(res.converged).all())
    assert ks[1] < ks[0]  # tiny RHS converges (absolute tol) much sooner


def test_batched_3d_multi_rhs():
    """BASELINE.json config 5: 3-D 7-point Laplacian + batched multi-RHS
    (vmapped Krylov loop)."""
    from cgx import lap3d_fd

    dia = lap3d_fd(8)  # N=512, 7 diagonals
    op = DiaOperator.from_host(dia)
    rs = np.random.default_rng(7)
    B = rs.standard_normal((3, 512))
    res = cg_solve_batched(op, jnp.asarray(B), tol=1e-9)
    assert bool(np.asarray(res.converged).all())
    a = dia.to_dense()
    for i in range(3):
        np.testing.assert_allclose(a @ np.asarray(res.x[i]), B[i], atol=1e-8)


def test_preconditioned_pre_convergence_uses_true_residual():
    """Regression (review round 2): with a preconditioner, the pre-loop
    convergence check must watch ||r||, not sqrt(<r,z>) — a tol between
    the two must NOT be declared converged at k=0."""
    from cgx.mats.generators import lap2d_fd
    from cgx.solver.precond import neumann_banded

    dia = lap2d_fd(10)
    op = DiaOperator.from_host(dia)
    b = jnp.ones(100, dtype=jnp.float64)  # ||b|| = 10
    pc = neumann_banded(op.bands, op.offsets, sweeps=2)
    # sqrt(<b, M^-1 b>) ~ 6.9 < 8.45 < ||b|| = 10
    res = cg_solve(op, b, tol=8.45, precond=pc)
    assert int(res.iterations) > 0
    x = np.asarray(res.x)
    assert np.linalg.norm(dia.to_dense() @ x - np.asarray(b)) < 8.45
