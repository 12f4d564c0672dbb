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
