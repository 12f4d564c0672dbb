"""Chronopoulos-Gear (communication-reduced) CG tests."""

import jax.numpy as jnp
import numpy as np
import pytest

from cgx import DiaOperator, cg_solve, lap2d_reference, source_term
from cgx.parallel.mesh import make_mesh
from cgx.parallel.sharded_cg import sharded_cg_solve
from cgx.solver.pipelined import pipelined_cg_solve


def test_pipelined_matches_classic():
    n = 512
    dia = lap2d_reference(n)
    op = DiaOperator.from_host(dia)
    b = jnp.asarray(source_term(n))
    classic = cg_solve(op, b, tol=1e-6)
    pipe = pipelined_cg_solve(op, b, tol=1e-6)
    assert bool(pipe.converged)
    # same Krylov iterates in exact arithmetic: counts within 1
    assert abs(int(pipe.iterations) - int(classic.iterations)) <= 1
    np.testing.assert_allclose(
        np.asarray(pipe.x), np.asarray(classic.x), rtol=1e-7, atol=1e-7
    )


def test_pipelined_full_tolerance():
    n = 1024
    dia = lap2d_reference(n)
    b = jnp.asarray(source_term(n))
    pipe = pipelined_cg_solve(DiaOperator.from_host(dia), b)
    assert bool(pipe.converged)
    x = np.asarray(pipe.x)
    A = dia.to_dense()
    rel = np.linalg.norm(A @ x - np.asarray(b)) / np.linalg.norm(np.asarray(b))
    assert rel < 1e-11


def test_pipelined_history():
    n = 256
    dia = lap2d_reference(n)
    b = jnp.asarray(source_term(n))
    pipe = pipelined_cg_solve(DiaOperator.from_host(dia), b, tol=1e-6, history=64)
    classic = cg_solve(DiaOperator.from_host(dia), b, tol=1e-6, history=64)
    h_p = np.asarray(pipe.history)
    h_c = np.asarray(classic.history)
    # pipelined records ||r_k|| at iteration start; classic records
    # ||r_{k+1}|| after the update -> shifted by one
    np.testing.assert_allclose(h_p[1:32], h_c[:31], rtol=1e-9)


@pytest.mark.parametrize("strategy", ["halo", "allgather"])
def test_pipelined_sharded(strategy):
    n = 512
    dia = lap2d_reference(n)
    b = source_term(n)
    mesh = make_mesh(8)
    ref = sharded_cg_solve(dia, b, mesh=mesh, tol=1e-6, strategy=strategy)
    pipe = sharded_cg_solve(
        dia, b, mesh=mesh, tol=1e-6, strategy=strategy, method="pipelined"
    )
    assert bool(pipe.converged)
    assert abs(int(pipe.iterations) - int(ref.iterations)) <= 1
    np.testing.assert_allclose(
        np.asarray(pipe.x), np.asarray(ref.x), rtol=1e-7, atol=1e-7
    )


def test_pipelined_breakdown():
    n = 32
    a = jnp.asarray(np.diag(np.concatenate([np.ones(n // 2), -np.ones(n // 2)])))
    res = pipelined_cg_solve(a, jnp.ones(n, dtype=jnp.float64), maxiter=8)
    assert bool(res.breakdown)
