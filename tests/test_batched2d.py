"""2-D mesh (rows x rhs) batched CG tests on 8 virtual devices."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cgx import DiaOperator, cg_solve, lap2d_reference, source_term
from cgx.parallel.batched2d import make_mesh2d, sharded_cg_solve_batched
from cgx.solver.batched import cg_solve_batched


@pytest.fixture(scope="module")
def mesh42():
    return make_mesh2d(4, 2)


def test_matches_single_device_batched(mesh42):
    n, nrhs = 512, 6
    dia = lap2d_reference(n)
    rs = np.random.default_rng(0)
    B = rs.standard_normal((nrhs, n))
    X, k, res, conv, brk = sharded_cg_solve_batched(dia, B, mesh=mesh42, tol=1e-8)
    assert bool(np.asarray(conv).all())
    ref = cg_solve_batched(DiaOperator.from_host(dia), jnp.asarray(B), tol=1e-8)
    np.testing.assert_allclose(
        np.asarray(X), np.asarray(ref.x), rtol=1e-7, atol=1e-7
    )
    # per-rhs iteration counts agree with the vmapped solver
    np.testing.assert_array_equal(np.asarray(k), np.asarray(ref.iterations))


def test_uneven_rhs_and_rows(mesh42):
    """nrhs not divisible by the rhs axis, n not divisible by rows."""
    n, nrhs = 509, 3
    dia = lap2d_reference(n)
    b0 = source_term(n)
    B = np.stack([b0, 2.0 * b0, np.zeros_like(b0)])
    X, k, res, conv, brk = sharded_cg_solve_batched(dia, B, mesh=mesh42, tol=1e-6)
    assert conv.shape == (3,)
    assert bool(np.asarray(conv).all())
    # zero RHS converges instantly with x = 0
    assert int(k[2]) == 0
    np.testing.assert_array_equal(np.asarray(X[2]), 0.0)
    A = dia.to_dense()
    for i in range(2):
        resid = np.linalg.norm(A @ np.asarray(X[i]) - B[i])
        assert resid < 1e-5


def test_breakdown_flag(mesh42):
    """Non-SPD matrix: per-column breakdown must be surfaced."""
    from cgx.mats.containers import DIAMatrix

    n = 512
    bands = np.zeros((1, n))
    bands[0, : n // 2] = 1.0
    bands[0, n // 2 :] = -1.0  # indefinite diagonal matrix
    mat = DIAMatrix((n, n), (0,), bands)
    B = np.ones((2, n))
    X, k, res, conv, brk = sharded_cg_solve_batched(
        mat, B, mesh=mesh42, maxiter=4
    )
    assert bool(np.asarray(brk).all())


def test_mixed_convergence_budget(mesh42):
    """One easy and one hopeless column (maxiter cap): the loop must
    terminate and report per-column status."""
    n = 512
    dia = lap2d_reference(n)
    b0 = source_term(n)
    B = np.stack([b0, b0])
    X, k, res, conv, brk = sharded_cg_solve_batched(
        dia, B, mesh=mesh42, tol=1e-12 * np.linalg.norm(b0), maxiter=30
    )
    assert not bool(np.asarray(conv).any())
    np.testing.assert_array_equal(np.asarray(k), [30, 30])


def test_wide_band_falls_back_to_allgather(mesh42):
    """Stencil bandwidth > row-shard size must auto-fallback (the 1-D
    path's behaviour), not crash with advice about a nonexistent flag."""
    dia = lap2d_reference(16)  # offsets +-5, n_loc = 16/4 = 4 < 5
    b0 = source_term(16)
    B = np.stack([b0, -b0])
    X, k, res, conv, brk = sharded_cg_solve_batched(
        dia, B, mesh=mesh42, tol=1e-6
    )
    assert bool(np.asarray(conv).all())
    A = dia.to_dense()
    for i in range(2):
        assert np.linalg.norm(A @ np.asarray(X[i]) - B[i]) < 1e-5


def test_batched2d_neumann_precond(mesh42):
    """Distributed Neumann on the 2-D mesh: converges to the same
    solutions with a clear per-column iteration reduction."""
    n, nrhs = 512, 4
    dia = lap2d_reference(n)
    rs = np.random.default_rng(1)
    B = rs.standard_normal((nrhs, n))
    Xp, kp, _, convp, brkp = sharded_cg_solve_batched(
        dia, B, mesh=mesh42, tol=1e-8, precond="neumann"
    )
    X0, k0, _, conv0, _ = sharded_cg_solve_batched(dia, B, mesh=mesh42, tol=1e-8)
    assert bool(np.asarray(convp).all()) and not bool(np.asarray(brkp).any())
    assert (np.asarray(kp) < 0.7 * np.asarray(k0)).all()
    np.testing.assert_allclose(np.asarray(Xp), np.asarray(X0), rtol=1e-6, atol=1e-6)


def test_batched2d_jacobi_precond(mesh42):
    n, nrhs = 256, 3
    dia = lap2d_reference(n)
    B = np.stack([source_term(n)] * nrhs)
    X, k, _, conv, _ = sharded_cg_solve_batched(
        dia, B, mesh=mesh42, tol=1e-8, precond="jacobi"
    )
    assert bool(np.asarray(conv).all())
    a = dia.to_dense()
    for j in range(nrhs):
        rel = np.linalg.norm(a @ np.asarray(X)[j] - B[j]) / np.linalg.norm(B[j])
        assert rel < 1e-7


@pytest.mark.parametrize("precond", [None, "neumann"])
def test_batched2d_pipelined(mesh42, precond):
    """Pipelined batched: one fused psum/iter; same solutions and
    per-column counts within one iteration of the reference method."""
    n, nrhs = 512, 4
    dia = lap2d_reference(n)
    rs = np.random.default_rng(2)
    B = rs.standard_normal((nrhs, n))
    Xp, kp, _, convp, brkp = sharded_cg_solve_batched(
        dia, B, mesh=mesh42, tol=1e-8, method="pipelined", precond=precond
    )
    Xr, kr, _, convr, _ = sharded_cg_solve_batched(
        dia, B, mesh=mesh42, tol=1e-8, method="reference", precond=precond
    )
    assert bool(np.asarray(convp).all()) and not bool(np.asarray(brkp).any())
    assert (np.abs(np.asarray(kp) - np.asarray(kr)) <= 1).all()
    np.testing.assert_allclose(np.asarray(Xp), np.asarray(Xr), rtol=1e-6, atol=1e-6)


def test_batched2d_pipelined_mixed_budget(mesh42):
    """Frozen-column semantics survive the pipelined recurrence: a
    zero column pre-converges at k=0 while others run."""
    n = 256
    dia = lap2d_reference(n)
    b0 = source_term(n)
    B = np.stack([b0, np.zeros_like(b0)])
    X, k, _, conv, _ = sharded_cg_solve_batched(
        dia, B, mesh=mesh42, tol=1e-8, method="pipelined"
    )
    assert bool(np.asarray(conv).all())
    assert int(np.asarray(k)[1]) == 0
    assert np.allclose(np.asarray(X)[1], 0.0)


@pytest.mark.parametrize("precond", [None, "neumann"])
def test_batched2d_gvpipe(mesh42, precond):
    """Ghysels-Vanroose batched: same fused-psum budget as pipelined
    but the mat-vec never waits on the reduction; solutions and
    per-column counts match the reference method within one."""
    n, nrhs = 512, 4
    dia = lap2d_reference(n)
    rs = np.random.default_rng(2)
    B = rs.standard_normal((nrhs, n))
    Xg, kg, _, convg, brkg = sharded_cg_solve_batched(
        dia, B, mesh=mesh42, tol=1e-8, method="gvpipe", precond=precond
    )
    Xr, kr, _, convr, _ = sharded_cg_solve_batched(
        dia, B, mesh=mesh42, tol=1e-8, method="reference", precond=precond
    )
    assert bool(np.asarray(convg).all()) and not bool(np.asarray(brkg).any())
    assert (np.abs(np.asarray(kg) - np.asarray(kr)) <= 2).all()
    np.testing.assert_allclose(
        np.asarray(Xg), np.asarray(Xr), rtol=1e-6, atol=1e-6
    )


def test_batched2d_gvpipe_reference_tolerance(mesh42):
    """The guarded per-column replacement holds the batched GV
    recurrence to the reference's absolute tol 1e-10 (without it the
    recursion floors 2-3 digits short — cgx/solver/gvpipe.py)."""
    n = 1024
    dia = lap2d_reference(n)
    B = np.stack([np.asarray(source_term(n))])
    X, k, _, conv, brk = sharded_cg_solve_batched(
        dia, B, mesh=mesh42, tol=1e-10, method="gvpipe"
    )
    assert bool(np.asarray(conv).all()) and not bool(np.asarray(brk).any())
    a = dia.to_dense()
    rel = np.linalg.norm(a @ np.asarray(X)[0] - B[0]) / np.linalg.norm(B[0])
    assert rel < 1e-12


def test_batched2d_gvpipe_zero_column(mesh42):
    """Frozen-column semantics under GV: a zero column pre-converges
    at k=0 while others run to tolerance."""
    n = 256
    dia = lap2d_reference(n)
    b0 = source_term(n)
    B = np.stack([b0, np.zeros_like(b0)])
    X, k, _, conv, _ = sharded_cg_solve_batched(
        dia, B, mesh=mesh42, tol=1e-8, method="gvpipe"
    )
    assert bool(np.asarray(conv).all())
    assert int(np.asarray(k)[1]) == 0
    assert np.allclose(np.asarray(X)[1], 0.0)
