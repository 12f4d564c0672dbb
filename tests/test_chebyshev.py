"""Chebyshev iteration tests (the zero-reduction solver)."""

import jax.numpy as jnp
import numpy as np
import pytest

from cgx import DiaOperator, cg_solve, lap2d_reference, source_term
from cgx.solver.chebyshev import (
    chebyshev_solve,
    gershgorin_bounds,
    spectral_bounds,
)


def test_gershgorin_bounds():
    dia = lap2d_reference(256)
    lo, hi = gershgorin_bounds(dia)
    w = np.linalg.eigvalsh(dia.to_dense())
    assert lo <= w.min() + 1e-12
    assert hi >= w.max() - 1e-12
    # dense input path agrees
    lo2, hi2 = gershgorin_bounds(dia.to_dense())
    assert (lo2, hi2) == pytest.approx((lo, hi))


def test_spectral_bounds_bracket():
    n = 256
    dia = lap2d_reference(n)
    op = DiaOperator.from_host(dia)
    lmin, lmax = spectral_bounds(op, n)
    w = np.linalg.eigvalsh(dia.to_dense())
    assert lmax >= w.max() * 0.999  # safeguarded upper bound
    assert 0 < lmin <= w.min() + 1e-9 or lmin <= w.min() * 1.5


def test_chebyshev_converges_with_exact_bounds():
    n = 256
    dia = lap2d_reference(n)
    op = DiaOperator.from_host(dia)
    b = jnp.asarray(source_term(n))
    w = np.linalg.eigvalsh(dia.to_dense())
    tol = 1e-8 * float(np.linalg.norm(np.asarray(b)))
    res = chebyshev_solve(
        op, b, bounds=(float(w.min()), float(w.max())), tol=tol
    )
    assert bool(res.converged)
    x = np.asarray(res.x)
    assert np.linalg.norm(dia.to_dense() @ x - np.asarray(b)) < tol * 1.01
    # CG wins on iterations, Chebyshev on communication
    cg = cg_solve(op, b, tol=tol)
    assert int(res.iterations) >= int(cg.iterations)


def test_chebyshev_auto_bounds():
    n = 256
    dia = lap2d_reference(n)
    op = DiaOperator.from_host(dia)
    b = jnp.asarray(source_term(n))
    tol = 1e-6 * float(np.linalg.norm(np.asarray(b)))
    res = chebyshev_solve(op, b, tol=tol)
    assert bool(res.converged)


def test_chebyshev_rejects_bad_bounds():
    n = 64
    op = DiaOperator.from_host(lap2d_reference(n))
    b = jnp.ones(n, dtype=jnp.float64)
    with pytest.raises(ValueError):
        chebyshev_solve(op, b, bounds=(0.0, 8.0))
    with pytest.raises(ValueError):
        chebyshev_solve(op, b, bounds=(8.0, 2.0))


def test_chebyshev_zero_rhs():
    n = 64
    op = DiaOperator.from_host(lap2d_reference(n))
    res = chebyshev_solve(op, jnp.zeros(n, dtype=jnp.float64), bounds=(0.1, 8.0))
    assert bool(res.converged)
    assert int(res.iterations) == 0


def test_chebyshev_preconditioner():
    """Degree-d Chebyshev polynomial preconditioner: CG-safe (SPD) and
    converging; iteration reduction is bounds-sensitive (see docstring)
    so only correctness is asserted here."""
    from cgx.solver.precond import chebyshev_banded

    n = 400
    dia = lap2d_reference(n)
    op = DiaOperator.from_host(dia)
    b = jnp.asarray(source_term(n))
    w = np.linalg.eigvalsh(dia.to_dense())
    pc = chebyshev_banded(
        op.bands, op.offsets, float(w.min()), float(w.max()), degree=3
    )
    res = cg_solve(op, b, tol=1e-8, precond=pc)
    assert bool(res.converged)
    assert not bool(res.breakdown)
    x = np.asarray(res.x)
    rel = np.linalg.norm(dia.to_dense() @ x - np.asarray(b)) / np.linalg.norm(
        np.asarray(b)
    )
    assert rel < 1e-10


def test_lanczos_bounds_tight():
    """Lanczos resolves both spectrum ends; the returned interval
    brackets with the documented safety margins."""
    from cgx.solver.chebyshev import host_spectral_bounds, lanczos_bounds

    n = 256
    dia = lap2d_reference(n)
    w = np.linalg.eigvalsh(dia.to_dense())
    lmin, lmax = lanczos_bounds(dia.mat_vec, n)
    assert 0 < lmin <= w.min() * 1.0001  # never overestimates lambda_min
    assert lmax >= w.max() * 0.999
    assert lmin >= 0.4 * w.min()  # and it is genuinely tight
    hlo, hhi = host_spectral_bounds(dia)
    assert 0 < hlo <= w.min() * 1.0001
    assert w.max() * 0.999 <= hhi <= 8.0 + 1e-12  # Gershgorin-clamped
