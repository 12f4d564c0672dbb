"""Geometric multigrid preconditioner tests."""

import jax.numpy as jnp
import numpy as np
import pytest

from cgx import DiaOperator, cg_solve
from cgx.mats.generators import lap2d_fd, source_term
from cgx.solver.multigrid import MGPreconditioner, mg_preconditioner


def test_mg_slashes_iterations_and_scales():
    """Iteration counts must be an order of magnitude below plain CG
    and grow sub-linearly with the grid (plain CG grows ~linearly)."""
    ks = {}
    for g in (32, 64, 128):
        dia = lap2d_fd(g)
        op = DiaOperator.from_host(dia)
        b = jnp.asarray(source_term(dia.shape[0]))
        mg = mg_preconditioner(dia, min_coarse_grid=8)
        plain = cg_solve(op, b, tol=1e-10)
        pcg = cg_solve(op, b, tol=1e-10, precond=mg.apply)
        assert bool(pcg.converged)
        assert int(pcg.iterations) < 0.25 * int(plain.iterations), g
        ks[g] = int(pcg.iterations)
        x = np.asarray(pcg.x)
        rel = np.linalg.norm(dia.mat_vec(x) - np.asarray(b)) / np.linalg.norm(
            np.asarray(b)
        )
        assert rel < 1e-11
    # near-grid-independence: doubling g twice must not double k
    assert ks[128] < 2 * ks[32]


def test_mg_spd():
    """The V-cycle must be a symmetric positive definite operator (the
    whole point of the Galerkin + scalar-Richardson + scaled-transpose
    construction)."""
    g = 16
    dia = lap2d_fd(g)
    mg = mg_preconditioner(dia, min_coarse_grid=8)
    n = g * g
    m = np.zeros((n, n))
    eye = np.eye(n)
    for i in range(n):
        m[:, i] = np.asarray(mg.apply(jnp.asarray(eye[:, i])))
    asym = np.abs(m - m.T).max() / np.abs(m).max()
    assert asym < 1e-12
    w = np.linalg.eigvalsh((m + m.T) / 2)
    assert w.min() > 0


def test_mg_rejects_non_grid():
    op = DiaOperator.from_host(lap2d_fd(8))
    with pytest.raises(ValueError):
        MGPreconditioner(op, 9)  # 81 != 64


def test_mg_inferred_grid():
    dia = lap2d_fd(32)
    mg = mg_preconditioner(dia)
    assert mg.g == 32
    assert mg.grids[0] == 32
