"""Sharded multigrid-preconditioned CG tests (8 virtual devices)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cgx.mats.generators import lap2d_fd, source_term
from cgx.parallel.mesh import make_mesh
from cgx.parallel.mg_sharded import sharded_mg_cg_solve
from cgx.parallel.sharded_cg import sharded_cg_solve


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(8)


def test_sharded_mg_matches_plain_and_slashes_iterations(mesh):
    g = 128
    dia = lap2d_fd(g)
    b = source_term(g * g)
    plain = sharded_cg_solve(dia, b, mesh=mesh, tol=1e-10)
    mg = sharded_mg_cg_solve(dia, b, mesh=mesh, tol=1e-10)
    assert bool(mg.converged)
    assert int(mg.iterations) < 0.1 * int(plain.iterations)
    np.testing.assert_allclose(
        np.asarray(mg.x), np.asarray(plain.x), rtol=1e-6, atol=1e-6
    )


def test_sharded_mg_grid_independence(mesh):
    ks = {}
    for g in (64, 128, 256):
        dia = lap2d_fd(g)
        b = source_term(g * g)
        res = sharded_mg_cg_solve(dia, b, mesh=mesh, tol=1e-10)
        assert bool(res.converged), g
        ks[g] = int(res.iterations)
    assert ks[256] < 2 * ks[64], ks


def test_sharded_mg_rejects_bad_geometry(mesh):
    dia = lap2d_fd(66)  # 66 not divisible by 8
    b = source_term(66 * 66)
    with pytest.raises(ValueError, match="divide"):
        sharded_mg_cg_solve(dia, b, mesh=mesh)


def test_sharded_mg_few_devices():
    g = 64
    dia = lap2d_fd(g)
    b = source_term(g * g)
    res = sharded_mg_cg_solve(dia, b, mesh=make_mesh(2), tol=1e-8)
    assert bool(res.converged)
    x = np.asarray(res.x)
    rel = np.linalg.norm(dia.mat_vec(x) - b) / np.linalg.norm(b)
    assert rel < 1e-9
