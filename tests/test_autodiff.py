"""Differentiable-solve tests: custom VJP vs dense linalg autodiff and
finite differences."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cgx import DenseOperator, DiaOperator, lap2d_reference, source_term
from cgx.solver.autodiff import cg_solve_differentiable
from tests.conftest import make_spd


def test_grad_b_matches_linalg():
    a = make_spd(32)
    op = DenseOperator(jnp.asarray(a))
    b = jnp.asarray(np.random.default_rng(1).standard_normal(32))

    def loss_cg(b):
        x = cg_solve_differentiable(op, b, 1e-13, None, 1e-14)
        return jnp.sum(x**2)

    def loss_dense(b):
        x = jnp.linalg.solve(jnp.asarray(a), b)
        return jnp.sum(x**2)

    g_cg = jax.grad(loss_cg)(b)
    g_dense = jax.grad(loss_dense)(b)
    np.testing.assert_allclose(np.asarray(g_cg), np.asarray(g_dense), rtol=1e-8)


def test_grad_dense_matrix_matches_linalg():
    a = make_spd(24)
    b = jnp.asarray(np.random.default_rng(2).standard_normal(24))
    w = jnp.asarray(np.random.default_rng(3).standard_normal(24))

    def loss_cg(a_arr):
        x = cg_solve_differentiable(DenseOperator(a_arr), b, 1e-13, None, 1e-14)
        return jnp.dot(w, x)

    def loss_dense(a_arr):
        return jnp.dot(w, jnp.linalg.solve(a_arr, b))

    g_cg = jax.grad(loss_cg)(jnp.asarray(a))
    g_dense = jax.grad(loss_dense)(jnp.asarray(a))
    np.testing.assert_allclose(np.asarray(g_cg), np.asarray(g_dense), rtol=1e-7, atol=1e-10)


def test_grad_dia_bands_finite_difference():
    n = 64
    dia = lap2d_reference(n)
    op = DiaOperator.from_host(dia)
    b = jnp.asarray(source_term(n))
    w = jnp.asarray(np.random.default_rng(4).standard_normal(n))

    def loss(bands):
        x = cg_solve_differentiable(
            DiaOperator(bands, op.offsets), b, 1e-13, None, 1e-14
        )
        return jnp.dot(w, x)

    g = np.asarray(jax.grad(loss)(op.bands))
    # finite differences on a few band entries
    rng = np.random.default_rng(5)
    eps = 1e-6
    for _ in range(6):
        d = rng.integers(0, op.bands.shape[0])
        i = rng.integers(2 + abs(min(op.offsets)), n - 2 - max(op.offsets))
        bp = np.asarray(op.bands).copy()
        bp[d, i] += eps
        bm = np.asarray(op.bands).copy()
        bm[d, i] -= eps
        fd = (float(loss(jnp.asarray(bp))) - float(loss(jnp.asarray(bm)))) / (2 * eps)
        # zero-structure entries have zero analytic gradient only if the
        # perturbed entry is actually inside the matrix
        np.testing.assert_allclose(g[d, i], fd, rtol=2e-4, atol=1e-7)


def test_jit_and_vmap_compose():
    a = make_spd(16)
    op = DenseOperator(jnp.asarray(a))
    B = jnp.asarray(np.random.default_rng(6).standard_normal((3, 16)))

    f = jax.jit(jax.vmap(lambda b: cg_solve_differentiable(op, b, 1e-12, None, 1e-14)))
    X = f(B)
    for i in range(3):
        np.testing.assert_allclose(
            np.asarray(X[i]), np.linalg.solve(a, np.asarray(B[i])), rtol=1e-8
        )
