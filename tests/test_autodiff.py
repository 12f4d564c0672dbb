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


def test_block_grad_matches_linalg():
    """Block solve gradients via one extra block solve: d/dB and d/dA
    match dense linear algebra."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from cgx.mats.generators import lap2d_fd, source_term
    from cgx.solver.autodiff import block_cg_solve_differentiable
    from cgx.solver.operators import DenseOperator, DiaOperator

    g = 8
    fd = lap2d_fd(g)
    n = g * g
    a = jnp.asarray(fd.to_dense())
    b0 = np.asarray(source_term(n))
    B = jnp.asarray(np.stack([b0, 0.5 * b0 + 1.0], axis=1))

    def loss_dense(amat, Bb):
        x = block_cg_solve_differentiable(DenseOperator(amat), Bb, 1e-12)
        return jnp.sum(x**2)

    ga, gb = jax.grad(loss_dense, argnums=(0, 1))(a, B)
    # reference: x = solve(a, B); dL/dB = 2 A^-1 x; dL/dA = -(A^-1 2x) x^T
    x_ref = jnp.linalg.solve(a, B)
    y_ref = jnp.linalg.solve(a, 2.0 * x_ref)
    np.testing.assert_allclose(np.asarray(gb), np.asarray(y_ref),
                               rtol=1e-6, atol=1e-8)
    ga_ref = -(y_ref @ x_ref.T)
    np.testing.assert_allclose(np.asarray(ga), np.asarray(ga_ref),
                               rtol=1e-6, atol=1e-8)

    # DIA path: gradient w.r.t. the bands, finite-difference check on
    # the main diagonal band at one entry
    op = DiaOperator.from_host(fd)

    def loss_dia(bands):
        o = DiaOperator(bands, op.offsets)
        x = block_cg_solve_differentiable(o, B, 1e-12)
        return jnp.sum(x**2)

    gbands = jax.grad(loss_dia)(op.bands)
    d0 = op.offsets.index(0)
    i = n // 2
    eps = 1e-5
    bp = op.bands.at[d0, i].add(eps)
    bm = op.bands.at[d0, i].add(-eps)
    fd_grad = (loss_dia(bp) - loss_dia(bm)) / (2 * eps)
    np.testing.assert_allclose(
        float(gbands[d0, i]), float(fd_grad), rtol=1e-4
    )
