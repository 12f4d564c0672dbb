"""Ozaki split-precision dense fp64 mat-vec (cgx/ops/ozaki.py).

The scheme's correctness rests on exactness invariants (integer-valued
bf16 slices, never-rounding fp32 accumulation) plus a bounded dropped
tail; these tests pin both the invariants and the end-to-end accuracy
against the fp64 oracle (reference regime: the dense dgemv cg.cc:101 /
MatVecT cg.cu:63-110 at fp64).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from cgx.ops.ozaki import (
    BETA,
    BLOCK,
    OzakiDenseOperator,
    _build_slices,
    ozaki_matvec,
)
from tests.conftest import make_spd


def _rel_to_mass(y, y_ref, a, x):
    mass = np.abs(a) @ np.abs(x) + 1e-300
    return np.max(np.abs(y - y_ref) / mass)


def test_slices_are_integer_valued_and_bounded():
    a = jnp.asarray(make_spd(80, seed=3))
    c, sigma = _build_slices(a, 7)
    c_np = np.asarray(c, np.float64)
    assert np.all(c_np == np.round(c_np)), "slices must be integers"
    assert np.max(np.abs(c_np[0])) <= 2.0**BETA
    assert np.max(np.abs(c_np[1:])) <= 2.0 ** (BETA - 1), (
        "non-leading slices bound 2^(beta-1) — exactness of the fp32 "
        "accumulation depends on it"
    )
    # invariant that makes every fp32 accumulation exact
    assert 2 * BETA + np.log2(BLOCK) <= 24
    # sigma are powers of two covering the row max
    s = np.asarray(sigma)
    assert np.all(s >= np.max(np.abs(np.asarray(a)), axis=1))
    assert np.all(np.exp2(np.round(np.log2(s))) == s)


def test_slice_reconstruction_error_bound():
    a = jnp.asarray(make_spd(64, seed=1))
    num = 7
    c, sigma = _build_slices(a, num)
    n = a.shape[0]
    recon = np.zeros((n, c.shape[2] * BLOCK))
    for s in range(num):
        recon += np.asarray(c[s], np.float64).reshape(n, -1) * 2.0 ** (
            -(s + 1) * BETA
        )
    a_hat = np.asarray(a) / np.asarray(sigma)[:, None]
    err = np.max(np.abs(recon[:, :n] - a_hat))
    # the slicing remainder is <= 2^(-S*beta-1), but THIS fp64
    # re-summation of 7 slices rounds at eps64 per add — the observable
    # bound is the fp64 accumulation floor, not the slicing tail
    assert err <= 8 * np.finfo(np.float64).eps, err


@pytest.mark.parametrize("n", [30, 257, 700])
def test_matvec_fp64_quality(n):
    a = make_spd(n, seed=n)
    rs = np.random.default_rng(n)
    x = rs.standard_normal(n) * 1e6
    y = np.asarray(ozaki_matvec(jnp.asarray(a), jnp.asarray(x)))
    assert _rel_to_mass(y, a @ x, a, x) < 1e-14


def test_matvec_ill_scaled_rows_and_x():
    """Per-row sigma and per-block tau must absorb wild scaling."""
    rs = np.random.default_rng(7)
    n = 320
    a = make_spd(n, seed=9)
    row_scale = np.exp2(rs.integers(-30, 30, size=n)).astype(np.float64)
    a = a * row_scale[:, None]  # breaks symmetry — matvec doesn't care
    x = rs.standard_normal(n) * np.exp2(rs.integers(-20, 20, size=n))
    y = np.asarray(ozaki_matvec(jnp.asarray(a), jnp.asarray(x)))
    assert _rel_to_mass(y, a @ x, a, x) < 1e-14


def test_matvec_zero_rows_and_zero_x():
    n = 64
    a = make_spd(n, seed=2)
    a[5, :] = 0.0
    y = np.asarray(ozaki_matvec(jnp.asarray(a), jnp.zeros(n)))
    assert np.all(y == 0.0)
    x = np.random.default_rng(0).standard_normal(n)
    y = np.asarray(ozaki_matvec(jnp.asarray(a), jnp.asarray(x)))
    assert y[5] == 0.0
    assert _rel_to_mass(y, a @ x, a, x) < 1e-14


def test_operator_matches_one_shot_and_diagonal():
    n = 150
    a = make_spd(n, seed=11)
    x = np.random.default_rng(1).standard_normal(n)
    op = OzakiDenseOperator.from_dense(jnp.asarray(a))
    assert np.allclose(
        np.asarray(op.matvec(jnp.asarray(x))),
        np.asarray(ozaki_matvec(jnp.asarray(a), jnp.asarray(x))),
    )
    assert np.allclose(np.asarray(op.diagonal()), np.diag(a))
    assert op.shape == (n, n)


def test_cg_on_ozaki_operator_reaches_fp64_tolerance():
    """Full CG with the Ozaki mat-vec converges like true fp64 dense CG
    (same tol, comparable iterations) — the reference's dense fp64
    regime without a single emulated-fp64 matmul."""
    from cgx.mats.generators import lap2d_fd, source_term
    from cgx.solver.cg import cg_solve
    from cgx.solver.operators import as_operator, densify_on_device

    dia = lap2d_fd(20)  # n=400
    n = dia.shape[0]
    b = jnp.asarray(source_term(n))
    dense = densify_on_device(as_operator(dia, dtype=jnp.float64))
    op = OzakiDenseOperator.from_dense(dense.a)

    res_oz = cg_solve(op, b, tol=1e-10, maxiter=n)
    res_64 = cg_solve(dense, b, tol=1e-10, maxiter=n)
    assert bool(res_oz.converged)
    a_np = np.asarray(dense.a)
    x = np.asarray(res_oz.x)
    rel = np.linalg.norm(a_np @ x - np.asarray(b)) / np.linalg.norm(
        np.asarray(b)
    )
    assert rel < 1e-11
    assert abs(int(res_oz.iterations) - int(res_64.iterations)) <= 2


def test_refinement_with_ozaki_outer_residual():
    """Mixed-precision refinement with the Ozaki operator computing the
    outer fp64 residual and a plain fp32 dense inner solve."""
    from cgx.mats.generators import lap2d_fd, source_term
    from cgx.solver.operators import DenseOperator, as_operator
    from cgx.solver.operators import densify_on_device
    from cgx.solver.refine import iterative_refinement

    dia = lap2d_fd(20)
    n = dia.shape[0]
    b = jnp.asarray(source_term(n))
    dense = densify_on_device(as_operator(dia, dtype=jnp.float64))
    op = OzakiDenseOperator.from_dense(dense.a)
    inner = DenseOperator(dense.a.astype(jnp.float32))
    res = iterative_refinement(
        op, b, tol=1e-10, inner_tol_factor=1e-6, inner_op=inner
    )
    assert bool(res.converged)
    a_np = np.asarray(dense.a)
    rel = np.linalg.norm(
        a_np @ np.asarray(res.x) - np.asarray(b)
    ) / np.linalg.norm(np.asarray(b))
    assert rel < 1e-11
