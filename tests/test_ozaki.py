"""Ozaki split-precision dense fp64 mat-vec (cgx/ops/ozaki.py).

The scheme's correctness rests on exactness invariants (int8 slices,
never-overflowing int32 accumulation) plus a bounded dropped tail;
these tests pin both the invariants and the end-to-end accuracy
against the fp64 oracle (reference regime: the dense dgemv cg.cc:101 /
MatVecT cg.cu:63-110 at fp64).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from cgx.ops.ozaki import (
    BETA,
    NMAX,
    OzakiDenseOperator,
    _build_slices,
    ozaki_matvec,
)
from tests.conftest import make_spd


def _rel_to_mass(y, y_ref, a, x):
    mass = np.abs(a) @ np.abs(x) + 1e-300
    return np.max(np.abs(y - y_ref) / mass)


def test_slices_are_int8_bounded():
    a = jnp.asarray(make_spd(80, seed=3))
    c, sigma = _build_slices(a, 8)
    assert c.dtype == jnp.int8
    c_np = np.asarray(c, np.float64)
    assert np.max(np.abs(c_np[0])) <= 2.0 ** (BETA - 1), (
        "leading slice bound 2^(beta-1) — the strict sigma > 2*rowmax "
        "scaling guarantees |a_hat| <= 1/2"
    )
    assert np.min(c_np[1:]) >= 0.0, "floor slicing: nonneg remainders"
    assert np.max(c_np[1:]) <= 2.0**BETA - 1
    # invariant that makes the int32 accumulation exact for n <= NMAX
    assert 2 * BETA + np.log2(NMAX) <= 31
    # sigma are powers of two strictly above the row max (|a_hat|<=1/2)
    s = np.asarray(sigma)
    assert np.all(s >= 2 * np.max(np.abs(np.asarray(a)), axis=1))
    assert np.all(np.exp2(np.round(np.log2(s))) == s)


def test_slice_reconstruction_error_bound():
    a = jnp.asarray(make_spd(64, seed=1))
    num = 8
    c, sigma = _build_slices(a, num)
    n = a.shape[0]
    recon = np.zeros((n, n))
    for s in range(num):
        recon += np.asarray(c[s], np.float64) * 2.0 ** (-(s + 1) * BETA)
    a_hat = np.asarray(a) / np.asarray(sigma)[:, None]
    err = np.max(np.abs(recon - a_hat))
    # the slicing remainder is < 2^(-S*beta), but THIS fp64
    # re-summation of 8 slices rounds at eps64 per add — the observable
    # bound is the fp64 accumulation floor, not the slicing tail
    assert err <= 8 * np.finfo(np.float64).eps, err
    # floor slicing: the dropped tail is NONNEGATIVE (recon <= a_hat)
    assert np.all(recon <= a_hat + 4 * np.finfo(np.float64).eps)


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


def test_matvec_multi_rhs():
    n, s = 200, 5
    a = make_spd(n, seed=21)
    rs = np.random.default_rng(2)
    x = rs.standard_normal((n, s)) * np.exp2(rs.integers(-8, 8, (n, s)))
    y = np.asarray(ozaki_matvec(jnp.asarray(a), jnp.asarray(x)))
    for j in range(s):
        assert _rel_to_mass(y[:, j], a @ x[:, j], a, x[:, j]) < 1e-14


def test_solve_api_dense_fp64_ozaki():
    """cgx.solve(dense, b, SolveConfig(dense_fp64='ozaki')) routes the
    mat-vec through the Ozaki operator and still reaches the reference
    tolerance; 'emulated' keeps the plain fp64 path. (On CPU 'auto'
    resolves to emulated — fp64 is hardware there.)"""
    import cgx
    from cgx.config import SolveConfig
    from cgx.mats.generators import lap2d_fd, source_term
    from cgx.solver.operators import as_operator, densify_on_device

    dia = lap2d_fd(16)
    n = dia.shape[0]
    b = np.asarray(source_term(n))
    dense = densify_on_device(as_operator(dia, dtype=jnp.float64))
    a_np = np.asarray(dense.a)

    for mode in ("ozaki", "emulated"):
        res = cgx.solve(
            dense, b, SolveConfig(dense_fp64=mode, tolerance=1e-10)
        )
        assert bool(res.converged), mode
        rel = np.linalg.norm(a_np @ np.asarray(res.x) - b) / np.linalg.norm(b)
        assert rel < 1e-11, (mode, rel)

    # multi-RHS block path through the Ozaki operator
    rs = np.random.default_rng(0)
    bs = np.stack([b, rs.standard_normal(n)], axis=1)
    res = cgx.solve(dense, bs, SolveConfig(dense_fp64="ozaki", tolerance=1e-10))
    x = np.asarray(res.x)
    for j in range(2):
        rel = np.linalg.norm(a_np @ x[:, j] - bs[:, j]) / np.linalg.norm(
            bs[:, j]
        )
        assert rel < 1e-10, (j, rel)


def test_tiny_entry_boundary_no_int8_overflow():
    """Regression: a tiny negative entry (|x| ~ 1e-29 against a ~1e5
    column max) used to make floor slicing land on exactly 2^BETA —
    one past the int8 range — after fp64 cancellation absorbed the
    remainder. The reference source term b[i] = -2 i pi^2 sin^2(10 pi
    i h) produces exactly such entries (near-zero sin^2 values)."""
    from cgx.mats.generators import source_term
    from cgx.ops.ozaki import _slice_vector

    b = np.asarray(source_term(400))
    d, tau = _slice_vector(jnp.asarray(b)[:, None], 8)
    d_np = np.asarray(d, np.float64)
    assert np.max(d_np) <= 2.0**BETA - 1
    assert np.min(d_np) >= -(2.0 ** (BETA - 1))
    recon = sum(
        d_np[t, :, 0] * 2.0 ** (-(t + 1) * BETA) for t in range(8)
    ) * float(np.asarray(tau)[0])
    assert np.max(np.abs(recon - b)) <= 2.0**-50 * np.max(np.abs(b))

    n = 400
    a = make_spd(n, seed=5)
    y = np.asarray(ozaki_matvec(jnp.asarray(a), jnp.asarray(b)))
    assert _rel_to_mass(y, a @ b, a, b) < 1e-14


def test_sharded_dense_ozaki_allgather():
    """Row-sharded dense fp64 CG with the Ozaki local mat-vec — the
    reference's exact MPI configuration (row-decomposed dense fp64 +
    per-iteration allgather, cg.cc:64-136) at MXU rate. Must match the
    emulated-fp64 sharded path's quality and keep the same collective
    signature (1 all_gather + 2 psum per iteration)."""
    from cgx.mats.generators import lap2d_fd, source_term
    from cgx.parallel.sharded_cg import sharded_cg_solve
    from cgx.solver.operators import as_operator, densify_on_device

    dia = lap2d_fd(16)
    n = dia.shape[0]
    b = np.asarray(source_term(n))
    dense = densify_on_device(as_operator(dia, dtype=jnp.float64))
    a_np = np.asarray(dense.a)

    res = sharded_cg_solve(
        a_np, b, n_devices=8, strategy="allgather", dense_fp64="ozaki",
        tol=1e-10,
    )
    assert bool(res.converged)
    rel = np.linalg.norm(a_np @ np.asarray(res.x) - b) / np.linalg.norm(b)
    assert rel < 1e-11, rel

    res_e = sharded_cg_solve(
        a_np, b, n_devices=8, strategy="allgather", dense_fp64="emulated",
        tol=1e-10,
    )
    assert abs(int(res.iterations) - int(res_e.iterations)) <= 2

    # multi-RHS block path
    from cgx.parallel.sharded_cg import sharded_block_cg_solve

    rs = np.random.default_rng(0)
    bs = np.stack([b, rs.standard_normal(n)], axis=1)
    resb = sharded_block_cg_solve(
        a_np, bs, n_devices=8, strategy="allgather", dense_fp64="ozaki",
        tol=1e-10,
    )
    xb = np.asarray(resb.x)
    for j in range(2):
        rel = np.linalg.norm(a_np @ xb[:, j] - bs[:, j]) / np.linalg.norm(
            bs[:, j]
        )
        assert rel < 1e-10, (j, rel)


def test_build_slices_np_matches_device():
    from cgx.ops.ozaki import _build_slices, build_slices_np

    a = make_spd(130, seed=4)
    c_np, sigma_np = build_slices_np(a, 8)
    c_d, sigma_d = _build_slices(jnp.asarray(a), 8)
    assert np.array_equal(sigma_np, np.asarray(sigma_d))
    assert np.array_equal(c_np, np.asarray(c_d))
