"""Generator parity and property tests (reference:
generate_lap2d_matrix cg.cc:159-188, init_source_term cg.cc:218-234,
test matrix lap2D_5pt_n100.mtx)."""

import math

import numpy as np
import pytest

from cgx.mats.containers import CSRMatrix, DIAMatrix, ELLMatrix
from cgx.mats.generators import (
    lap2d_fd,
    lap2d_fd_coo_lower,
    lap2d_reference,
    lap3d_fd,
    source_term,
)


def reference_lap2d_dense(size: int) -> np.ndarray:
    """Literal transcription of the reference's generator loop
    (cg.cc:175-186) as the parity oracle."""
    a = np.zeros((size, size))
    inc = int(math.floor(math.sqrt(size)))
    for i in range(size):
        if i > inc:
            a[i, i - 1 - inc] = -1
        if i > 0:
            a[i, i - 1] = -1
        a[i, i] = 4
        if i < size - 1:
            a[i, i + 1] = -1
        if i < size - 1 - inc:
            a[i, i + 1 + inc] = -1
    return a


@pytest.mark.parametrize("size", [10, 17, 100, 256, 1000])
def test_lap2d_reference_exact_parity(size):
    got = lap2d_reference(size).to_dense()
    want = reference_lap2d_dense(size)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("size", [64, 100, 313])
def test_lap2d_reference_is_spd(size):
    """The stencil's asymmetric-looking guards pair up (SURVEY §3.4
    caveat) — property-check symmetry and positive-definiteness."""
    a = lap2d_reference(size).to_dense()
    np.testing.assert_array_equal(a, a.T)
    w = np.linalg.eigvalsh(a)
    assert w.min() > 0


def test_lap2d_fd_matches_classic_kron():
    """lap2d_fd == I (x) T + T (x) I + 2I pattern check via kron."""
    n = 7
    T = 2 * np.eye(n) - np.eye(n, k=1) - np.eye(n, k=-1)
    expect = np.kron(np.eye(n), T) + np.kron(T, np.eye(n))
    got = lap2d_fd(n).to_dense()
    np.testing.assert_array_equal(got, expect)


def test_lap2d_fd_nnz_matches_reference_file_structure():
    """The reference test file lap2D_5pt_n100.mtx stores the lower
    triangle of a 100x100-grid 5-point Laplacian: 10000x10000 with
    29800 stored nnz. Our generator must reproduce those counts."""
    coo = lap2d_fd_coo_lower(100)
    assert coo.shape == (10000, 10000)
    assert len(coo.values) == 29800
    assert coo.symmetric
    # diag = 4, off-diag = -1
    on_diag = coo.rows == coo.cols
    assert (coo.values[on_diag] == 4.0).all()
    assert (coo.values[~on_diag] == -1.0).all()
    # off-diagonals at distances 1 and 100 only
    dist = coo.rows[~on_diag] - coo.cols[~on_diag]
    assert set(np.unique(dist)) == {1, 100}


def test_lap3d_fd_structure():
    n = 4
    a = lap3d_fd(n).to_dense()
    np.testing.assert_array_equal(a, a.T)
    assert (np.diagonal(a) == 6.0).all()
    w = np.linalg.eigvalsh(a)
    assert w.min() > 0
    # row sums are >= 0 (diagonally dominant)
    assert (a.sum(axis=1) >= 0).all()


def test_source_term_parity():
    """b[i] = -2 i pi^2 sin^2(10 pi i h), h=1/n (cg.cc:229-232)."""
    n = 100
    b = source_term(n)
    h = 1.0 / n
    for i in [0, 1, 7, 50, 99]:
        want = -2.0 * i * math.pi**2 * math.sin(10 * math.pi * i * h) ** 2
        assert b[i] == pytest.approx(want, rel=1e-15)


def test_container_conversions_roundtrip():
    dia = lap2d_fd(8)
    dense = dia.to_dense()
    coo = lap2d_fd_coo_lower(8)
    csr = CSRMatrix.from_coo(coo)
    ell = ELLMatrix.from_coo(coo)
    dia2 = DIAMatrix.from_coo(coo)
    x = np.random.default_rng(1).standard_normal(64)
    want = dense @ x
    np.testing.assert_allclose(coo.mat_vec(x), want, rtol=1e-14)
    np.testing.assert_allclose(csr.mat_vec(x), want, rtol=1e-14)
    np.testing.assert_allclose(ell.mat_vec(x), want, rtol=1e-14)
    np.testing.assert_allclose(dia2.mat_vec(x), want, rtol=1e-14)
    np.testing.assert_array_equal(dia2.to_dense(), dense)


# --- variable-coefficient Poisson (poisson2d_var) ------------------------


def test_poisson2d_var_constant_equals_lap2d_fd():
    from cgx.mats.generators import lap2d_fd, poisson2d_var

    g = 12
    dia_c = poisson2d_var(g, np.ones((g, g)))
    dia_l = lap2d_fd(g)
    assert dia_c.offsets == dia_l.offsets
    np.testing.assert_allclose(
        np.asarray(dia_c.bands), np.asarray(dia_l.bands)
    )


def test_poisson2d_var_spd_and_symmetric():
    from cgx.mats.generators import poisson2d_var

    g = 10
    rng = np.random.default_rng(0)
    c = np.exp(rng.standard_normal((g, g)))  # lognormal, positive
    a = np.asarray(poisson2d_var(g, c).to_dense())
    np.testing.assert_allclose(a, a.T, atol=0)
    evals = np.linalg.eigvalsh(a)
    assert evals[0] > 0


def test_poisson2d_var_validates_input():
    from cgx.mats.generators import poisson2d_var

    with pytest.raises(ValueError, match="must be"):
        poisson2d_var(4, np.ones((3, 3)))
    with pytest.raises(ValueError, match="positive"):
        poisson2d_var(4, -np.ones((4, 4)))


def test_poisson2d_var_high_contrast_preconditioning_showcase():
    """High-contrast (jumping) coefficients are the regime the
    constant-coefficient generators cannot exercise: plain CG pays the
    contrast in the condition number, Jacobi removes the coefficient
    scaling (the low cluster here is per-node scaling, not interface
    decoupling), and the GALERKIN multigrid hierarchy — built from the
    operator itself, not rediscretized — stays effective across the
    jumps. Measured: 520 plain / 95 jacobi / 80 mg iterations."""
    import cgx
    from cgx.mats.generators import poisson2d_var

    g = 24
    n = g * g
    c = np.ones((g, g))
    c[4:10, 4:10] = 1e-4
    c[14:20, 14:20] = 1e-4  # two low-conductivity inclusions
    dia = poisson2d_var(g, c)
    a = np.asarray(dia.to_dense())
    b = np.random.default_rng(2).standard_normal(n)
    cfg = dict(tolerance=1e-8, maxiter=5 * n)
    plain = cgx.solve(dia, b, cgx.SolveConfig(**cfg))
    jac = cgx.solve(dia, b, cgx.SolveConfig(precond="jacobi", **cfg))
    mg = cgx.solve(dia, b, cgx.SolveConfig(precond="mg", **cfg))
    for r in (plain, jac, mg):
        assert bool(r.converged)
        rel = np.linalg.norm(a @ np.asarray(r.x) - b) / np.linalg.norm(b)
        assert rel < 1e-9
    assert int(jac.iterations) < 0.25 * int(plain.iterations)
    assert int(mg.iterations) <= int(jac.iterations) + 5


def test_poisson3d_var_constant_equals_lap3d_fd():
    from cgx.mats.generators import lap3d_fd, poisson3d_var

    g = 6
    dia_c = poisson3d_var(g, np.ones((g, g, g)))
    dia_l = lap3d_fd(g)
    assert dia_c.offsets == dia_l.offsets
    np.testing.assert_allclose(
        np.asarray(dia_c.bands), np.asarray(dia_l.bands)
    )


def test_poisson3d_var_spd_symmetric_and_solvable():
    import jax.numpy as jnp

    import cgx
    from cgx.mats.generators import poisson3d_var

    g = 8
    rng = np.random.default_rng(0)
    c = np.exp(rng.standard_normal((g, g, g)))
    dia = poisson3d_var(g, c)
    a = np.asarray(dia.to_dense())
    np.testing.assert_allclose(a, a.T, atol=0)
    assert np.linalg.eigvalsh(a)[0] > 0
    b = rng.standard_normal(g ** 3)
    res = cgx.solve(dia, b, cgx.SolveConfig(tolerance=1e-10, maxiter=5 * g ** 3))
    rel = np.linalg.norm(a @ np.asarray(res.x) - b) / np.linalg.norm(b)
    assert bool(res.converged) and rel < 1e-11
