"""Block-Jacobi preconditioner (cgx.solver.precond.block_jacobi).

The TPU-native strong-coupling preconditioner: instead of the
triangular solves of SSOR/IC (serial on a vector machine), the apply
is ONE batched (nb, m, m) @ (nb, m) MXU contraction, zero reductions,
and on sharded solves purely shard-local (pinned in
test_collective_counts.py::test_block_jacobi_same_signature_as_jacobi).
Beyond the reference's surface (its only robustness device is the
alpha clamp, cg.cc:107).
"""

import numpy as np
import pytest

import jax.numpy as jnp

import cgx
from cgx.config import SolveConfig
from cgx.mats.generators import (
    lap2d_aniso,
    lap2d_fd,
    poisson2d_var,
    source_term,
)
from cgx.solver.precond import (
    block_jacobi,
    diag_blocks,
    invert_spd_blocks,
    jacobi,
)


@pytest.fixture(scope="module")
def mat():
    return lap2d_fd(10)  # N = 100


@pytest.fixture(scope="module")
def dense(mat):
    return np.asarray(mat.to_dense())


def test_extraction_matches_principal_blocks(mat, dense):
    """diag_blocks == the exact (m, m) principal submatrices, with
    identity on padding rows, for a NON-dividing block size."""
    n, m = 100, 7
    blocks = diag_blocks(mat, m)
    nb = -(-n // m)
    assert blocks.shape == (nb, m, m)
    for bk in range(nb):
        lo, hi = bk * m, min((bk + 1) * m, n)
        ref = np.eye(m)
        ref[: hi - lo, : hi - lo] = dense[lo:hi, lo:hi]
        np.testing.assert_allclose(blocks[bk], ref)


def test_dense_and_banded_extraction_agree(mat, dense):
    np.testing.assert_allclose(
        diag_blocks(dense, 7), diag_blocks(mat, 7)
    )


def test_block_size_one_is_point_jacobi(mat, dense):
    r = np.random.default_rng(0).standard_normal(100)
    z_bj = np.asarray(block_jacobi(mat, 1)(jnp.asarray(r)))
    z_pj = np.asarray(jacobi(jnp.asarray(np.diag(dense)))(jnp.asarray(r)))
    np.testing.assert_allclose(z_bj, z_pj, rtol=1e-14)


def test_block_size_n_is_direct_solve(mat, dense):
    r = np.random.default_rng(1).standard_normal(100)
    z = np.asarray(block_jacobi(mat, 100)(jnp.asarray(r)))
    np.testing.assert_allclose(z, np.linalg.solve(dense, r), rtol=1e-10)


def test_apply_matches_block_diagonal_solve(mat, dense):
    """Non-dividing m: z == blkdiag(A_1..A_nb)^{-1} r exactly."""
    n, m = 100, 7
    r = np.random.default_rng(2).standard_normal(n)
    mb = np.zeros_like(dense)
    for bk in range(-(-n // m)):
        lo, hi = bk * m, min((bk + 1) * m, n)
        mb[lo:hi, lo:hi] = dense[lo:hi, lo:hi]
    z = np.asarray(block_jacobi(mat, m)(jnp.asarray(r)))
    np.testing.assert_allclose(z, np.linalg.solve(mb, r), rtol=1e-10)


def test_apply_is_symmetric(mat):
    """<u, M^{-1} v> == <M^{-1} u, v> — CG-safety."""
    u, v = np.random.default_rng(3).standard_normal((2, 100))
    bj = block_jacobi(mat, 10)
    lhs = float(np.dot(u, np.asarray(bj(jnp.asarray(v)))))
    rhs = float(np.dot(v, np.asarray(bj(jnp.asarray(u)))))
    assert np.isclose(lhs, rhs, rtol=1e-12)


def test_non_spd_block_rejected():
    blocks = np.stack([np.eye(3), np.diag([1.0, -2.0, 1.0])])
    with pytest.raises(ValueError, match="SPD"):
        invert_spd_blocks(blocks)


def test_line_jacobi_collapses_anisotropic_iterations():
    """lap2d_aniso(eps=0.01): x-coupling dominates; point Jacobi is a
    no-op (constant diagonal) while line-sized blocks solve the stiff
    per-line tridiagonal systems exactly. Measured 339 -> 34."""
    g = 32
    mat = lap2d_aniso(g, 0.01)
    b = source_term(g * g)
    it_plain = int(cgx.solve(mat, b, SolveConfig()).iterations)
    it_line = int(
        cgx.solve(
            mat, b,
            SolveConfig(precond="block_jacobi", precond_block_size=g),
        ).iterations
    )
    assert it_plain > 300
    assert it_line < 50
    assert it_line * 5 < it_plain


def test_high_contrast_beats_point_jacobi_and_matches_sharded():
    """Jumping-coefficient Poisson: block-Jacobi <= point-Jacobi
    iterations, answers quality-gated on the TRUE residual; the
    8-shard solve reproduces the single-device iteration count."""
    g = 24
    c = np.ones((g, g))
    c[8:16, 8:16] = 1e3
    mat = poisson2d_var(g, c)
    dense = np.asarray(mat.to_dense())
    b = source_term(g * g)
    cfg = SolveConfig(precond="block_jacobi", precond_block_size=8)
    res1 = cgx.solve(mat, b, cfg)
    res8 = cgx.solve(mat, b, cfg, n_devices=8)
    it_pj = int(cgx.solve(mat, b, SolveConfig(precond="jacobi")).iterations)
    assert int(res1.iterations) <= it_pj
    assert int(res8.iterations) == int(res1.iterations)
    for res in (res1, res8):
        x = np.asarray(res.x)
        assert np.linalg.norm(dense @ x - b) / np.linalg.norm(b) < 1e-9


@pytest.mark.parametrize("method", ["pipelined", "gvpipe"])
def test_sharded_methods_compose(method):
    g = 16
    mat = lap2d_fd(g)
    dense = np.asarray(mat.to_dense())
    b = source_term(g * g)
    res = cgx.solve(
        mat, b,
        SolveConfig(
            precond="block_jacobi", precond_block_size=8, method=method
        ),
        n_devices=8,
    )
    x = np.asarray(res.x)
    assert bool(res.converged)
    assert np.linalg.norm(dense @ x - b) / np.linalg.norm(b) < 1e-9


def test_sharded_rejects_straddling_blocks():
    from cgx.parallel.sharded_cg import sharded_cg_solve

    mat = lap2d_fd(16)  # N=256, 8 shards -> n_loc=32
    b = source_term(256)
    with pytest.raises(ValueError, match="divide the shard"):
        sharded_cg_solve(
            mat, b, n_devices=8,
            precond="block_jacobi", precond_block_size=24,
        )


def test_aniso_eps1_is_lap2d_fd():
    a, l = lap2d_aniso(16, 1.0), lap2d_fd(16)
    assert a.offsets == l.offsets
    np.testing.assert_array_equal(np.asarray(a.bands), np.asarray(l.bands))


def test_aniso_rejects_nonpositive_eps():
    with pytest.raises(ValueError, match="positive"):
        lap2d_aniso(8, 0.0)
