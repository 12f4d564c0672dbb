"""Whole-solve VMEM Pallas kernel tests (interpret mode)."""

import jax.numpy as jnp
import numpy as np
import pytest

from cgx import DiaOperator, cg_solve, lap2d_reference, source_term
from cgx.mats.generators import lap2d_fd, lap3d_fd
from cgx.ops.cg_kernel import dia_cg_solve_vmem
from cgx.solver.refine import refine_fixed_sweeps


def test_vmem_matches_core_counts():
    n = 700
    dia = lap2d_reference(n)
    op32 = DiaOperator.from_host(dia, dtype=jnp.float32)
    b32 = jnp.asarray(source_term(n), jnp.float32)
    tol = 1e-3 * float(jnp.linalg.norm(b32.astype(jnp.float64)))
    core = cg_solve(op32, b32, tol=tol)
    fast = dia_cg_solve_vmem(op32, b32, tol=tol, chunk=32, interpret=True)
    assert bool(fast.converged)
    assert abs(int(fast.iterations) - int(core.iterations)) <= 1
    np.testing.assert_allclose(
        np.asarray(fast.x, np.float64),
        np.asarray(core.x, np.float64),
        rtol=3e-3,
        atol=1e-2 * float(jnp.max(jnp.abs(core.x))),
    )


def test_vmem_maxiter_cap_exact():
    """Fixed-iteration mode must stop at exactly maxiter even when it
    falls mid-chunk (weak-scaling parity, cg.run:22-44)."""
    n = 512
    dia = lap2d_reference(n)
    op32 = DiaOperator.from_host(dia, dtype=jnp.float32)
    b32 = jnp.asarray(source_term(n), jnp.float32)
    for maxiter in (50, 64, 70, 200):
        res = dia_cg_solve_vmem(
            op32, b32, tol=0.0, maxiter=maxiter, chunk=64, interpret=True
        )
        assert int(res.iterations) == maxiter, maxiter
        assert not bool(res.converged)


def test_vmem_3d_stencil():
    dia = lap3d_fd(6)  # 7 diagonals, N=216
    op32 = DiaOperator.from_host(dia, dtype=jnp.float32)
    b = jnp.asarray(np.random.default_rng(0).standard_normal(216), jnp.float32)
    res = dia_cg_solve_vmem(op32, b, tol=1e-4, chunk=16, interpret=True)
    assert bool(res.converged)
    x = np.asarray(res.x, np.float64)
    A = dia.to_dense()
    assert np.linalg.norm(A @ x - np.asarray(b, np.float64)) < 1e-3


def test_refine_fixed_sweeps_quality():
    dia = lap2d_fd(24)
    n = dia.shape[0]
    b = jnp.asarray(source_term(n))
    op = DiaOperator.from_host(dia)
    res = refine_fixed_sweeps(op, b, sweeps=4, chunk=128, interpret=True)
    assert bool(res.converged)
    x = np.asarray(res.x)
    A = dia.to_dense()
    rel = np.linalg.norm(A @ x - np.asarray(b)) / np.linalg.norm(np.asarray(b))
    # contract: early exit at rtol=1e-11 of ||b|| (fp64-quality)
    assert rel < 1e-11
    assert int(res.outer_iterations) <= 4


def test_vmem_kernel_bf16_bands():
    """bands_dtype=bfloat16: the whole-solve kernel with 2-byte bands
    must solve the stencil problem exactly as the fp32-band version
    (4/-1/0 are bf16-exact) — the VMEM-budget doubler used by the
    refinement dispatch above the fp32 ceiling."""
    import numpy as np

    from cgx.mats.generators import lap2d_fd, source_term
    from cgx.ops.cg_kernel import dia_cg_solve_vmem
    from cgx.solver.operators import DiaOperator

    g = 24
    dia = lap2d_fd(g)
    n = g * g
    op = DiaOperator(
        jnp.asarray(np.asarray(dia.bands, np.float32)), tuple(dia.offsets)
    )
    b0 = source_term(n).astype(np.float32)
    b = jnp.asarray(b0 / np.linalg.norm(b0))
    r32 = dia_cg_solve_vmem(
        op, b, tol=1e-6, maxiter=n, chunk=64, interpret=True
    )
    rbf = dia_cg_solve_vmem(
        op, b, tol=1e-6, maxiter=n, chunk=64, interpret=True,
        bands_dtype=jnp.bfloat16,
    )
    assert bool(rbf.converged)
    assert int(rbf.iterations) == int(r32.iterations)
    np.testing.assert_allclose(
        np.asarray(rbf.x), np.asarray(r32.x), rtol=1e-6, atol=1e-7
    )


@pytest.mark.parametrize("precond", [False, True])
def test_vmem2d_matches_1d(precond):
    """The (rows, cols) plane layout reproduces the (1, n) layout's
    trajectory (same math, different vreg tiling). cols=128 with n=700
    forces a multi-row plane with both intra- and cross-row diagonal
    shifts (offsets +-1, +-27 at cols=128)."""
    n = 700
    dia = lap2d_reference(n)
    op32 = DiaOperator.from_host(dia, dtype=jnp.float32)
    b32 = jnp.asarray(source_term(n), jnp.float32)
    tol = 1e-3 * float(jnp.linalg.norm(b32.astype(jnp.float64)))
    ref = dia_cg_solve_vmem(
        op32, b32, tol=tol, chunk=32, interpret=True, precond=precond
    )
    two = dia_cg_solve_vmem(
        op32, b32, tol=tol, chunk=32, interpret=True, precond=precond,
        layout="2d", cols=128,
    )
    assert bool(two.converged)
    assert abs(int(two.iterations) - int(ref.iterations)) <= 1
    np.testing.assert_allclose(
        np.asarray(two.x, np.float64),
        np.asarray(ref.x, np.float64),
        rtol=3e-3,
        atol=1e-2 * float(jnp.max(jnp.abs(ref.x))),
    )


def test_vmem2d_cross_row_offsets_quality():
    """Offsets larger than cols (3-D stencil, N=1728, offsets up to
    144 > cols=128) exercise the q > 1 row-shift decomposition."""
    dia = lap3d_fd(12)
    n = dia.shape[0]
    op32 = DiaOperator.from_host(dia, dtype=jnp.float32)
    b = jnp.asarray(
        np.random.default_rng(1).standard_normal(n), jnp.float32
    )
    res = dia_cg_solve_vmem(
        op32, b, tol=1e-4, chunk=16, interpret=True, layout="2d", cols=128
    )
    assert bool(res.converged)
    x = np.asarray(res.x, np.float64)
    A = dia.to_dense()
    assert np.linalg.norm(A @ x - np.asarray(b, np.float64)) < 1e-3


def test_vmem2d_maxiter_cap_exact():
    n = 512
    dia = lap2d_reference(n)
    op32 = DiaOperator.from_host(dia, dtype=jnp.float32)
    b32 = jnp.asarray(source_term(n), jnp.float32)
    for maxiter in (50, 64, 70):
        res = dia_cg_solve_vmem(
            op32, b32, tol=0.0, maxiter=maxiter, chunk=64, interpret=True,
            layout="2d", cols=128,
        )
        assert int(res.iterations) == maxiter, maxiter
        assert not bool(res.converged)


def test_refine_fixed_sweeps_2d_layout():
    """fp64 refinement around the 2-D-plane inner kernel reaches the
    same fp64-quality contract as the 1-D layout."""
    dia = lap2d_fd(24)
    n = dia.shape[0]
    b = jnp.asarray(source_term(n))
    op = DiaOperator.from_host(dia)
    res = refine_fixed_sweeps(
        op, b, sweeps=4, chunk=128, interpret=True, layout="2d", cols=128
    )
    assert bool(res.converged)
    x = np.asarray(res.x)
    A = dia.to_dense()
    rel = np.linalg.norm(A @ x - np.asarray(b)) / np.linalg.norm(np.asarray(b))
    assert rel < 1e-11
    assert int(res.outer_iterations) <= 4
