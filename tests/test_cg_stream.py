"""HBM-streaming fused-iteration CG kernel tests (interpret mode).

Pins cgx.ops.cg_stream to the XLA Chronopoulos-Gear solver
(cgx.solver.pipelined) it reimplements as one Pallas pass per
iteration: same scalar recurrence, same stopping semantics
(reference break parity, cg.cc:120-121), trajectories matching to
rounding.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from cgx import DiaOperator, lap2d_reference, source_term
from cgx.mats.generators import lap3d_fd
from cgx.ops.cg_stream import dia_cg_solve_stream, dia_cg_solve_stream_pcg
from cgx.solver.pipelined import pipelined_cg_solve
from cgx.solver.precond import neumann_banded


@pytest.fixture(scope="module")
def problem32():
    n = 2000
    dia = lap2d_reference(n)
    op = DiaOperator.from_host(dia, dtype=jnp.float32)
    b = jnp.asarray(source_term(n), jnp.float32)
    return dia, op, b


def test_stream_matches_pipelined(problem32):
    """Multi-block geometry: rows=8, cols=128 -> 1024-element blocks,
    two grid steps at n=2000, offsets +-1/+-45 crossing block rows."""
    dia, op, b = problem32
    tol = 1e-3 * float(jnp.linalg.norm(b.astype(jnp.float64)))
    ref = pipelined_cg_solve(op, b, tol=tol)
    res = dia_cg_solve_stream(
        op, b, tol=tol, rows=8, cols=128, interpret=True
    )
    assert bool(res.converged) and not bool(res.breakdown)
    assert abs(int(res.iterations) - int(ref.iterations)) <= 1
    np.testing.assert_allclose(
        np.asarray(res.x, np.float64),
        np.asarray(ref.x, np.float64),
        rtol=3e-3,
        atol=1e-2 * float(jnp.max(jnp.abs(ref.x))),
    )


@pytest.mark.parametrize("layout", ["split", "stacked"])
def test_stream_large_offset_autogrows_rows(layout):
    """Advisor r3: offsets reaching past the block tile (m_rows > rows)
    made the aliased kernels overwrite halo rows block j+2 still reads.
    lap3d at g=33 (offsets ±1089 > rows*cols = 1024: m_rows=16 >
    rows=8 at cols=128) must auto-grow rows and stay exact."""
    from cgx.ops.cg_stream import _halo_margin

    g = 33
    dia = lap3d_fd(g)
    op = DiaOperator(jnp.asarray(dia.bands, jnp.float32),
                     tuple(dia.offsets))
    assert _halo_margin(tuple(op.offsets), 128, jnp.float32) > 8
    b = jnp.asarray(
        np.random.default_rng(5).standard_normal(g ** 3), jnp.float32
    )
    tol = 1e-2 * float(jnp.linalg.norm(b.astype(jnp.float64)))
    ref = pipelined_cg_solve(op, b, tol=tol)
    res = dia_cg_solve_stream(
        op, b, tol=tol, rows=8, cols=128, interpret=True, layout=layout
    )
    assert bool(res.converged) and not bool(res.breakdown)
    assert abs(int(res.iterations) - int(ref.iterations)) <= 1
    np.testing.assert_allclose(
        np.asarray(res.x, np.float64),
        np.asarray(ref.x, np.float64),
        rtol=3e-3,
        atol=1e-2 * float(jnp.max(jnp.abs(ref.x))),
    )


def test_stream_stacked_layout_bit_identical(problem32):
    """layout='stacked' (one (3, rows_h, cols) state array, 1 DMA each
    way per block) must be BIT-identical to 'split' — same arithmetic,
    different HBM layout."""
    dia, op, b = problem32
    tol = 1e-3 * float(jnp.linalg.norm(b.astype(jnp.float64)))
    r1 = dia_cg_solve_stream(
        op, b, tol=tol, rows=8, cols=128, interpret=True, layout="split"
    )
    r2 = dia_cg_solve_stream(
        op, b, tol=tol, rows=8, cols=128, interpret=True, layout="stacked"
    )
    assert int(r1.iterations) == int(r2.iterations)
    np.testing.assert_array_equal(np.asarray(r1.x), np.asarray(r2.x))


def test_stream_true_residual(problem32):
    dia, op, b = problem32
    tol = 1e-3 * float(jnp.linalg.norm(b.astype(jnp.float64)))
    res = dia_cg_solve_stream(
        op, b, tol=tol, rows=8, cols=128, interpret=True
    )
    x = np.asarray(res.x, np.float64)
    bb = np.asarray(b, np.float64)
    A = dia.to_dense()
    assert np.linalg.norm(A @ x - bb) / np.linalg.norm(bb) < 1e-2


def test_stream_3d_stencil_cross_row_offsets():
    """7-diagonal 3-D stencil with offsets (144) larger than cols=128:
    exercises q > 1 in the shift decomposition and a 2-row halo."""
    dia = lap3d_fd(12)  # N = 1728
    op = DiaOperator.from_host(dia, dtype=jnp.float32)
    b = jnp.asarray(
        np.random.default_rng(5).standard_normal(1728), jnp.float32
    )
    tol = 1e-3 * float(jnp.linalg.norm(b.astype(jnp.float64)))
    ref = pipelined_cg_solve(op, b, tol=tol)
    res = dia_cg_solve_stream(
        op, b, tol=tol, rows=8, cols=128, interpret=True
    )
    assert bool(res.converged)
    assert abs(int(res.iterations) - int(ref.iterations)) <= 1
    np.testing.assert_allclose(
        np.asarray(res.x, np.float64),
        np.asarray(ref.x, np.float64),
        rtol=3e-3,
        atol=1e-2,
    )


def test_stream_maxiter_cap():
    n = 1024
    dia = lap2d_reference(n)
    op = DiaOperator.from_host(dia, dtype=jnp.float32)
    b = jnp.asarray(source_term(n), jnp.float32)
    res = dia_cg_solve_stream(
        op, b, tol=0.0, maxiter=37, rows=8, cols=128, interpret=True
    )
    assert int(res.iterations) == 37
    assert not bool(res.converged)


def test_stream_zero_rhs():
    n = 256
    dia = lap2d_reference(n)
    op = DiaOperator.from_host(dia, dtype=jnp.float32)
    res = dia_cg_solve_stream(
        op, jnp.zeros(n, jnp.float32), rows=8, cols=128, interpret=True
    )
    assert bool(res.converged)
    assert int(res.iterations) == 0


def test_stream_pcg_matches_pipelined_neumann(problem32):
    """PCG kernel vs the XLA pipelined solver with the SAME degree-1
    Neumann preconditioner (neumann_banded sweeps=2): trajectories must
    agree to rounding — the in-slab 2c - D^-1 A c apply and the 2x
    chained band margin are exact, not approximations."""
    dia, op, b = problem32
    tol = 1e-3 * float(jnp.linalg.norm(b.astype(jnp.float64)))
    pc = neumann_banded(op.bands, op.offsets, sweeps=2)
    ref = pipelined_cg_solve(op, b, tol=tol, precond=pc)
    res = dia_cg_solve_stream_pcg(
        op, b, tol=tol, rows=8, cols=128, interpret=True
    )
    assert bool(res.converged) and not bool(res.breakdown)
    assert abs(int(res.iterations) - int(ref.iterations)) <= 1
    np.testing.assert_allclose(
        np.asarray(res.x, np.float64),
        np.asarray(ref.x, np.float64),
        rtol=3e-3,
        atol=1e-2 * float(jnp.max(jnp.abs(ref.x))),
    )


def test_stream_pcg_true_residual_and_saves_iterations(problem32):
    dia, op, b = problem32
    tol = 1e-3 * float(jnp.linalg.norm(b.astype(jnp.float64)))
    plain = dia_cg_solve_stream(
        op, b, tol=tol, rows=8, cols=128, interpret=True
    )
    res = dia_cg_solve_stream_pcg(
        op, b, tol=tol, rows=8, cols=128, interpret=True
    )
    x = np.asarray(res.x, np.float64)
    bb = np.asarray(b, np.float64)
    A = dia.to_dense()
    assert np.linalg.norm(A @ x - bb) / np.linalg.norm(bb) < 1e-2
    # degree-1 Neumann on the reference Laplacian: expect a real
    # iteration saving, not parity (the kernel's raison d'etre)
    assert int(res.iterations) < int(plain.iterations)


def test_stream_pcg_3d_stencil_cross_row_offsets():
    """7-diagonal 3-D stencil, offsets (144) > cols=128: q > 1 shifts
    plus the DOUBLED (2*p_rows) margin of the chained apply."""
    dia = lap3d_fd(12)  # N = 1728
    op = DiaOperator.from_host(dia, dtype=jnp.float32)
    b = jnp.asarray(
        np.random.default_rng(5).standard_normal(1728), jnp.float32
    )
    tol = 1e-3 * float(jnp.linalg.norm(b.astype(jnp.float64)))
    pc = neumann_banded(op.bands, op.offsets, sweeps=2)
    ref = pipelined_cg_solve(op, b, tol=tol, precond=pc)
    res = dia_cg_solve_stream_pcg(
        op, b, tol=tol, rows=8, cols=128, interpret=True
    )
    assert bool(res.converged)
    assert abs(int(res.iterations) - int(ref.iterations)) <= 1
    np.testing.assert_allclose(
        np.asarray(res.x, np.float64),
        np.asarray(ref.x, np.float64),
        rtol=3e-3,
        atol=1e-2,
    )


def test_stream_pcg_maxiter_cap_and_zero_rhs():
    n = 1024
    dia = lap2d_reference(n)
    op = DiaOperator.from_host(dia, dtype=jnp.float32)
    b = jnp.asarray(source_term(n), jnp.float32)
    res = dia_cg_solve_stream_pcg(
        op, b, tol=0.0, maxiter=23, rows=8, cols=128, interpret=True
    )
    assert int(res.iterations) == 23
    assert not bool(res.converged)
    res0 = dia_cg_solve_stream_pcg(
        op, jnp.zeros(n, jnp.float32), rows=8, cols=128, interpret=True
    )
    assert bool(res0.converged)
    assert int(res0.iterations) == 0


def test_stream_input_validation():
    dia = lap2d_reference(256)
    b64 = jnp.asarray(source_term(256))
    with pytest.raises(TypeError, match="fp64"):
        dia_cg_solve_stream(DiaOperator.from_host(dia), b64)
    op32 = DiaOperator.from_host(dia, dtype=jnp.float32)
    with pytest.raises(ValueError, match="multiple of 128"):
        dia_cg_solve_stream(
            op32, b64.astype(jnp.float32), cols=100, interpret=True
        )


# --- grid-stride padding (pad_stride) ------------------------------------


def test_pad_stride_exact_2d():
    """pad_stride packs each grid row to a multiple of cols, turning
    the ±g offsets into free row shifts. Must match the unpadded
    kernel to f32 rounding (block boundaries move, so reductions
    reassociate) with identical iteration counts."""
    from cgx.mats.generators import lap2d_fd

    dia = lap2d_fd(64)
    op = DiaOperator.from_host(dia, dtype=jnp.float32)
    b = jnp.asarray(source_term(64 * 64), jnp.float32)
    tol = 1e-4 * float(jnp.linalg.norm(b.astype(jnp.float64)))
    for solver in (dia_cg_solve_stream, dia_cg_solve_stream_pcg):
        r0 = solver(
            op, b, tol=tol, rows=16, cols=128, interpret=True,
            pad_stride=False,
        )
        r1 = solver(
            op, b, tol=tol, rows=16, cols=128, interpret=True,
            pad_stride=True,
        )
        assert int(r0.iterations) == int(r1.iterations)
        nx = float(jnp.linalg.norm(r0.x))
        assert float(jnp.linalg.norm(r0.x - r1.x)) < 1e-5 * nx


def test_pad_stride_exact_3d():
    """3-D 7-point stencil: the candidate scorer must pick a stride
    that actually frees rolls (g² frees ±g² cheaply; forcing also
    allows the expensive stride=g) and stay exact."""
    dia = lap3d_fd(12)
    op = DiaOperator.from_host(dia, dtype=jnp.float32)
    b = jnp.asarray(
        np.random.default_rng(7).standard_normal(1728), jnp.float32
    )
    tol = 1e-3 * float(jnp.linalg.norm(b.astype(jnp.float64)))
    r0 = dia_cg_solve_stream(
        op, b, tol=tol, rows=8, cols=128, interpret=True,
        pad_stride=False,
    )
    r1 = dia_cg_solve_stream(
        op, b, tol=tol, rows=8, cols=128, interpret=True,
        pad_stride=True,
    )
    assert abs(int(r0.iterations) - int(r1.iterations)) <= 1
    np.testing.assert_allclose(
        np.asarray(r1.x, np.float64),
        np.asarray(r0.x, np.float64),
        rtol=3e-3,
        atol=1e-2,
    )


def test_pad_stride_quasi_stencil_refused():
    """The quasi-stencil's ±1 band couples across grid-row boundaries:
    padding would change the matrix. 'auto' must silently skip it
    (same iterates as pad_stride=False); True must raise."""
    dia = lap2d_reference(2000)
    op = DiaOperator.from_host(dia, dtype=jnp.float32)
    b = jnp.asarray(source_term(2000), jnp.float32)
    with pytest.raises(ValueError, match="couples across"):
        dia_cg_solve_stream(
            op, b, tol=0.0, maxiter=3, rows=8, cols=128,
            interpret=True, pad_stride=True,
        )
    r_auto = dia_cg_solve_stream(
        op, b, tol=0.0, maxiter=5, rows=8, cols=128, interpret=True,
        pad_stride="auto",
    )
    r_off = dia_cg_solve_stream(
        op, b, tol=0.0, maxiter=5, rows=8, cols=128, interpret=True,
        pad_stride=False,
    )
    np.testing.assert_array_equal(
        np.asarray(r_auto.x), np.asarray(r_off.x)
    )


def test_pad_stride_auto_rejects_coupling_within_overhead():
    """'auto' must reach the boundary-coupling check (not just the
    overhead cap) and silently return None when a cheap candidate
    exists but couples across rows — and fall back to the next-scored
    candidate when only the best-scored one couples."""
    from cgx.ops.cg_stream import _auto_pad_stride

    # offsets (0, ±1, ±123), cols=128: round_up(123,128)=128 is only
    # 4.1% overhead — under the 6% cap — so 'auto' proceeds to the
    # device check; the ±1 bands are nonzero everywhere (quasi-style),
    # so padding must be refused.
    n = 123 * 40
    bands = jnp.ones((5, n), jnp.float32)
    offsets = (-123, -1, 0, 1, 123)
    assert _auto_pad_stride(offsets, 128, bands, "auto") is None
    with pytest.raises(ValueError, match="couples across"):
        _auto_pad_stride(offsets, 128, bands, True)

    # 9-point-style tie: strides 121 and 123 both free 2 rolls; 123
    # has the lower padding overhead so it is scored best, but its
    # boundary check fails — the clean runner-up (121) must still be
    # found instead of giving up.
    i = np.arange(123 * 121 * 2)
    b9 = np.zeros((7, len(i)), np.float32)
    off9 = (-123, -121, -1, 0, 1, 121, 123)
    b9[3] = 4.0
    b9[1] = b9[5] = -1.0  # ±121: c=0 under stride 121, exact there
    # ±1 (c=±1) and ±123 (c=±2 under stride 121): zero at the
    # stride-121 boundaries so stride=121 is exact — but nonzero at
    # plenty of stride-123 boundaries, so stride=123 couples (as do
    # the full ±121 bands under 123, where they carry c=∓2).
    edge121 = np.isin(i % 121, (0, 1, 119, 120))
    for d in (0, 2, 4, 6):
        b9[d] = np.where(edge121, 0.0, -1.0)
    got = _auto_pad_stride(off9, 128, jnp.asarray(b9), True)
    assert got is not None and got[0] == 121


def test_pad_stride_packed_bands_cached():
    """Repeated solves with the same operator must not re-pack the
    (ndiag, n) band array (the verdict cache carries it)."""
    from unittest import mock

    import cgx.ops.cg_stream as cs
    from cgx.mats.generators import lap2d_fd

    dia = lap2d_fd(64)
    op = DiaOperator.from_host(dia, dtype=jnp.float32)
    b = jnp.asarray(source_term(64 * 64), jnp.float32)
    kw = dict(tol=0.0, maxiter=2, rows=16, cols=128, interpret=True,
              pad_stride=True)
    dia_cg_solve_stream(op, b, **kw)
    with mock.patch.object(
        cs, "_stride_pack_bands_jit",
        side_effect=AssertionError("bands re-packed on a warm solve"),
    ):
        dia_cg_solve_stream(op, b, **kw)


def test_stream_bf16_bands_exact_stencil():
    """bf16 band planes (round-3 traffic lever): on a bf16-exact
    stencil (lap2d values 4/-1) the rounded operator IS the operator,
    so convergence and the true residual match the fp32-band kernel."""
    from cgx.mats.generators import lap2d_fd

    g = 24
    n = g * g
    dia = lap2d_fd(g)
    op = DiaOperator.from_host(dia, dtype=jnp.float32)
    b = jnp.asarray(source_term(n), jnp.float32)
    tol = 1e-4 * float(jnp.linalg.norm(b.astype(jnp.float64)))
    ref = dia_cg_solve_stream(
        op, b, tol=tol, maxiter=2 * n, rows=8, cols=128, interpret=True,
    )
    lo = dia_cg_solve_stream(
        op, b, tol=tol, maxiter=2 * n, rows=8, cols=128, interpret=True,
        bands_dtype=jnp.bfloat16,
    )
    assert bool(lo.converged)
    assert int(lo.iterations) == int(ref.iterations)
    xr = np.asarray(ref.x, np.float64)
    xl = np.asarray(lo.x, np.float64)
    bn = np.linalg.norm(np.asarray(b, np.float64))
    rel = np.linalg.norm(dia.mat_vec(xl) - np.asarray(b, np.float64)) / bn
    rel_ref = np.linalg.norm(dia.mat_vec(xr) - np.asarray(b, np.float64)) / bn
    assert rel < 2 * rel_ref + 1e-12


def test_bands_dtype_auto_exactness_gate():
    """bands_dtype='auto' takes bf16 planes only when the cast
    roundtrip is bit-exact; a non-representable operator keeps fp32 —
    both solve correctly (trajectory class pinned by iterations)."""
    import numpy as np

    from cgx.mats.generators import lap2d_fd, source_term
    from cgx.ops.cg_stream import dia_cg_solve_stream
    from cgx.solver.operators import DiaOperator

    g = 32
    n = g * g
    dia = lap2d_fd(g)  # integer stencil: bf16-exact
    op = DiaOperator(jnp.asarray(dia.bands, jnp.float32),
                     tuple(dia.offsets))
    b = jnp.asarray(source_term(n), jnp.float32)
    bn = float(jnp.linalg.norm(b))
    r_auto = dia_cg_solve_stream(op, b, tol=1e-4 * bn, maxiter=4000,
                                 rows=8, cols=128, interpret=True,
                                 bands_dtype="auto")
    r_fp32 = dia_cg_solve_stream(op, b, tol=1e-4 * bn, maxiter=4000,
                                 rows=8, cols=128, interpret=True)
    assert bool(r_auto.converged)
    assert int(r_auto.iterations) == int(r_fp32.iterations)

    # perturb one band value so the bf16 roundtrip is INEXACT: auto
    # must keep fp32 (identical iterate to the explicit-fp32 run)
    bands2 = np.asarray(dia.bands, np.float32)
    bands2[0, 7] += 1e-3  # not bf16-representable exactly
    op2 = DiaOperator(jnp.asarray(bands2), tuple(dia.offsets))
    r2_auto = dia_cg_solve_stream(op2, b, tol=1e-4 * bn, maxiter=4000,
                                  rows=8, cols=128, interpret=True,
                                  bands_dtype="auto")
    r2_fp32 = dia_cg_solve_stream(op2, b, tol=1e-4 * bn, maxiter=4000,
                                  rows=8, cols=128, interpret=True)
    np.testing.assert_array_equal(np.asarray(r2_auto.x),
                                  np.asarray(r2_fp32.x))
