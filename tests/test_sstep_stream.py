"""Fused streaming s-step CG (cgx.ops.sstep_stream) — interpret-mode
equality against the tested XLA s-step machinery."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cgx.mats.generators import lap2d_fd, source_term
from cgx.ops.sstep_stream import (
    _sstep_gram, dia_sstep_stream_solve,
)
from cgx.solver.operators import DiaOperator
from cgx.solver.sstep import basis_columns_fn, sstep_cg_solve


def _op_b(g, dtype=jnp.float32):
    dia = lap2d_fd(g)
    op = DiaOperator(jnp.asarray(dia.bands, dtype), tuple(dia.offsets))
    b = jnp.asarray(source_term(g * g), dtype)
    return op, b


def _oracle_gram(op, p, r, s, theta, delta, shifts=()):
    cols = basis_columns_fn(op.matvec, p.dtype, theta, delta, shifts)
    v = jnp.stack(cols(p, s + 1) + cols(r, s), axis=0)
    v64 = np.asarray(v, np.float64)
    return v64 @ v64.T


@pytest.mark.parametrize("g", [32, 90])  # 1 block / 8 blocks at 8x128
def test_gram_kernel_matches_oracle(g):
    s = 4
    op, b = _op_b(g)
    n = g * g
    rng = np.random.default_rng(0)
    p = jnp.asarray(rng.standard_normal(n), jnp.float32)
    r = jnp.asarray(rng.standard_normal(n), jnp.float32)
    theta, delta = 4.0, 3.9

    from cgx.ops.dia_powers import _powers_geometry, sstep_powers_band_planes

    rows, cols = 8, 128
    n_p, _, _, _, pm, _ = _powers_geometry(
        tuple(op.offsets), s, rows, cols, jnp.float32, n
    )
    bands_pl = sstep_powers_band_planes(
        op.bands, offsets=tuple(op.offsets), s=s, rows=rows, cols=cols
    )

    def plane(v):
        return jnp.pad(v, (pm * cols, pm * cols + (n_p - n))).reshape(
            -1, cols
        )

    g2 = np.asarray(_sstep_gram(
        bands_pl, plane(p), plane(r), offsets=tuple(op.offsets), s=s,
        theta=theta, delta=delta, shifts=(), rows=rows, cols=cols,
        interpret=True,
    ), np.float64)
    got = g2[0] + g2[1]  # double-f32 cross-block accumulation
    ref = _oracle_gram(op, p, r, s, theta, delta)
    scale = np.max(np.abs(ref))
    np.testing.assert_allclose(got, ref, rtol=0, atol=2e-5 * scale)
    # the lo word must actually carry the accumulation error: folding
    # it in should be at least as accurate as hi alone
    err_hi = np.max(np.abs(g2[0] - ref))
    err_fold = np.max(np.abs(got - ref))
    assert err_fold <= err_hi + 1e-30


@pytest.mark.parametrize("g,s,rows", [(32, 4, 8), (33, 3, 8), (48, 6, 16)])
def test_stream_solve_matches_sstep(g, s, rows):
    """Parity with sstep_cg_solve, including a tail-padded size (g=33:
    n=1089 over 1024-element blocks). At s <= 4 the trajectories match
    iterate-for-iterate; at larger s the replay amplifies Gram
    reassociation noise by kappa(G) and the two VALID trajectories
    legitimately diverge (module docstring fp32 limit) — there only
    convergence + true-residual quality are asserted."""
    op, b = _op_b(g)
    bn = float(jnp.linalg.norm(b))
    tol = 1e-3 * bn
    ref = sstep_cg_solve(op, b, s=s, tol=tol, maxiter=4000)
    got = dia_sstep_stream_solve(
        op, b, s=s, tol=tol, maxiter=4000, rows=rows, cols=128,
        interpret=True,
    )
    assert bool(got.converged) and bool(ref.converged)
    rel = float(jnp.linalg.norm(b - op.matvec(got.x))) / bn
    assert rel < 3e-3
    if s <= 4:
        assert abs(int(got.iterations) - int(ref.iterations)) <= s
        np.testing.assert_allclose(
            np.asarray(got.x), np.asarray(ref.x),
            rtol=0, atol=2e-3 * float(jnp.max(jnp.abs(ref.x))),
        )


def test_stream_solve_newton_basis():
    op, b = _op_b(32)
    bn = float(jnp.linalg.norm(b))
    got = dia_sstep_stream_solve(
        op, b, s=4, tol=1e-3 * bn, maxiter=4000, rows=8, cols=128,
        basis="newton", interpret=True,
    )
    assert bool(got.converged)
    rel = float(jnp.linalg.norm(b - op.matvec(got.x))) / bn
    assert rel < 3e-3


def test_stream_solve_warm_start_and_preconv():
    op, b = _op_b(32)
    bn = float(jnp.linalg.norm(b))
    # exact-solution warm start converges in 0 iterations
    full = dia_sstep_stream_solve(
        op, b, s=4, tol=1e-4 * bn, maxiter=4000, rows=8, cols=128,
        interpret=True,
    )
    warm = dia_sstep_stream_solve(
        op, b, x0=full.x, s=4, tol=1e-3 * bn, maxiter=4000, rows=8,
        cols=128, interpret=True,
    )
    assert bool(warm.converged)
    assert int(warm.iterations) == 0


def test_stream_solve_rejects_fp64():
    op, b = _op_b(16, jnp.float64)
    with pytest.raises(TypeError):
        dia_sstep_stream_solve(op.astype(jnp.float64) if hasattr(
            op, "astype") else op, b, s=2, tol=1.0)


def test_stream_solve_large_offset_autogrows_rows():
    """Advisor r3 (high): offsets reaching further than the block tile
    (pm > rows) made the aliased recover kernel overwrite halo rows
    block j+2 still reads — silent corruption, e.g. lap3d at large
    grids. The solve must auto-grow rows and stay exact; interpret
    mode sees the semantic corruption (new data where old is needed)
    even without the DMA race."""
    from cgx.mats.generators import lap3d_fd
    from cgx.ops.dia_powers import _powers_geometry

    g = 12  # lap3d offsets ±g²=±144: pm=16 > rows=8 at cols=128
    dia = lap3d_fd(g)
    op = DiaOperator(jnp.asarray(dia.bands, jnp.float32),
                     tuple(dia.offsets))
    n = g ** 3
    rows, cols, s = 8, 128, 2
    _, _, _, _, pm, _ = _powers_geometry(
        tuple(op.offsets), s, rows, cols, jnp.float32, n
    )
    assert pm > rows, "test must exercise the auto-grow path"
    b = jnp.asarray(np.random.default_rng(3).standard_normal(n),
                    jnp.float32)
    bn = float(jnp.linalg.norm(b))
    tol = 1e-3 * bn
    ref = sstep_cg_solve(op, b, s=s, tol=tol, maxiter=4000)
    got = dia_sstep_stream_solve(
        op, b, s=s, tol=tol, maxiter=4000, rows=rows, cols=cols,
        interpret=True,
    )
    assert bool(got.converged) and bool(ref.converged)
    rel = float(jnp.linalg.norm(b - op.matvec(got.x))) / bn
    assert rel < 3e-3
    assert abs(int(got.iterations) - int(ref.iterations)) <= s


def test_recover_kernel_guards_inplace_hazard():
    """Direct internal use with pm > rows must raise, not corrupt."""
    from cgx.ops.dia_powers import _powers_geometry, \
        sstep_powers_band_planes
    from cgx.ops.sstep_stream import _sstep_recover

    op, b = _op_b(32)
    n = 32 * 32
    rows, cols, s = 8, 128, 2
    # widen the stencil artificially: a ±(rows*cols+cols) coupling
    offsets = (-(rows * cols + cols), -1, 0, 1, rows * cols + cols)
    bands = jnp.ones((5, n), jnp.float32)
    _, _, _, _, pm, _ = _powers_geometry(
        offsets, s, rows, cols, jnp.float32, n
    )
    assert pm > rows
    bands_pl = sstep_powers_band_planes(
        bands, offsets=offsets, s=s, rows=rows, cols=cols
    )
    n_p = bands_pl.shape[1] * cols - 2 * pm * cols
    plane = jnp.zeros((bands_pl.shape[1], cols), jnp.float32)
    x = jnp.zeros((n_p // cols, cols), jnp.float32)
    coef = jnp.zeros((3, 2 * s + 1), jnp.float32)
    with pytest.raises(ValueError, match="in-place hazard"):
        _sstep_recover(
            bands_pl, plane, plane, x, coef, offsets=offsets, s=s,
            theta=1.0, delta=0.5, shifts=(), rows=rows, cols=cols,
            interpret=True,
        )


def test_qf_comp_sign_safe_under_cancellation():
    """The compensated f32 quadratic form keeps ~f32 accuracy relative
    to the RESULT through heavy cancellation — where the plain f32 form
    is O(1) wrong and sign-flips (the measured s-step breakdown
    mechanism, results/hw_queue_r3/sstep_envelope*.log)."""
    from cgx.solver.sstep import _qf_comp

    rng = np.random.default_rng(0)
    m = 9
    for t in range(20):
        g_ = (rng.standard_normal((m, m)) * 1e20).astype(np.float32)
        g_ = (g_ + g_.T) / 2
        a = rng.standard_normal(m).astype(np.float32)
        gl = np.asarray(g_, np.longdouble)
        al = np.asarray(a, np.longdouble)
        v = gl @ al
        b = (al - (al @ v / (v @ v)) * v * (1 - 1e-6)).astype(np.float32)
        ref = float(al @ gl @ np.asarray(b, np.longdouble))
        got = float(_qf_comp(jnp.asarray(a), jnp.asarray(g_),
                             jnp.asarray(b)))
        assert abs(got - ref) <= 1e-5 * abs(ref)


def test_huge_norm_rhs_pow2_prescale():
    """Round-4 gate fix: the reference source term reaches ~2e8 at
    N=1e7, and the replay's products of Gram entries overflow f32 ->
    instant block-1 breakdown (results/hw_queue_r4/sstep_race_a1.json).
    The exact power-of-2 prescale makes the solve scale-equivariant
    BITWISE: solving 2**k * b returns exactly 2**k * x, for k far
    beyond where unscaled arithmetic would overflow."""
    op, b = _op_b(16)
    bn = float(jnp.linalg.norm(b))
    k = 100  # ||2**100 b||^2 ~ 1e64: hopeless without the prescale
    big = jnp.ldexp(jnp.ones((), jnp.float32), k)
    for solver in (
        lambda bb, tt: sstep_cg_solve(op, bb, s=4, tol=tt, maxiter=2000),
        lambda bb, tt: dia_sstep_stream_solve(
            op, bb, s=4, tol=tt, maxiter=2000, rows=64, cols=128,
            interpret=True,
        ),
    ):
        ref = solver(b, 1e-3 * bn)
        got = solver(b * big, 1e-3 * bn * float(big))
        assert bool(ref.converged) and bool(got.converged)
        assert not bool(got.breakdown)
        assert int(got.iterations) == int(ref.iterations)
        np.testing.assert_array_equal(
            np.asarray(got.x), np.asarray(ref.x * big)
        )


def test_bands_dtype_auto_bf16_bitwise_and_gate():
    """bands_dtype='auto' narrows the streamed band planes to bf16
    exactly when every band value round-trips (the lap2d unit stencil
    does) and the solve stays BITWISE equal to full-width planes; when
    a band value is NOT bf16-exact, 'auto' must keep f32 planes (and
    an explicit bf16 request rounds the operator consistently)."""
    g = 40
    op, b = _op_b(g)
    bn = float(jnp.linalg.norm(b))
    kw = dict(s=4, tol=1e-3 * bn, maxiter=2000, rows=8, cols=128,
              interpret=True)
    res_auto = dia_sstep_stream_solve(op, b, bands_dtype="auto", **kw)
    res_f32 = dia_sstep_stream_solve(op, b, bands_dtype=None, **kw)
    assert int(res_auto.iterations) == int(res_f32.iterations)
    np.testing.assert_array_equal(
        np.asarray(res_auto.x), np.asarray(res_f32.x)
    )

    # non-bf16-exact operator: 'auto' must not round it — the solve
    # equals the full-width one bitwise here too
    scale = jnp.float32(1.0 + 2.0 ** -12)  # not representable in bf16
    op2 = DiaOperator(op.bands * scale, tuple(op.offsets))
    assert not bool(jnp.all(
        op2.bands.astype(jnp.bfloat16).astype(jnp.float32) == op2.bands
    ))
    r_auto = dia_sstep_stream_solve(op2, b, bands_dtype="auto", **kw)
    r_f32 = dia_sstep_stream_solve(op2, b, bands_dtype=None, **kw)
    assert int(r_auto.iterations) == int(r_f32.iterations)
    np.testing.assert_array_equal(np.asarray(r_auto.x), np.asarray(r_f32.x))
