"""Triple-word float32 primitives and the TPU-native beyond-fp64
refinement (cgx.ops.tw32, cgx.solver.refine.refine_pcg_sweeps_tw).

Referee is numpy longdouble (x86 80-bit, eps ~ 5.4e-20): far below the
triple's ~2^-71 design accuracy for exactness checks, and below every
residual level asserted here.
"""

import jax.numpy as jnp
import numpy as np

from cgx import DiaOperator
from cgx.mats.generators import lap2d_fd, source_term
from cgx.ops.tw32 import (
    banded_matvec_tw, residual_tw, tw_add_tw, tw_from_f64, tw_scale_f32,
    two_prod32, two_sum32,
)


def test_two_sum32_exact():
    rng = np.random.default_rng(0)
    a = (rng.standard_normal(4096) * np.exp2(
        rng.integers(-20, 20, 4096).astype(np.float64))).astype(np.float32)
    b = (rng.standard_normal(4096) * np.exp2(
        rng.integers(-20, 20, 4096).astype(np.float64))).astype(np.float32)
    s, e = two_sum32(jnp.asarray(a), jnp.asarray(b))
    s, e = np.asarray(s), np.asarray(e)
    # fp64 is an exact referee for f32 sums
    assert np.all(s.astype(np.float64) + e.astype(np.float64)
                  == a.astype(np.float64) + b.astype(np.float64))


def test_two_prod32_exact():
    rng = np.random.default_rng(1)
    a = rng.standard_normal(4096).astype(np.float32)
    b = rng.standard_normal(4096).astype(np.float32)
    p, e = two_prod32(jnp.asarray(a), jnp.asarray(b))
    p, e = np.asarray(p), np.asarray(e)
    # 24+24 mantissa bits fit fp64 exactly
    assert np.all(p.astype(np.float64) + e.astype(np.float64)
                  == a.astype(np.float64) * b.astype(np.float64))


def test_tw_from_f64_roundtrip_exact():
    rng = np.random.default_rng(2)
    x = rng.standard_normal(4096) * np.exp2(
        rng.integers(-40, 40, 4096).astype(np.float64))
    w = tw_from_f64(jnp.asarray(x))
    back = (np.asarray(w[0], np.longdouble)
            + np.asarray(w[1], np.longdouble)
            + np.asarray(w[2], np.longdouble))
    assert np.all(back == np.asarray(x, np.longdouble))


def test_tw_add_scale_accuracy():
    rng = np.random.default_rng(3)
    x = rng.standard_normal(2048)
    y = rng.standard_normal(2048)
    a = np.float32(1.7318)
    xs = tw_scale_f32(tw_from_f64(jnp.asarray(x)), a)
    z = tw_add_tw(xs, tw_from_f64(jnp.asarray(y)))
    got = (np.asarray(z[0], np.longdouble)
           + np.asarray(z[1], np.longdouble)
           + np.asarray(z[2], np.longdouble))
    ref = (np.asarray(x, np.longdouble) * np.longdouble(a)
           + np.asarray(y, np.longdouble))
    # normalize by the OPERAND scale, not |ref|: where x*a and y cancel,
    # the meaningful error bound is eps_tw * (|x*a| + |y|)
    scale = (np.abs(np.asarray(x, np.longdouble) * np.longdouble(a))
             + np.abs(np.asarray(y, np.longdouble)))
    rel = np.max(np.abs(got - ref) / scale)
    # measured cascade floor ~2^-63 of operand scale (the fixed-length
    # cascade drops O(eps^3) terms) — 3 decades below fp64's 2.2e-16
    assert rel < 5e-19


def test_banded_matvec_tw_beats_fp64_floor():
    g = 48
    n = g * g
    dia = lap2d_fd(g)
    bands32 = jnp.asarray(dia.bands, jnp.float32)
    offsets = tuple(dia.offsets)
    rng = np.random.default_rng(4)
    x64 = rng.standard_normal(n) * 1e6
    y = banded_matvec_tw(bands32, offsets, tw_from_f64(jnp.asarray(x64)))
    got = (np.asarray(y[0], np.longdouble)
           + np.asarray(y[1], np.longdouble)
           + np.asarray(y[2], np.longdouble))
    ref = np.zeros(n, np.longdouble)
    xl = np.asarray(x64, np.longdouble)
    bl = np.asarray(dia.bands, np.longdouble)
    for d, off in enumerate(dia.offsets):
        sh = np.zeros(n, np.longdouble)
        if off == 0:
            sh = xl
        elif off > 0:
            sh[:n - off] = xl[off:]
        else:
            sh[-off:] = xl[:off]
        ref = ref + bl[d] * sh
    scale = np.max(np.abs(ref))
    err = float(np.max(np.abs(got - ref)) / scale)
    # fp64 evaluation of the same mat-vec errs at ~eps64; the triple
    # must sit far below that
    assert err < 1e-18


def test_refine_tw_below_fp64_floor():
    """End-to-end: the tw-refined solution's TRUE residual, evaluated
    on the host in longdouble, lands below what an fp64-evaluated
    residual could even measure."""
    from cgx.solver.multigrid import mg_preconditioner
    from cgx.solver.refine import refine_pcg_sweeps_tw

    g = 64
    n = g * g
    dia = lap2d_fd(g)
    op64 = DiaOperator(jnp.asarray(dia.bands), tuple(dia.offsets))
    b64 = jnp.asarray(source_term(n))
    mg32 = mg_preconditioner(op64, g, dtype=jnp.float32)
    res = refine_pcg_sweeps_tw(
        op64, b64, precond=mg32.apply, sweeps=12, rtol=1e-13,
        inner_tol=1e-6, inner_maxiter=60,
    )
    assert bool(res.converged)
    # longdouble referee of the triple-word solution
    xl = (np.asarray(res.x_words[0], np.longdouble)
          + np.asarray(res.x_words[1], np.longdouble)
          + np.asarray(res.x_words[2], np.longdouble))
    bl = np.asarray(b64, np.longdouble)
    bands = np.asarray(dia.bands, np.longdouble)
    r = bl.copy()
    for d, off in enumerate(dia.offsets):
        sh = np.zeros(n, np.longdouble)
        if off == 0:
            sh = xl
        elif off > 0:
            sh[:n - off] = xl[off:]
        else:
            sh[-off:] = xl[:off]
        r = r - bands[d] * sh
    rel = float(np.sqrt(np.sum(r * r)) / np.sqrt(np.sum(bl * bl)))
    assert rel < 1e-13
    # the device-reported tw residual must agree with the referee
    dev_rel = float(np.asarray(res.residual_norm)) / float(
        np.sqrt(np.sum(np.asarray(b64) ** 2)))
    assert abs(dev_rel - rel) < 0.2 * max(dev_rel, rel) + 1e-15
    # per-sweep history is monotone-ish and populated
    h = np.asarray(res.residual_history)
    assert np.sum(~np.isnan(h)) == res.outer_iterations


def test_residual_tw_matches_plain_at_fp64_scale():
    g = 32
    n = g * g
    dia = lap2d_fd(g)
    bands32 = jnp.asarray(dia.bands, jnp.float32)
    offsets = tuple(dia.offsets)
    rng = np.random.default_rng(5)
    x = rng.standard_normal(n)
    b = rng.standard_normal(n)
    r_tw, rnorm = residual_tw(
        bands32, offsets, tw_from_f64(jnp.asarray(b)),
        tw_from_f64(jnp.asarray(x)),
    )
    # plain fp64 evaluation agrees to ~eps64 where both can see
    op = DiaOperator(jnp.asarray(dia.bands), offsets)
    r64 = np.asarray(jnp.asarray(b) - op.matvec(jnp.asarray(x)))
    got = np.asarray(r_tw[0], np.float64) + np.asarray(r_tw[1], np.float64)
    assert np.allclose(got, r64, rtol=0, atol=1e-13 * np.max(np.abs(r64)))
    assert abs(float(rnorm) - float(np.linalg.norm(r64))) < 1e-10 * float(
        np.linalg.norm(r64))


def test_solve_precision_tw_route():
    """cgx.solve(precision='tw') reaches reference quality judged on
    the tw-evaluated true residual; longdouble referee confirms."""
    import cgx

    g = 64
    n = g * g
    dia = lap2d_fd(g)
    b = source_term(n)
    res = cgx.solve(dia, b, cgx.SolveConfig(
        precision="tw", tolerance=1e-12, precond="mg"))
    assert bool(res.converged)
    rel = float(res.residual_norm) / float(np.linalg.norm(b))
    assert rel < 1e-12


def test_tree_precond_matches_closure_precond():
    """Passing mg.apply (tree-operand path: hierarchy rides the jit
    arguments) must give the same refinement as a plain closure
    (constants path) — same sweeps, same quality."""
    from cgx.solver.multigrid import mg_preconditioner
    from cgx.solver.refine import refine_pcg_sweeps_tw

    g = 48
    n = g * g
    dia = lap2d_fd(g)
    op64 = DiaOperator(jnp.asarray(dia.bands), tuple(dia.offsets))
    b64 = jnp.asarray(source_term(n))
    mg32 = mg_preconditioner(op64, g, dtype=jnp.float32)
    r_tree = refine_pcg_sweeps_tw(
        op64, b64, precond=mg32.apply, sweeps=10, rtol=1e-12)
    r_clos = refine_pcg_sweeps_tw(
        op64, b64, precond=lambda r: mg32.apply(r), sweeps=10, rtol=1e-12)
    assert r_tree.outer_iterations == r_clos.outer_iterations
    assert bool(r_tree.converged) and bool(r_clos.converged)
    np.testing.assert_allclose(
        np.asarray(r_tree.x_words[0]), np.asarray(r_clos.x_words[0]),
        rtol=0, atol=0)


def test_split_bands_matvec_true_f64_operator():
    """split_bands_tw + banded_matvec_tw carries the TRUE f64 operator
    (round-4 item 6): on non-f32-representable bands (poisson2d_var's
    harmonic means) the split-plane product matches a longdouble oracle
    to ~2^-64, where the single-plane path is off by the f32 band
    rounding (~6e-8) — the gap a 1e-10 quality gate cannot absorb."""
    from cgx.mats.generators import poisson2d_var
    from cgx.ops.tw32 import (
        banded_matvec_tw, bands_f32_exact, split_bands_tw, tw_from_f64,
    )

    g = 32
    n = g * g
    rng = np.random.default_rng(5)
    coeff = np.exp(rng.standard_normal((g, g)))
    dia = poisson2d_var(g, coeff)
    assert not bands_f32_exact(dia.bands)
    offs = tuple(dia.offsets)
    x64 = rng.standard_normal(n)
    x_tw = tw_from_f64(jnp.asarray(x64))

    bands_ld = np.asarray(dia.bands, np.longdouble)
    ax_ld = np.zeros(n, np.longdouble)
    xl = x64.astype(np.longdouble)
    for k, off in enumerate(offs):
        i0, i1 = max(0, -off), min(n, n - off)
        ax_ld[i0:i1] += bands_ld[k, i0:i1] * xl[i0 + off : i1 + off]
    scale = float(np.max(np.abs(ax_ld)))

    planes = split_bands_tw(dia.bands)
    rec = sum(np.asarray(planes[i], np.float64) for i in range(3))
    np.testing.assert_array_equal(rec, np.asarray(dia.bands))  # exact

    def err(y):
        y_ld = sum(np.asarray(y[i], np.longdouble) for i in range(3))
        return float(np.max(np.abs(y_ld - ax_ld)) / scale)

    e_split = err(banded_matvec_tw(planes, offs, x_tw))
    e_plain = err(banded_matvec_tw(
        jnp.asarray(dia.bands, jnp.float32), offs, x_tw))
    assert e_split < 1e-17, e_split
    assert e_plain > 1e-9, e_plain  # the rounding the split removes


def test_refine_tw_offgrid_true_operator_gate():
    """refine_pcg_sweeps_tw on a variable-coefficient (non-grid-MG)
    operator with a Jacobi fp32 inner: the gate now certifies the f64
    operator (longdouble cross-check), not its f32 rounding."""
    from cgx.mats.generators import poisson2d_var, source_term
    from cgx.solver.operators import DiaOperator
    from cgx.solver.refine import refine_pcg_sweeps_tw

    g = 64
    n = g * g
    cells = 8
    board = np.where(
        (np.indices((cells, cells)).sum(axis=0) % 2).astype(bool),
        8.0, 1.0,
    )
    coeff = np.kron(board, np.ones((g // cells, g // cells)))
    dia = poisson2d_var(g, coeff)
    op64 = DiaOperator(jnp.asarray(dia.bands, jnp.float64),
                       tuple(dia.offsets))
    b64 = jnp.asarray(source_term(n), jnp.float64)
    d0 = list(dia.offsets).index(0)
    inv_diag32 = jnp.asarray(1.0 / np.asarray(dia.bands[d0]), jnp.float32)
    res = refine_pcg_sweeps_tw(
        op64, b64, precond=lambda r: r * inv_diag32, sweeps=24,
        rtol=3e-12, inner_tol=1e-6, inner_maxiter=4000,
    )
    assert bool(res.converged)
    bands_ld = np.asarray(dia.bands, np.longdouble)
    xl = sum(np.asarray(res.x_words[i], np.longdouble) for i in range(3))
    bl = np.asarray(b64, np.longdouble)
    ax = np.zeros(n, np.longdouble)
    for k, off in enumerate(dia.offsets):
        i0, i1 = max(0, -off), min(n, n - off)
        ax[i0:i1] += bands_ld[k, i0:i1] * xl[i0 + off : i1 + off]
    rel = float(np.sqrt(np.sum((ax - bl) ** 2)) / np.sqrt(np.sum(bl * bl)))
    assert rel < 1e-10, rel
