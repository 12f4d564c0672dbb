"""s-step (communication-avoiding) CG tests."""

import jax.numpy as jnp
import numpy as np
import pytest

from cgx import DiaOperator, cg_solve, lap2d_reference, source_term
from cgx.solver.sstep import sstep_cg_solve


@pytest.fixture(scope="module")
def problem():
    n = 400
    dia = lap2d_reference(n)
    return dia, DiaOperator.from_host(dia), jnp.asarray(source_term(n))


@pytest.mark.parametrize("s", [1, 2, 4, 8])
def test_sstep_matches_classic_cg(problem, s):
    """Exact-arithmetic equivalence to classic CG. In fp64 the basis
    recurrences add rounding, so compare at a tolerance well above the
    floor (abs 1e-4 ~ rel 1e-8 here): counts within one block + a few
    rounding iterations, solutions match."""
    dia, op, b = problem
    classic = cg_solve(op, b, tol=1e-4)
    res = sstep_cg_solve(op, b, s=s, tol=1e-4)
    assert bool(res.converged) and not bool(res.breakdown)
    assert abs(int(res.iterations) - int(classic.iterations)) <= s + 3
    np.testing.assert_allclose(
        np.asarray(res.x), np.asarray(classic.x), rtol=1e-6, atol=1e-7
    )


def test_sstep_reference_tolerance_quality(problem):
    """Full solve at the reference's abs tol 1e-10 passes the
    true-residual quality gate (DEBUG-block parity)."""
    dia, op, b = problem
    res = sstep_cg_solve(op, b, s=4)
    assert bool(res.converged)
    x = np.asarray(res.x)
    bb = np.asarray(b)
    rel = np.linalg.norm(dia.to_dense() @ x - bb) / np.linalg.norm(bb)
    assert rel < 1e-11


def test_sstep_exact_bounds(problem):
    dia, op, b = problem
    w = np.linalg.eigvalsh(dia.to_dense())
    res = sstep_cg_solve(
        op, b, s=4, bounds=(float(w.min()), float(w.max())), tol=1e-10
    )
    assert bool(res.converged)


def test_sstep_zero_rhs(problem):
    dia, op, _ = problem
    res = sstep_cg_solve(op, jnp.zeros(dia.shape[0], jnp.float64), s=4)
    assert bool(res.converged)
    assert int(res.iterations) == 0


def test_sstep_maxiter_cap(problem):
    dia, op, b = problem
    res = sstep_cg_solve(op, b, s=4, tol=1e-14, maxiter=10)
    assert int(res.iterations) == 10
    assert not bool(res.converged)


def test_sstep_rejects_bad_bounds(problem):
    _, op, b = problem
    with pytest.raises(ValueError):
        sstep_cg_solve(op, b, bounds=(0.0, 8.0))


def test_sstep_sharded(problem):
    """method='sstep' over the mesh: s iterations per ONE Gram psum."""
    import jax

    from cgx.parallel.mesh import make_mesh
    from cgx.parallel.sharded_cg import sharded_cg_solve

    assert len(jax.devices()) >= 8
    dia, op, b = problem
    bb = np.asarray(b)
    w = np.linalg.eigvalsh(dia.to_dense())
    bounds = (float(w.min()), float(w.max()))
    # abs tol 1e-4 ~ rel 1e-8: above the fp64 floor, where shard-order
    # summation differences cannot swing the count by more than a block
    single = sstep_cg_solve(op, b, s=4, tol=1e-4, bounds=bounds)
    dist = sharded_cg_solve(
        dia, bb, mesh=make_mesh(8), method="sstep", tol=1e-4, bounds=bounds
    )
    assert bool(dist.converged)
    assert abs(int(dist.iterations) - int(single.iterations)) <= 4
    np.testing.assert_allclose(
        np.asarray(dist.x), np.asarray(single.x), rtol=1e-5, atol=1e-7
    )
    # and a full-depth sharded solve passes the true-residual gate
    deep = sharded_cg_solve(
        dia, bb, mesh=make_mesh(8), method="sstep", tol=1e-10, bounds=bounds
    )
    assert bool(deep.converged)
    rel = np.linalg.norm(dia.to_dense() @ np.asarray(deep.x) - bb) / np.linalg.norm(bb)
    assert rel < 1e-11


def test_sstep_api_dispatch(problem):
    import cgx

    dia, _, b = problem
    res = cgx.solve(dia, np.asarray(b), cgx.SolveConfig(method="sstep"))
    assert bool(res.converged)


def _true_rel(dia, x, b):
    from cgx.solver.chebyshev import host_matvec

    bb = np.asarray(b)
    return np.linalg.norm(host_matvec(dia)(np.asarray(x)) - bb) / (
        np.linalg.norm(bb)
    )


@pytest.mark.parametrize("s", [12, 16])
def test_sstep_deep_s_with_replacement(s):
    """s past 8 (the old practical cap): guarded residual replacement
    pins the true residual near the s=2 level at identical iteration
    counts. Measured without replacement the drift at n=2500 is
    ~1e-11; with it ~1e-13."""
    n = 2500
    dia = lap2d_reference(n)
    op = DiaOperator.from_host(dia)
    b = jnp.asarray(source_term(n))
    res = sstep_cg_solve(op, b, s=s, tol=1e-10, replace_every=2)
    assert bool(res.converged) and not bool(res.breakdown)
    assert _true_rel(dia, res.x, b) < 1e-12


def test_sstep_replacement_guard_prevents_blowup(problem):
    """replace_every=1 at small n: the eps*||r0||^2 guard must
    self-disable replacement near the explicit-residual noise floor
    instead of injecting out-of-Krylov noise (which detonates the
    alpha clamp — measured divergence to 1e+85 unguarded)."""
    dia, op, b = problem
    res = sstep_cg_solve(op, b, s=8, tol=1e-10, replace_every=1)
    assert bool(res.converged)
    assert _true_rel(dia, res.x, b) < 1e-11


def test_sstep_newton_basis(problem):
    """Leja-ordered Newton basis converges to the same quality."""
    dia, op, b = problem
    res = sstep_cg_solve(op, b, s=8, tol=1e-10, basis="newton")
    assert bool(res.converged) and not bool(res.breakdown)
    assert _true_rel(dia, res.x, b) < 1e-11


def test_sstep_rejects_unknown_basis(problem):
    _, op, b = problem
    with pytest.raises(ValueError, match="unknown s-step basis"):
        sstep_cg_solve(op, b, basis="monomial")


def test_sstep_sharded_deep_s():
    """Sharded s=12 with the default guarded replacement: true-residual
    gate at the reference tolerance over the 8-device mesh."""
    import jax

    from cgx.parallel.mesh import make_mesh
    from cgx.parallel.sharded_cg import sharded_cg_solve

    assert len(jax.devices()) >= 8
    n = 2500
    dia = lap2d_reference(n)
    b = np.asarray(source_term(n))
    dist = sharded_cg_solve(
        dia, b, mesh=make_mesh(8), method="sstep", sstep_s=12, tol=1e-10
    )
    assert bool(dist.converged)
    assert _true_rel(dia, dist.x, b) < 1e-12


def test_leja_order_properties():
    from cgx.solver.sstep import leja_order

    vals = np.array([1.0, 5.0, 2.0, 4.0, 3.0])
    out = leja_order(vals)
    assert sorted(out.tolist()) == sorted(vals.tolist())
    assert out[0] == 5.0  # starts at the largest magnitude
    # second point maximizes distance to the first
    assert out[1] == 1.0


def test_sstep_sharded_deephalo():
    """sstep_powers='deephalo': the distributed matrix-powers basis
    (one deep halo exchange per block) reproduces the per-mat-vec-halo
    trajectory and passes the reference-tolerance quality gate.
    n=2500 over 8 shards: depth s*h = 204 <= n_loc = 313."""
    import jax

    from cgx.parallel.mesh import make_mesh
    from cgx.parallel.sharded_cg import sharded_cg_solve

    assert len(jax.devices()) >= 8
    n = 2500
    dia = lap2d_reference(n)
    bb = np.asarray(source_term(n))
    w = np.linalg.eigvalsh(dia.to_dense())
    bounds = (float(w.min()), float(w.max()))
    off = sharded_cg_solve(
        dia, bb, mesh=make_mesh(8), method="sstep", tol=1e-4,
        bounds=bounds,
    )
    on = sharded_cg_solve(
        dia, bb, mesh=make_mesh(8), method="sstep", tol=1e-4,
        bounds=bounds, sstep_powers="deephalo",
    )
    assert bool(on.converged) and not bool(on.breakdown)
    assert int(on.iterations) == int(off.iterations)
    np.testing.assert_allclose(
        np.asarray(on.x), np.asarray(off.x), rtol=1e-9, atol=1e-11
    )
    deep = sharded_cg_solve(
        dia, bb, mesh=make_mesh(8), method="sstep", tol=1e-10,
        bounds=bounds, sstep_powers="deephalo",
    )
    assert bool(deep.converged)
    assert _true_rel(dia, deep.x, np.asarray(bb)) < 1e-11


def test_sstep_deephalo_depth_guard():
    """s*h beyond the shard size must fail fast with guidance."""
    from cgx.parallel.mesh import make_mesh
    from cgx.parallel.sharded_cg import sharded_cg_solve

    n = 400  # h = 21, n_loc = 50: depth 4*21 = 84 > 50
    dia = lap2d_reference(n)
    b = np.asarray(source_term(n))
    with pytest.raises(ValueError, match="halo depth"):
        sharded_cg_solve(
            dia, b, mesh=make_mesh(8), method="sstep", sstep_s=4,
            sstep_powers="deephalo",
        )


def test_sstep_deephalo_newton_basis():
    from cgx.parallel.mesh import make_mesh
    from cgx.parallel.sharded_cg import sharded_cg_solve

    n = 2500
    dia = lap2d_reference(n)
    b = np.asarray(source_term(n))
    res = sharded_cg_solve(
        dia, b, mesh=make_mesh(8), method="sstep", sstep_s=4,
        sstep_basis="newton", sstep_powers="deephalo", tol=1e-10,
    )
    assert bool(res.converged)
    assert _true_rel(dia, res.x, b) < 1e-11


@pytest.mark.parametrize("powers", ["off", "fused"])
def test_basis_rank_collapse_fallback(powers):
    """s-step's Krylov-block basis is numerically rank-deficient when
    the residual's energy collapses onto a tight eigenvalue cluster
    (the reference source term at N~1e7: measured f64 Gram spectrum
    6.2, 1e-3, 1e-4, 2e-6, then noise — Newton shifts do not help).
    The replay must FREEZE at a valid iterate, and fallback='auto'
    must then finish the solve on the plain method."""
    from cgx.mats.generators import lap2d_fd

    g = 64
    n = g * g
    dia = lap2d_fd(g)
    op = DiaOperator(jnp.asarray(dia.bands, jnp.float32),
                     tuple(dia.offsets))
    # b = the smooth lowest mode; stated lmin far above its eigenvalue
    # (~0.0047) makes every basis vector nearly parallel
    xx = np.arange(1, g + 1) / (g + 1)
    mode = np.sin(np.pi * xx)[:, None] * np.sin(np.pi * xx)[None, :]
    b = jnp.asarray(mode.ravel(), jnp.float32)
    bn = float(jnp.linalg.norm(b))
    bounds = (0.5, 8.0)
    frozen = sstep_cg_solve(
        op, b, s=4, tol=1e-5 * bn, maxiter=n, bounds=bounds,
        powers=powers, fallback="off",
    )
    assert bool(frozen.breakdown) and not bool(frozen.converged)
    # the frozen x is a VALID iterate (not corrupted): residual no
    # worse than the zero start
    rel_f = float(jnp.linalg.norm(b - op.matvec(frozen.x))) / bn
    assert rel_f <= 1.0
    res = sstep_cg_solve(
        op, b, s=4, tol=1e-5 * bn, maxiter=n, bounds=bounds,
        powers=powers, fallback="auto",
    )
    assert bool(res.converged) and not bool(res.breakdown)
    rel = float(jnp.linalg.norm(b - op.matvec(res.x))) / bn
    assert rel < 1e-4
    assert int(res.iterations) > int(frozen.iterations)


@pytest.mark.parametrize("powers", ["off", "fused"])
def test_adaptive_s_ladder_avoids_plain_restart(powers, monkeypatch):
    """fallback='adaptive' (r4 VERDICT item 8): on basis rank
    collapse, restart s-step at s//2 from the frozen iterate instead
    of abandoning the s-step economics — on this collapse scenario
    the s=2 rung finishes the solve and the plain solver is NEVER
    entered (both plain paths are rigged to raise)."""
    from cgx.mats.generators import lap2d_fd

    g = 64
    n = g * g
    dia = lap2d_fd(g)
    op = DiaOperator(jnp.asarray(dia.bands, jnp.float32),
                     tuple(dia.offsets))
    xx = np.arange(1, g + 1) / (g + 1)
    mode = np.sin(np.pi * xx)[:, None] * np.sin(np.pi * xx)[None, :]
    b = jnp.asarray(mode.ravel(), jnp.float32)
    bn = float(jnp.linalg.norm(b))
    bounds = (0.5, 8.0)

    def boom(*a, **k):
        raise AssertionError("plain-solver fallback must not run")

    import cgx.ops.cg_stream as cs
    import cgx.solver.cg as cg

    monkeypatch.setattr(cs, "dia_cg_solve_stream", boom)
    monkeypatch.setattr(cg, "cg_solve", boom)
    res = sstep_cg_solve(
        op, b, s=4, tol=1e-5 * bn, maxiter=n, bounds=bounds,
        powers=powers, fallback="adaptive",
    )
    assert bool(res.converged) and not bool(res.breakdown)
    rel = float(jnp.linalg.norm(b - op.matvec(res.x))) / bn
    # quality bound is the fp32 true-residual floor (eps32 * kappa ~
    # 2e-4 at this grid), not the recursive tol: the fused s=2 rung's
    # recursive residual under-reports by ~1e1 there (measured
    # 1.27e-4 true vs 1e-5 recursive) — the same floor class as the
    # plain fp32 solvers
    assert rel < 3e-4


def test_adaptive_s2_breakdown_falls_to_plain(monkeypatch):
    """When the LAST rung (s=2) also reports breakdown, 'adaptive'
    must drop to the plain solver exactly like 'auto'."""
    import cgx.solver.sstep as ss

    n = 400
    dia = lap2d_reference(n)
    op = DiaOperator(jnp.asarray(dia.bands, jnp.float64),
                     tuple(dia.offsets))
    b = jnp.asarray(np.asarray(source_term(n)))

    real_jit = ss._sstep_jit
    calls = []

    def broken_jit(*a, **k):
        calls.append(k.get("s"))
        res = real_jit(*a, **k)
        # forge a breakdown freeze at iteration 1 on every rung
        return res._replace(
            breakdown=jnp.asarray(True),
            converged=jnp.asarray(False),
            iterations=jnp.asarray(1),
        )

    monkeypatch.setattr(ss, "_sstep_jit", broken_jit)
    res = sstep_cg_solve(
        op, b, s=4, tol=1e-10, maxiter=n, fallback="adaptive",
    )
    # ladder visited s=4 then s=2, then classic CG finished
    assert calls == [4, 2]
    assert bool(res.converged)


def test_unknown_fallback_rejected():
    n = 100
    dia = lap2d_reference(n)
    op = DiaOperator(jnp.asarray(dia.bands, jnp.float64),
                     tuple(dia.offsets))
    with pytest.raises(ValueError, match="fallback"):
        sstep_cg_solve(op, jnp.ones(n), fallback="bogus")
