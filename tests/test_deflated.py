"""Deflated CG (spectral recycling across solve sequences) tests."""

import jax.numpy as jnp
import numpy as np
import pytest

from cgx import (
    DeflationBasis,
    DiaOperator,
    cg_solve,
    deflated_cg_solve,
    lanczos_ritz,
    lap2d_reference,
    source_term,
)


@pytest.fixture(scope="module")
def problem():
    n = 400
    dia = lap2d_reference(n)
    return dia, DiaOperator.from_host(dia)


def test_lanczos_ritz_quality(problem):
    """Ritz vectors approximate the lowest eigenvectors: Rayleigh
    quotients near the true lowest eigenvalues, orthonormal basis."""
    dia, op = problem
    w_mat = lanczos_ritz(op, dia.shape[0], 4, m=80)
    assert w_mat.shape == (400, 4)
    np.testing.assert_allclose(w_mat.T @ w_mat, np.eye(4), atol=1e-10)
    a = dia.to_dense()
    evals = np.linalg.eigvalsh(a)
    rq = np.sort(np.diag(w_mat.T @ a @ w_mat))
    # converged-pair filtering may skip an unconverged member of a
    # degenerate cluster, so the kept pairs are low-but-not-exactly-
    # the-lowest: the smallest two must match exactly, the rest stay
    # within the bottom 3% of the spectrum
    np.testing.assert_allclose(rq[:2], evals[:2], rtol=1e-8)
    assert np.all(rq <= evals[int(0.03 * len(evals))])


def test_deflated_cuts_iterations(problem):
    """Gains grow with the deflated count k (this spectrum's low end
    is dense): k=16 roughly halves, k=32 better still."""
    dia, op = problem
    b = jnp.asarray(source_term(dia.shape[0]))
    plain = cg_solve(op, b, tol=1e-10)
    k16 = deflated_cg_solve(
        op, b, DeflationBasis.from_lanczos(op, k=16, m=256), tol=1e-10
    )
    assert bool(k16.converged) and not bool(k16.breakdown)
    assert int(k16.iterations) < 0.6 * int(plain.iterations)
    k32 = deflated_cg_solve(
        op, b, DeflationBasis.from_lanczos(op, k=32, m=256), tol=1e-10
    )
    assert int(k32.iterations) < int(k16.iterations)
    x = np.asarray(k16.x)
    bb = np.asarray(b)
    rel = np.linalg.norm(dia.to_dense() @ x - bb) / np.linalg.norm(bb)
    assert rel < 1e-11


def test_deflated_exact_eigenvectors(problem):
    """With the exact k lowest eigenvectors the effective condition is
    lambda_{k+1}/lambda_max."""
    dia, op = problem
    a = dia.to_dense()
    _, vecs = np.linalg.eigh(a)
    basis = DeflationBasis(op, vecs[:, :8])
    b = jnp.asarray(source_term(dia.shape[0]))
    plain = cg_solve(op, b, tol=1e-8)
    defl = deflated_cg_solve(op, b, basis, tol=1e-8)
    assert int(defl.iterations) < 0.7 * int(plain.iterations)


def test_basis_reuse_across_sequence(problem):
    """One Lanczos pass amortises over a whole solve sequence."""
    dia, op = problem
    n = dia.shape[0]
    basis = DeflationBasis.from_lanczos(op, k=8)
    a = dia.to_dense()
    rng = np.random.default_rng(0)
    for _ in range(3):
        b = rng.standard_normal(n)
        res = deflated_cg_solve(op, jnp.asarray(b), basis, tol=1e-9)
        assert bool(res.converged)
        rel = np.linalg.norm(a @ np.asarray(res.x) - b) / np.linalg.norm(b)
        assert rel < 1e-9


def test_deflated_zero_rhs(problem):
    _, op = problem
    basis = DeflationBasis.from_lanczos(op, k=4)
    res = deflated_cg_solve(op, jnp.zeros(400, jnp.float64), basis)
    assert bool(res.converged) and int(res.iterations) == 0


def test_lanczos_ritz_rejects_unconverged(problem):
    """Too few Lanczos steps must raise rather than hand back a
    deflation-poisoning basis."""
    _, op = problem
    with pytest.raises(ValueError, match="Ritz"):
        lanczos_ritz(op, 400, 8, m=8, ritz_tol=1e-12)


def test_sharded_deflated_matches_single_device():
    """Row-sharded deflated CG (W sharded, one fused (2k,) psum per
    iteration): same trajectory as the single-device solver, padding
    handled."""
    import jax

    import numpy as np
    import jax.numpy as jnp

    from cgx import DiaOperator, lap2d_reference, source_term
    from cgx.parallel.mesh import make_mesh
    from cgx.parallel.sharded_cg import sharded_deflated_cg_solve
    from cgx.solver.deflated import DeflationBasis, deflated_cg_solve

    assert len(jax.devices()) >= 8
    n = 400
    dia = lap2d_reference(n)
    op = DiaOperator.from_host(dia)
    b = np.asarray(source_term(n))
    basis = DeflationBasis.from_lanczos(op, k=16)
    single = deflated_cg_solve(op, jnp.asarray(b), basis, tol=1e-10)
    dist = sharded_deflated_cg_solve(
        dia, b, k=16, mesh=make_mesh(8), tol=1e-10
    )
    assert bool(dist.converged) and not bool(dist.breakdown)
    assert abs(int(dist.iterations) - int(single.iterations)) <= 1
    rel = np.linalg.norm(dia.mat_vec(np.asarray(dist.x)) - b) / (
        np.linalg.norm(b)
    )
    assert rel < 1e-12

    # prime n forces padded rows; zero-padded W/AW keep reductions exact
    n2 = 509
    dia2 = lap2d_reference(n2)
    b2 = np.asarray(source_term(n2))
    d2 = sharded_deflated_cg_solve(
        dia2, b2, k=8, mesh=make_mesh(8), tol=1e-10
    )
    assert bool(d2.converged)
    rel2 = np.linalg.norm(dia2.mat_vec(np.asarray(d2.x)) - b2) / (
        np.linalg.norm(b2)
    )
    assert rel2 < 1e-12


def test_sharded_deflated_rejects_bad_w():
    import pytest as _pytest

    from cgx import lap2d_reference, source_term
    from cgx.parallel.sharded_cg import sharded_deflated_cg_solve

    dia = lap2d_reference(64)
    with _pytest.raises(ValueError, match="w must be"):
        sharded_deflated_cg_solve(
            dia, source_term(64), w=np.ones(64), n_devices=4
        )


# --- harvest-from-CG recycling (cg_solve_harvest) ------------------------


def test_harvest_recycles_solve_sequence(problem):
    """The recycling entry point: the first solve's own iterates yield
    a deflation basis (ZERO extra mat-vecs) that cuts subsequent
    solves' iteration counts like a dedicated-Lanczos basis does."""
    from cgx import cg_solve_harvest

    dia, op = problem
    b = jnp.asarray(source_term(400))
    res0, basis = cg_solve_harvest(op, b, k=16)
    assert bool(res0.converged)
    # the harvested solve IS a plain CG solve (same trajectory family)
    plain = cg_solve(op, b, tol=1e-10)
    assert abs(int(res0.iterations) - int(plain.iterations)) <= 1
    # basis quality: orthonormal, and deflation matches the dedicated
    # Lanczos basis within a couple of iterations on fresh RHS
    w = np.asarray(basis.w)
    np.testing.assert_allclose(
        w.T @ w, np.eye(w.shape[1]), atol=1e-10
    )
    rng = np.random.default_rng(7)
    a = dia.to_dense()
    bl = DeflationBasis.from_lanczos(op, k=16)
    for _ in range(2):
        b2 = jnp.asarray(rng.standard_normal(400))
        r_plain = cg_solve(op, b2, tol=1e-10)
        r_defl = deflated_cg_solve(op, b2, basis, tol=1e-10)
        r_lref = deflated_cg_solve(op, b2, bl, tol=1e-10)
        assert bool(r_defl.converged)
        rel = np.linalg.norm(
            a @ np.asarray(r_defl.x) - np.asarray(b2)
        ) / np.linalg.norm(np.asarray(b2))
        assert rel < 1e-11
        assert int(r_defl.iterations) < 0.7 * int(r_plain.iterations)
        assert int(r_defl.iterations) <= int(r_lref.iterations) + 3


def test_harvest_window_short_of_convergence(problem):
    """A window smaller than the iteration count still harvests the
    early (low-spectrum) information."""
    from cgx import cg_solve_harvest

    dia, op = problem
    b = jnp.asarray(source_term(400))
    res0, basis = cg_solve_harvest(op, b, k=8, window=48)
    assert bool(res0.converged)
    assert basis.w.shape[1] >= 1
    rng = np.random.default_rng(3)
    b2 = jnp.asarray(rng.standard_normal(400))
    r_plain = cg_solve(op, b2, tol=1e-10)
    r_defl = deflated_cg_solve(op, b2, basis, tol=1e-10)
    assert bool(r_defl.converged)
    assert int(r_defl.iterations) < int(r_plain.iterations)


def test_harvest_errors():
    from cgx import cg_solve_harvest

    dia = lap2d_reference(64)
    op = DiaOperator.from_host(dia)
    b = jnp.asarray(source_term(64))
    with pytest.raises(ValueError, match="no Ritz pair|nothing"):
        # one-iteration cap leaves nothing to harvest
        cg_solve_harvest(op, b, k=4, maxiter=1)
    with pytest.raises(TypeError, match="matvec"):
        cg_solve_harvest(np.eye(4), jnp.ones(4))


def test_sharded_harvest_and_sequence():
    """Sharded recycling path: harvest on the sharded first solve
    (window row-sharded, scalars replicated — zero extra collectives)
    and deflate the rest via sharded_deflated_cg_solve(w=...); the
    solve_sequence API drives the whole thing."""
    import cgx
    from cgx.parallel.mesh import make_mesh
    from cgx.parallel.sharded_cg import sharded_cg_solve_harvest

    n = 400
    dia = lap2d_reference(n)
    a = dia.to_dense()
    mesh = make_mesh(8)
    b0 = np.asarray(source_term(n))
    res0, w = sharded_cg_solve_harvest(dia, b0, k=16, mesh=mesh, tol=1e-10)
    assert bool(res0.converged)
    assert w.shape[0] == n and 1 <= w.shape[1] <= 16
    np.testing.assert_allclose(w.T @ w, np.eye(w.shape[1]), atol=1e-10)
    # matches the single-device harvest basis quality (same math)
    op = DiaOperator.from_host(dia)
    _, basis_sd = cgx.cg_solve_harvest(op, jnp.asarray(b0), k=16)
    rng = np.random.default_rng(11)
    bs = [b0] + [rng.standard_normal(n) for _ in range(2)]
    results = cgx.solve_sequence(dia, bs, k=16, mesh=mesh)
    assert len(results) == 3
    assert abs(int(results[0].iterations) - 108) <= 2  # plain first solve
    for res, b in zip(results, bs):
        assert bool(res.converged)
        rel = np.linalg.norm(a @ np.asarray(res.x) - b) / np.linalg.norm(b)
        assert rel < 1e-11
    # the recycled solves are materially cheaper than plain
    plain1 = cg_solve(op, jnp.asarray(bs[1]), tol=1e-10)
    assert int(results[1].iterations) < 0.7 * int(plain1.iterations)
    assert int(results[2].iterations) < 0.7 * int(plain1.iterations)


def test_solve_sequence_single_device():
    import cgx

    n = 400
    dia = lap2d_reference(n)
    a = dia.to_dense()
    rng = np.random.default_rng(13)
    bs = [np.asarray(source_term(n))] + [
        rng.standard_normal(n) for _ in range(2)
    ]
    results = cgx.solve_sequence(dia, bs, k=16)
    assert len(results) == 3
    for res, b in zip(results, bs):
        assert bool(res.converged)
        rel = np.linalg.norm(a @ np.asarray(res.x) - b) / np.linalg.norm(b)
        assert rel < 1e-11
    assert int(results[1].iterations) < int(results[0].iterations)


def test_solve_sequence_harvest_failure_degrades_to_plain():
    """A window too short to converge any Ritz pair must not sink the
    sequence: it degrades to plain CG."""
    import cgx

    n = 400
    dia = lap2d_reference(n)
    bs = [np.asarray(source_term(n))] * 2
    results = cgx.solve_sequence(
        dia, bs, k=8, window=2, config=cgx.SolveConfig(tolerance=1e-10)
    )
    assert len(results) == 2
    assert all(bool(r.converged) for r in results)
    # both plain: same iteration count
    assert int(results[0].iterations) == int(results[1].iterations)


# --- deflated PCG (deflation + preconditioner composed) ------------------


def test_deflated_pcg_composes(problem):
    """Deflation and Jacobi compose (Saad et al. 2000 Alg. 3.6): on
    the jumping-coefficient problem Jacobi removes the per-node
    coefficient scaling and deflation the remaining low modes —
    measured 95 jacobi-only -> 69 deflated-jacobi."""
    from cgx.mats.generators import poisson2d_var
    from cgx.solver.precond import jacobi as mk_jacobi

    g = 24
    n = g * g
    c = np.ones((g, g))
    c[4:10, 4:10] = 1e-4
    c[14:20, 14:20] = 1e-4
    dia = poisson2d_var(g, c)
    op = DiaOperator.from_host(dia)
    a = np.asarray(dia.to_dense())
    b = np.random.default_rng(2).standard_normal(n)
    pc = mk_jacobi(op.diagonal())
    basis = DeflationBasis.from_lanczos(op, k=16, m=256)
    jac = cg_solve(op, jnp.asarray(b), tol=1e-8, maxiter=5 * n, precond=pc)
    dj = deflated_cg_solve(
        op, jnp.asarray(b), basis, tol=1e-8, maxiter=5 * n, precond=pc
    )
    assert bool(dj.converged)
    rel = np.linalg.norm(a @ np.asarray(dj.x) - b) / np.linalg.norm(b)
    assert rel < 1e-9
    assert int(dj.iterations) < 0.85 * int(jac.iterations)


def test_sharded_deflated_pcg_matches_single():
    from cgx.mats.generators import poisson2d_var
    from cgx.parallel.sharded_cg import sharded_deflated_cg_solve
    from cgx.solver.precond import jacobi as mk_jacobi

    g = 24
    n = g * g
    c = np.ones((g, g))
    c[4:10, 4:10] = 1e-4
    c[14:20, 14:20] = 1e-4
    dia = poisson2d_var(g, c)
    op = DiaOperator.from_host(dia)
    a = np.asarray(dia.to_dense())
    b = np.random.default_rng(2).standard_normal(n)
    basis = DeflationBasis.from_lanczos(op, k=16, m=256)
    single = deflated_cg_solve(
        op, jnp.asarray(b), basis, tol=1e-8, maxiter=5 * n,
        precond=mk_jacobi(op.diagonal()),
    )
    shard = sharded_deflated_cg_solve(
        dia, b, w=np.asarray(basis.w), n_devices=8, tol=1e-8,
        maxiter=5 * n, precond="jacobi",
    )
    assert bool(shard.converged)
    rel = np.linalg.norm(a @ np.asarray(shard.x) - b) / np.linalg.norm(b)
    assert rel < 1e-9
    assert abs(int(shard.iterations) - int(single.iterations)) <= 2


def test_solve_sequence_with_precond():
    """solve_sequence composes the config preconditioner with the
    harvested deflation on every solve after the first."""
    import cgx
    from cgx.mats.generators import poisson2d_var

    g = 24
    n = g * g
    c = np.ones((g, g))
    c[4:10, 4:10] = 1e-4
    c[14:20, 14:20] = 1e-4
    dia = poisson2d_var(g, c)
    a = np.asarray(dia.to_dense())
    rng = np.random.default_rng(4)
    bs = [rng.standard_normal(n) for _ in range(3)]
    cfg = cgx.SolveConfig(tolerance=1e-8, maxiter=5 * n, precond="jacobi")
    results = cgx.solve_sequence(dia, bs, cfg, k=16, window=256)
    assert all(bool(r.converged) for r in results)
    for r, b in zip(results, bs):
        rel = np.linalg.norm(a @ np.asarray(r.x) - b) / np.linalg.norm(b)
        assert rel < 1e-9
    # later solves benefit from BOTH deflation and jacobi: they beat
    # the plain harvesting first solve by a wide margin
    assert int(results[1].iterations) < 0.25 * int(results[0].iterations)


def test_deflated_history(problem):
    dia, op = problem
    b = jnp.asarray(source_term(400))
    basis = DeflationBasis.from_lanczos(op, k=8)
    res = deflated_cg_solve(op, b, basis, tol=1e-10, history=64)
    h = np.asarray(res.history)
    assert h.shape == (64,)
    k = int(res.iterations)
    assert np.isfinite(h[: min(k + 1, 64)]).all()
    assert (np.diff(np.log(h[: min(k, 63)])) < 1.0).all()  # broadly decreasing


def test_solve_sequence_varying_operators():
    """Slowly-varying A_t: the basis harvested from A_0 is reused; per
    step only A_t W and the (k, k) inverse are rebuilt. With a 1%
    coefficient drift the recycled solves stay far below plain CG."""
    import cgx
    from cgx.mats.generators import poisson2d_var

    g = 20
    n = g * g
    rng = np.random.default_rng(6)
    base = np.exp(0.3 * rng.standard_normal((g, g)))
    mats = [
        poisson2d_var(g, base * (1.0 + 0.01 * t * rng.standard_normal((g, g))))
        for t in range(3)
    ]
    bs = [rng.standard_normal(n) for _ in range(3)]
    results = cgx.solve_sequence(mats, bs, k=16)
    assert len(results) == 3
    for m, r, b in zip(mats, results, bs):
        a = np.asarray(m.to_dense())
        rel = np.linalg.norm(a @ np.asarray(r.x) - b) / np.linalg.norm(b)
        assert bool(r.converged) and rel < 1e-11
    plain1 = cg_solve(
        DiaOperator.from_host(mats[1]), jnp.asarray(bs[1]), tol=1e-10
    )
    assert int(results[1].iterations) < int(plain1.iterations)
    # mismatched lengths rejected
    with pytest.raises(ValueError, match="matrices for"):
        cgx.solve_sequence(mats[:2], bs, k=8)


def test_solve_sequence_warm_start():
    """warm_start=True seeds each solve with the previous x: on
    smoothly varying right-hand sides the recycled solves get cheaper
    still (deflation + warm start compose — the init projector
    re-centres any x0)."""
    import cgx

    n = 400
    dia = lap2d_reference(n)
    a = dia.to_dense()
    b0 = np.asarray(source_term(n))
    bs = [b0, b0 * 1.001, b0 * 1.002]
    cold = cgx.solve_sequence(dia, bs, k=16)
    warm = cgx.solve_sequence(dia, bs, k=16, warm_start=True)
    for r, b in zip(warm, bs):
        assert bool(r.converged)
        rel = np.linalg.norm(a @ np.asarray(r.x) - b) / np.linalg.norm(b)
        assert rel < 1e-11
    assert int(warm[1].iterations) < int(cold[1].iterations)
    assert int(warm[2].iterations) < int(cold[2].iterations)
