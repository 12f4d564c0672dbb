"""Geometric multigrid preconditioner tests."""

import jax.numpy as jnp
import numpy as np
import pytest

from cgx import DiaOperator, cg_solve
from cgx.mats.generators import lap2d_fd, source_term
from cgx.solver.multigrid import MGPreconditioner, mg_preconditioner


def test_mg_slashes_iterations_and_scales():
    """Iteration counts must be an order of magnitude below plain CG
    and grow sub-linearly with the grid (plain CG grows ~linearly)."""
    ks = {}
    for g in (32, 64, 128):
        dia = lap2d_fd(g)
        op = DiaOperator.from_host(dia)
        b = jnp.asarray(source_term(dia.shape[0]))
        mg = mg_preconditioner(dia, min_coarse_grid=8)
        plain = cg_solve(op, b, tol=1e-10)
        pcg = cg_solve(op, b, tol=1e-10, precond=mg.apply)
        assert bool(pcg.converged)
        assert int(pcg.iterations) < 0.25 * int(plain.iterations), g
        ks[g] = int(pcg.iterations)
        x = np.asarray(pcg.x)
        rel = np.linalg.norm(dia.mat_vec(x) - np.asarray(b)) / np.linalg.norm(
            np.asarray(b)
        )
        assert rel < 1e-11
    # near-grid-independence: doubling g twice must not double k
    assert ks[128] < 2 * ks[32]


def test_mg_spd():
    """The V-cycle must be a symmetric positive definite operator (the
    whole point of the Galerkin + scalar-Richardson + scaled-transpose
    construction)."""
    g = 16
    dia = lap2d_fd(g)
    mg = mg_preconditioner(dia, min_coarse_grid=8)
    n = g * g
    m = np.zeros((n, n))
    eye = np.eye(n)
    for i in range(n):
        m[:, i] = np.asarray(mg.apply(jnp.asarray(eye[:, i])))
    asym = np.abs(m - m.T).max() / np.abs(m).max()
    assert asym < 1e-12
    w = np.linalg.eigvalsh((m + m.T) / 2)
    assert w.min() > 0


def test_mg_rejects_non_grid():
    op = DiaOperator.from_host(lap2d_fd(8))
    with pytest.raises(ValueError):
        MGPreconditioner(op, 9)  # 81 != 64


def test_mg_inferred_grid():
    dia = lap2d_fd(32)
    mg = mg_preconditioner(dia)
    assert mg.g == 32
    assert mg.grids[0] == 32


def test_mg_3d_transfers_and_galerkin():
    """Trilinear transfers match the explicit P matrix (adjoint pair)
    and the Galerkin triple product in 3-D."""
    import jax.numpy as jnp

    from cgx.mats.generators import lap3d_fd
    from cgx.solver.multigrid import (
        MGPreconditioner,
        _bilinear_p,
        _galerkin_bilinear,
    )

    g, gc, nd = 8, 4, 3
    rng = np.random.default_rng(0)
    e = rng.standard_normal(gc**nd)
    f = rng.standard_normal(g**nd)
    pidx, pw = _bilinear_p(g, nd)
    p_mat = np.zeros((g**nd, gc**nd))
    for a in range(pw.shape[1]):
        np.add.at(p_mat, (np.arange(g**nd), pidx[:, a]), pw[:, a])
    pe = MGPreconditioner._prolong_bilinear(jnp.asarray(e), gc, nd)
    rf = MGPreconditioner._restrict_bilinear(jnp.asarray(f), g, nd)
    np.testing.assert_allclose(np.asarray(pe), p_mat @ e, rtol=1e-12)
    assert np.isclose(np.dot(p_mat @ e, f), np.dot(e, np.asarray(rf)))
    dia3 = lap3d_fd(g)
    np.testing.assert_allclose(
        _galerkin_bilinear(dia3, g, nd).to_dense(),
        p_mat.T @ dia3.to_dense() @ p_mat,
        atol=1e-12,
    )


def test_mg_3d_grid_independence():
    """7-point 3-D Laplacian: MG-PCG counts stay ~flat while plain CG
    doubles with the grid side."""
    from cgx.mats.generators import lap3d_fd
    from cgx.solver.multigrid import mg_preconditioner
    from cgx.solver.operators import DiaOperator

    ks = {}
    for g in (16, 32):
        dia = lap3d_fd(g)
        op = DiaOperator.from_host(dia)
        b = jnp.asarray(source_term(dia.shape[0]))
        mg = mg_preconditioner(dia, ndim=3)
        res = cg_solve(op, b, tol=1e-10, precond=mg.apply)
        assert bool(res.converged) and not bool(res.breakdown)
        x = np.asarray(res.x)
        rel = np.linalg.norm(dia.mat_vec(x) - np.asarray(b)) / np.linalg.norm(
            np.asarray(b)
        )
        assert rel < 1e-11
        ks[g] = int(res.iterations)
    assert ks[32] <= 1.5 * ks[16], ks


def test_infer_grid_ndim():
    from cgx.mats.generators import lap2d_fd, lap2d_reference, lap3d_fd
    from cgx.solver.multigrid import infer_grid_ndim

    d2 = lap2d_fd(64)  # N=4096 is ambiguous: 64^2 == 16^3
    assert infer_grid_ndim(d2.shape[0], d2.offsets) == 2
    d3 = lap3d_fd(16)
    assert infer_grid_ndim(d3.shape[0], d3.offsets) == 3
    q = lap2d_reference(4096)  # quasi-Laplacian, offset inc+1
    assert infer_grid_ndim(q.shape[0], q.offsets) == 2


def test_mg_precond_dispatch_3d():
    import cgx

    dia = cgx.lap3d_fd(16)
    b = cgx.source_term(dia.shape[0])
    res = cgx.solve(dia, b, cgx.SolveConfig(precond="mg"))
    assert bool(res.converged)
    assert int(res.iterations) < 25


def test_mg_fp32_vcycle_in_fp64_cg():
    """Mixed-precision MG: fp32 V-cycle apply inside fp64 CG — same
    iteration count, fp64-quality answer (the TPU fast path: the
    V-cycle does not need fp64, only the outer recurrence does)."""
    from cgx.mats.generators import lap2d_fd
    from cgx.solver.multigrid import mg_preconditioner
    from cgx.solver.operators import DiaOperator

    fd = lap2d_fd(128)
    op = DiaOperator.from_host(fd)
    b = jnp.asarray(source_term(fd.shape[0]))
    full = cg_solve(op, b, tol=1e-10, precond=mg_preconditioner(fd).apply)
    mg32 = mg_preconditioner(fd, dtype=jnp.float32)
    mixed = cg_solve(op, b, tol=1e-10, precond=mg32.apply_mixed)
    assert bool(mixed.converged) and not bool(mixed.breakdown)
    assert abs(int(mixed.iterations) - int(full.iterations)) <= 2
    x = np.asarray(mixed.x)
    bb = np.asarray(b)
    rel = np.linalg.norm(fd.to_dense() @ x - bb) / np.linalg.norm(bb)
    assert rel < 1e-11


def test_mg_gs_smoother_cuts_iterations_2d():
    """Multicolor Gauss-Seidel smoothing: fewer CG iterations than
    Richardson at the same V(2,2) depth (measured g=256: 13 -> 10)."""
    g = 128
    fd = lap2d_fd(g)
    op = DiaOperator.from_host(fd)
    b = jnp.asarray(source_term(g * g))
    rich = cg_solve(op, b, tol=1e-10, precond=mg_preconditioner(fd).apply)
    gs = cg_solve(
        op, b, tol=1e-10, precond=mg_preconditioner(fd, smoother="gs").apply
    )
    assert bool(gs.converged) and not bool(gs.breakdown)
    assert int(gs.iterations) < int(rich.iterations)
    x = np.asarray(gs.x)
    bb = np.asarray(b)
    rel = np.linalg.norm(fd.to_dense() @ x - bb) / np.linalg.norm(bb)
    assert rel < 1e-11


def test_mg_gs_spd():
    """The GS V-cycle (adjoint post-sweep ordering) must stay exactly
    symmetric positive definite — pre-sweeps colors forward, post-
    sweeps reversed, each color step A-self-adjoint."""
    g = 16
    mg = mg_preconditioner(lap2d_fd(g), min_coarse_grid=8, smoother="gs")
    n = g * g
    m = np.zeros((n, n))
    eye = np.eye(n)
    for i in range(n):
        m[:, i] = np.asarray(mg.apply(jnp.asarray(eye[:, i])))
    asym = np.abs(m - m.T).max() / np.abs(m).max()
    assert asym < 1e-12
    w = np.linalg.eigvalsh((m + m.T) / 2)
    assert w.min() > 0


def test_mg_gs_3d():
    """3-D: red-black fine level + 27-color bilinear Galerkin coarse
    levels (fori_loop sweeps keep the graph small)."""
    import cgx

    dia = cgx.lap3d_fd(16)
    b = cgx.source_term(dia.shape[0])
    res = cgx.solve(
        dia, b, cgx.SolveConfig(precond="mg", mg_smoother="gs")
    )
    assert bool(res.converged)
    assert int(res.iterations) < 15


def test_mg_gs_aggregation_transfer():
    g = 64
    fd = lap2d_fd(g)
    op = DiaOperator.from_host(fd)
    b = jnp.asarray(source_term(g * g))
    mg = mg_preconditioner(fd, transfer="aggregation", smoother="gs")
    res = cg_solve(op, b, tol=1e-10, precond=mg.apply)
    assert bool(res.converged)


def test_mg_rejects_unknown_smoother():
    with pytest.raises(ValueError, match="unknown smoother"):
        mg_preconditioner(lap2d_fd(16), smoother="sor")


def test_color_masks_cover_and_decouple():
    """Every cell gets exactly one color; same-color cells are never
    coupled by the stencil."""
    from cgx.solver.multigrid import _color_masks

    for gen, g, ndim in ((lap2d_fd, 12, 2),):
        m = gen(g)
        masks = _color_masks(g, ndim, m.offsets)
        total = np.sum(masks, axis=0)
        np.testing.assert_array_equal(total, np.ones(g**ndim))
        a = m.to_dense()
        for mask in masks:
            idx = np.nonzero(mask)[0]
            off = a[np.ix_(idx, idx)] - np.diag(np.diag(a[np.ix_(idx, idx)]))
            assert np.abs(off).max() == 0.0


def test_mg_gs_mixed_precision():
    """fp32 GS V-cycle inside fp64 CG: same counts as full-fp64 GS,
    fp64-quality answers. Also guards the fine-band cast — without it
    dtype promotion silently ran the fine-level smoothing at fp64 (and
    the GS fori_loop carry type check fails outright)."""
    g = 64
    fd = lap2d_fd(g)
    op = DiaOperator.from_host(fd)
    b = jnp.asarray(source_term(g * g))
    full = cg_solve(
        op, b, tol=1e-10, precond=mg_preconditioner(fd, smoother="gs").apply
    )
    mg32 = mg_preconditioner(fd, smoother="gs", dtype=jnp.float32)
    assert mg32.fine.dtype == jnp.float32  # the cast actually happened
    mixed = cg_solve(op, b, tol=1e-10, precond=mg32.apply_mixed)
    assert bool(mixed.converged)
    assert abs(int(mixed.iterations) - int(full.iterations)) <= 2
    x = np.asarray(mixed.x)
    bb = np.asarray(b)
    rel = np.linalg.norm(fd.to_dense() @ x - bb) / np.linalg.norm(bb)
    assert rel < 1e-11


def test_galerkin_device_matches_host():
    """The jitted scatter-add Galerkin build (VERDICT r1 item 5) must
    produce the host bincount build's exact bands — same offsets, same
    values (scatter-add order differences stay below 1e-13 rel) — for
    both transfers in 2-D and 3-D, including a second (widened) level."""
    from cgx.mats.generators import lap2d_fd, lap3d_fd
    from cgx.solver.multigrid import (
        _galerkin_bilinear,
        _galerkin_bilinear_dev,
        _galerkin_dia,
        _galerkin_dia_dev,
    )

    cases = [
        (lap2d_fd(16), 16, 2),
        (lap3d_fd(8), 8, 3),
    ]
    for host_fn, dev_fn in (
        (_galerkin_bilinear, _galerkin_bilinear_dev),
        (_galerkin_dia, _galerkin_dia_dev),
    ):
        for mat, g, nd in cases:
            h1 = host_fn(mat, g, nd)
            d1 = dev_fn(mat, g, nd)
            assert h1.offsets == d1.offsets, (host_fn.__name__, g, nd)
            np.testing.assert_allclose(
                np.asarray(d1.bands), np.asarray(h1.bands),
                rtol=1e-13, atol=1e-13,
            )
            # one more level: the widened stencil exercises the
            # candidate-offset bound and the flat-offset aliasing
            # merge (2-D only: a 3-D level-2 probe is 729 probes of
            # pure CI time without adding coverage)
            if nd == 2 and g // 2 >= 4:
                h2 = host_fn(h1, g // 2, nd)
                d2 = dev_fn(h1, g // 2, nd)
                assert h2.offsets == d2.offsets
                np.testing.assert_allclose(
                    np.asarray(d2.bands), np.asarray(h2.bands),
                    rtol=1e-13, atol=1e-13,
                )


def test_mg_preconditioner_device_setup_end_to_end():
    """galerkin_setup='device' end to end: same hierarchy, same solve."""
    from cgx.mats.generators import lap2d_fd, source_term
    from cgx.solver.cg import cg_solve
    from cgx.solver.multigrid import mg_preconditioner
    from cgx.solver.operators import DiaOperator

    g = 64
    fd = lap2d_fd(g)
    op = DiaOperator.from_host(fd)
    b = jnp.asarray(source_term(g * g))
    mg_h = mg_preconditioner(op, galerkin_setup="host")
    mg_d = mg_preconditioner(op, galerkin_setup="device")
    assert mg_h.grids == mg_d.grids
    rh = cg_solve(op, b, tol=1e-10, precond=mg_h.apply)
    rd = cg_solve(op, b, tol=1e-10, precond=mg_d.apply)
    assert bool(rd.converged)
    assert abs(int(rh.iterations) - int(rd.iterations)) <= 1
    np.testing.assert_allclose(
        np.asarray(rd.x), np.asarray(rh.x), rtol=1e-8, atol=1e-8
    )


def test_w_cycle_symmetric_and_at_least_as_strong():
    """cycle='w' (iterated symmetric coarse correction M_c(2I - A_c
    M_c)) must stay an SPD preconditioner — exact symmetry in the
    A-free inner product — and not lose to the V-cycle in CG
    iterations. F-cycles are rejected (asymmetric)."""
    import jax.numpy as jnp
    import numpy as np
    import pytest

    from cgx.mats.generators import lap2d_fd, source_term
    from cgx.solver.cg import cg_solve
    from cgx.solver.multigrid import mg_preconditioner
    from cgx.solver.operators import as_operator

    g = 64
    dia = lap2d_fd(g)
    n = dia.shape[0]
    op = as_operator(dia, dtype=jnp.float64)
    b = jnp.asarray(source_term(n))

    mg_v = mg_preconditioner(dia, cycle="v")
    mg_w = mg_preconditioner(dia, cycle="w")

    # symmetry: <M x, y> == <x, M y> for random x, y
    rs = np.random.default_rng(0)
    x = jnp.asarray(rs.standard_normal(n))
    y = jnp.asarray(rs.standard_normal(n))
    lhs = float(jnp.vdot(mg_w.apply(x), y))
    rhs = float(jnp.vdot(x, mg_w.apply(y)))
    assert abs(lhs - rhs) <= 1e-10 * max(abs(lhs), abs(rhs))

    res_v = cg_solve(op, b, tol=1e-10, maxiter=n, precond=mg_v.apply)
    res_w = cg_solve(op, b, tol=1e-10, maxiter=n, precond=mg_w.apply)
    assert bool(res_w.converged)
    assert int(res_w.iterations) <= int(res_v.iterations)

    with pytest.raises(ValueError):
        mg_preconditioner(dia, cycle="f")


def test_galerkin_probe_chunked_matches_vmap():
    """When the probe fan-out exceeds PROBE_WORDS_BUDGET the builder
    scans vmapped batches instead of one full vmap (the N=1e7 OOM fix,
    results/hw_queue_r3/fp64q_g3200_tw.log). Forcing the chunked path
    on a small grid must reproduce the host build exactly."""
    import cgx.solver.multigrid as mgmod
    from cgx.mats.generators import lap2d_fd
    from cgx.solver.multigrid import _galerkin_bilinear, galerkin_probe

    mat = lap2d_fd(24)
    host = _galerkin_bilinear(mat, 24, 2)
    old = mgmod.PROBE_WORDS_BUDGET
    mgmod.PROBE_WORDS_BUDGET = 1024  # force batch scanning
    # distinct dtype -> distinct lru_cache key -> fresh trace under the
    # patched budget
    try:
        bands, offs = galerkin_probe(
            jnp.asarray(mat.bands, jnp.float32), mat.offsets, 24, 2,
            "bilinear",
        )
    finally:
        mgmod.PROBE_WORDS_BUDGET = old
    assert offs == host.offsets
    np.testing.assert_allclose(
        np.asarray(bands), np.asarray(host.bands), rtol=2e-6, atol=2e-6,
    )
