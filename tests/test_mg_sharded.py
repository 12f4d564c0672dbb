"""Sharded multigrid-preconditioned CG tests (8 virtual devices)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cgx.mats.generators import lap2d_fd, source_term
from cgx.parallel.mesh import make_mesh
from cgx.parallel.mg_sharded import sharded_mg_cg_solve
from cgx.parallel.sharded_cg import sharded_cg_solve


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(8)


def test_sharded_mg_matches_plain_and_slashes_iterations(mesh):
    g = 128
    dia = lap2d_fd(g)
    b = source_term(g * g)
    plain = sharded_cg_solve(dia, b, mesh=mesh, tol=1e-10)
    mg = sharded_mg_cg_solve(dia, b, mesh=mesh, tol=1e-10)
    assert bool(mg.converged)
    assert int(mg.iterations) < 0.1 * int(plain.iterations)
    np.testing.assert_allclose(
        np.asarray(mg.x), np.asarray(plain.x), rtol=1e-6, atol=1e-6
    )


def test_sharded_mg_grid_independence(mesh):
    ks = {}
    for g in (64, 128, 256):
        dia = lap2d_fd(g)
        b = source_term(g * g)
        res = sharded_mg_cg_solve(dia, b, mesh=mesh, tol=1e-10)
        assert bool(res.converged), g
        ks[g] = int(res.iterations)
    assert ks[256] < 2 * ks[64], ks


def test_sharded_mg_rejects_bad_geometry(mesh):
    dia = lap2d_fd(66)  # 66 not divisible by 8
    b = source_term(66 * 66)
    with pytest.raises(ValueError, match="divide"):
        sharded_mg_cg_solve(dia, b, mesh=mesh)


def test_sharded_mg_few_devices():
    g = 64
    dia = lap2d_fd(g)
    b = source_term(g * g)
    res = sharded_mg_cg_solve(dia, b, mesh=make_mesh(2), tol=1e-8)
    assert bool(res.converged)
    x = np.asarray(res.x)
    rel = np.linalg.norm(dia.mat_vec(x) - b) / np.linalg.norm(b)
    assert rel < 1e-9


def test_sharded_bilinear_transfers_match_single_device(mesh):
    """The halo'd sharded bilinear restrict/prolong must equal the
    single-device operators on the same global data (adjoint pair)."""
    from functools import partial

    from jax.sharding import NamedSharding, PartitionSpec as P

    from cgx.parallel.mg_sharded import _ShardedVCycle
    from cgx.solver.multigrid import MGPreconditioner

    g, p = 32, 8
    vc = _ShardedVCycle(
        "rows", p, (g,), ((0,),), (1.0,), 1, 1, 1.0, "bilinear"
    )
    rng = np.random.default_rng(3)
    f = rng.standard_normal(g * g)
    e = rng.standard_normal((g // 2) * (g // 2))

    m = mesh if mesh.devices.size == p else make_mesh(p)
    f_dev = jax.device_put(f, NamedSharding(m, P("rows")))
    e_dev = jax.device_put(e, NamedSharding(m, P("rows")))

    r_sh = jax.jit(jax.shard_map(
        partial(vc._restrict_bilinear, level=0), mesh=m,
        in_specs=P("rows"), out_specs=P("rows"), check_vma=False,
    ))(f_dev)
    p_sh = jax.jit(jax.shard_map(
        partial(vc._prolong_bilinear, level=0), mesh=m,
        in_specs=P("rows"), out_specs=P("rows"), check_vma=False,
    ))(e_dev)

    want_r = MGPreconditioner._restrict_bilinear(jnp.asarray(f), g)
    want_p = MGPreconditioner._prolong_bilinear(jnp.asarray(e), g // 2)
    np.testing.assert_allclose(np.asarray(r_sh), np.asarray(want_r), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(p_sh), np.asarray(want_p), rtol=1e-12)
    # adjointness: <P e, f> == <e, R f>
    lhs = float(np.dot(np.asarray(want_p), f))
    rhs = float(np.dot(e, np.asarray(want_r)))
    assert abs(lhs - rhs) < 1e-10 * max(abs(lhs), 1.0)


def test_sharded_mg_bilinear_beats_aggregation(mesh):
    g = 128
    dia = lap2d_fd(g)
    b = source_term(g * g)
    agg = sharded_mg_cg_solve(dia, b, mesh=mesh, tol=1e-10,
                              transfer="aggregation")
    bil = sharded_mg_cg_solve(dia, b, mesh=mesh, tol=1e-10)
    assert bool(bil.converged)
    assert int(bil.iterations) < int(agg.iterations)
    np.testing.assert_allclose(
        np.asarray(bil.x), np.asarray(agg.x), rtol=1e-6, atol=1e-6
    )


def test_sharded_mg_3d(mesh):
    """3-D sharded V-cycle (trilinear transfers with PLANE halos):
    matches the single-device 3-D MG-PCG and slashes iterations."""
    from cgx.mats.generators import lap3d_fd
    from cgx.solver.cg import cg_solve
    from cgx.solver.multigrid import mg_preconditioner
    from cgx.solver.operators import DiaOperator

    g = 32
    dia = lap3d_fd(g)
    b = source_term(g**3)
    dist = sharded_mg_cg_solve(dia, b, mesh=mesh, ndim=3, tol=1e-10)
    assert bool(dist.converged)
    op = DiaOperator.from_host(dia)
    mg = mg_preconditioner(dia, ndim=3)
    single = cg_solve(op, jnp.asarray(b), tol=1e-10, precond=mg.apply)
    # same transfers/hierarchy -> same trajectory to rounding
    assert abs(int(dist.iterations) - int(single.iterations)) <= 1
    x = np.asarray(dist.x)
    rel = np.linalg.norm(dia.mat_vec(x) - b) / np.linalg.norm(b)
    assert rel < 1e-11
    plain = sharded_cg_solve(dia, b, mesh=mesh, tol=1e-10)
    assert int(dist.iterations) < 0.2 * int(plain.iterations)


def test_sharded_mg_gs_smoother(mesh):
    """Sharded multicolor Gauss-Seidel: matches the single-device GS
    trajectory and beats the Richardson count (measured g=128:
    12 -> 9)."""
    from cgx.solver.cg import cg_solve
    from cgx.solver.multigrid import mg_preconditioner
    from cgx.solver.operators import DiaOperator

    g = 128
    dia = lap2d_fd(g)
    b = source_term(g * g)
    rich = sharded_mg_cg_solve(dia, b, mesh=mesh, tol=1e-10)
    gs = sharded_mg_cg_solve(dia, b, mesh=mesh, tol=1e-10, smoother="gs")
    assert bool(gs.converged) and not bool(gs.breakdown)
    assert int(gs.iterations) < int(rich.iterations)
    single = cg_solve(
        DiaOperator.from_host(dia),
        jnp.asarray(b),
        tol=1e-10,
        precond=mg_preconditioner(dia, smoother="gs").apply,
    )
    assert abs(int(gs.iterations) - int(single.iterations)) <= 1
    x = np.asarray(gs.x)
    rel = np.linalg.norm(dia.mat_vec(x) - b) / np.linalg.norm(b)
    assert rel < 1e-11


def test_sharded_mg_gs_rejects_unknown(mesh):
    dia = lap2d_fd(64)
    with pytest.raises(ValueError, match="unknown smoother"):
        sharded_mg_cg_solve(
            dia, source_term(64 * 64), mesh=mesh, smoother="sor"
        )


def test_sharded_mg_block_cg(mesh):
    """Sharded MG-preconditioned breakdown-free block CG: the
    production multi-RHS path — grid-independent counts for the whole
    block (incl. a duplicate column), matching the single-device
    MG-block trajectory."""
    from cgx.parallel.mg_sharded import sharded_mg_block_cg_solve
    from cgx.solver.blockcg import block_cg_solve
    from cgx.solver.multigrid import mg_preconditioner
    from cgx.solver.operators import DiaOperator

    g = 64
    fd = lap2d_fd(g)
    n = g * g
    b0 = source_term(n)
    rng = np.random.default_rng(0)
    B = np.stack([b0, rng.standard_normal(n), b0], axis=1)
    dist = sharded_mg_block_cg_solve(
        fd, B, mesh=mesh, tol=1e-10, smoother="gs"
    )
    assert bool(dist.converged.all()) and not bool(dist.breakdown)
    assert int(dist.iterations) < 20
    single = block_cg_solve(
        DiaOperator.from_host(fd),
        jnp.asarray(B),
        tol=1e-10,
        precond=mg_preconditioner(fd, smoother="gs").apply,
    )
    assert abs(int(dist.iterations) - int(single.iterations)) <= 1
    a = fd.to_dense()
    X = np.asarray(dist.x)
    for j in range(3):
        rel = np.linalg.norm(a @ X[:, j] - B[:, j]) / np.linalg.norm(B[:, j])
        assert rel < 1e-11


def test_sharded_mg_block_rejects_1d(mesh):
    from cgx.parallel.mg_sharded import sharded_mg_block_cg_solve

    with pytest.raises(ValueError, match="must be"):
        sharded_mg_block_cg_solve(
            lap2d_fd(64), source_term(64 * 64), mesh=mesh
        )


def test_sharded_mg_fp32_cycle(mesh):
    """cycle_precision='fp32': the whole sharded V-cycle at fp32 inside
    fp64 CG — iteration-count neutral, fp64-quality answers (the
    multi-chip analogue of MGPreconditioner.apply_mixed)."""
    g = 128
    dia = lap2d_fd(g)
    b = source_term(g * g)
    full = sharded_mg_cg_solve(dia, b, mesh=mesh, tol=1e-10, smoother="gs")
    mixed = sharded_mg_cg_solve(
        dia, b, mesh=mesh, tol=1e-10, smoother="gs", cycle_precision="fp32"
    )
    assert bool(mixed.converged)
    assert abs(int(mixed.iterations) - int(full.iterations)) <= 1
    x = np.asarray(mixed.x)
    rel = np.linalg.norm(dia.mat_vec(x) - b) / np.linalg.norm(b)
    assert rel < 1e-11


def test_sharded_mg_block_fp32_cycle(mesh):
    from cgx.parallel.mg_sharded import sharded_mg_block_cg_solve

    g = 64
    dia = lap2d_fd(g)
    b0 = source_term(g * g)
    B = np.stack([b0, 0.3 * b0 + 2.0], axis=1)
    blk = sharded_mg_block_cg_solve(
        dia, B, mesh=mesh, tol=1e-10, cycle_precision="fp32"
    )
    assert bool(blk.converged.all()) and not bool(blk.breakdown)
    X = np.asarray(blk.x)
    for j in range(2):
        rel = np.linalg.norm(dia.mat_vec(X[:, j]) - B[:, j]) / (
            np.linalg.norm(B[:, j])
        )
        assert rel < 1e-11


def test_sharded_mg_rejects_bad_cycle_precision(mesh):
    with pytest.raises(ValueError, match="cycle_precision"):
        sharded_mg_cg_solve(
            lap2d_fd(64), source_term(64 * 64), mesh=mesh,
            cycle_precision="bf16",
        )


def test_sharded_mg_float32_b(mesh):
    """Regression (ADVICE r1): a float32 b under jax_enable_x64 must
    build a float32 hierarchy — the while_loop carry has to be
    dtype-homogeneous with the solve dtype taken from b, not from the
    global x64 flag."""
    g = 64
    dia = lap2d_fd(g)
    b = source_term(g * g).astype(np.float32)
    res = sharded_mg_cg_solve(dia, b, mesh=mesh, tol=1e-5)
    assert res.x.dtype == jnp.float32
    assert bool(res.converged)
    x = np.asarray(res.x, np.float64)
    rel = np.linalg.norm(dia.mat_vec(x) - b) / np.linalg.norm(b)
    assert rel < 1e-4


def test_sharded_mg_block_float32_b(mesh):
    """Same regression for the block path (solve() multi-RHS with
    precision='fp32' + precond='mg' on a mesh)."""
    from cgx.parallel.mg_sharded import sharded_mg_block_cg_solve

    g = 64
    dia = lap2d_fd(g)
    rs = np.random.default_rng(5)
    bb = rs.standard_normal((g * g, 2)).astype(np.float32)
    res = sharded_mg_block_cg_solve(dia, bb, mesh=mesh, tol=1e-4)
    assert res.x.dtype == jnp.float32
    x = np.asarray(res.x, np.float64)
    r = dia.to_dense() @ x - bb
    rel = np.linalg.norm(r, axis=0) / np.linalg.norm(bb, axis=0)
    assert np.all(rel < 1e-3), rel
