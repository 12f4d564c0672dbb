"""Distributed CG tests on 8 virtual CPU devices.

What the reference could only test on a SLURM cluster (SURVEY §4) runs
here on fake devices: the same Mesh/shard_map code path that runs on a
real TPU slice."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cgx import DiaOperator, cg_solve, lap2d_reference, source_term
from cgx.mats.containers import DIAMatrix
from cgx.parallel.mesh import make_mesh
from cgx.parallel.partition import padded_size, partition
from cgx.parallel.sharded_cg import sharded_cg_solve

N_DEV = 8


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= N_DEV, "conftest should provide 8 cpu devices"
    return make_mesh(N_DEV)


def test_partition_reference_parity():
    """partition_matrix semantics (cg.cc:236-268): equal blocks, last
    rank absorbs the remainder."""
    starts, counts = partition(1000, 8)
    assert starts == [0, 125, 250, 375, 500, 625, 750, 875]
    assert counts == [125] * 8
    starts, counts = partition(1003, 8)
    assert counts[:-1] == [125] * 7 and counts[-1] == 1003 - 875
    starts, counts = partition(10, 1)
    assert starts == [0] and counts == [10]


def test_padded_size():
    assert padded_size(1000, 8) == 1000
    assert padded_size(1001, 8) == 1008
    assert padded_size(1000, 8, multiple=128) == 1024


@pytest.mark.parametrize("strategy", ["halo", "allgather"])
def test_dia_sharded_matches_single_device(mesh, strategy):
    n = 512
    dia = lap2d_reference(n)
    b = source_term(n)
    single = cg_solve(DiaOperator.from_host(dia), jnp.asarray(b), tol=1e-6)
    dist = sharded_cg_solve(dia, b, mesh=mesh, strategy=strategy, tol=1e-6)
    assert int(dist.iterations) == int(single.iterations)
    np.testing.assert_allclose(
        np.asarray(dist.x), np.asarray(single.x), rtol=1e-9, atol=1e-9
    )


@pytest.mark.parametrize("strategy", ["allgather", "reducescatter"])
def test_dense_sharded_matches_single_device(mesh, strategy):
    n = 256
    dia = lap2d_reference(n)
    a = dia.to_dense()
    b = source_term(n)
    single = cg_solve(DiaOperator.from_host(dia), jnp.asarray(b), tol=1e-6)
    dist = sharded_cg_solve(a, b, mesh=mesh, strategy=strategy, tol=1e-6)
    assert abs(int(dist.iterations) - int(single.iterations)) <= 1
    np.testing.assert_allclose(
        np.asarray(dist.x), np.asarray(single.x), rtol=1e-7, atol=1e-7
    )


def test_padding_is_exact(mesh):
    """N not divisible by the mesh size: padded rows must not perturb
    the solve (the analogue of the reference's uneven last block)."""
    n = 509  # prime, not divisible by 8
    dia = lap2d_reference(n)
    b = source_term(n)
    single = cg_solve(DiaOperator.from_host(dia), jnp.asarray(b), tol=1e-6)
    dist = sharded_cg_solve(dia, b, mesh=mesh, strategy="halo", tol=1e-6)
    assert dist.x.shape == (n,)
    assert int(dist.iterations) == int(single.iterations)
    np.testing.assert_allclose(
        np.asarray(dist.x), np.asarray(single.x), rtol=1e-9, atol=1e-9
    )


def test_full_convergence_to_reference_tolerance(mesh):
    """End-to-end sharded solve at the reference's abs tol 1e-10 with a
    true-residual quality check (the reference's DEBUG block)."""
    n = 1024
    dia = lap2d_reference(n)
    b = source_term(n)
    dist = sharded_cg_solve(dia, b, mesh=mesh)
    assert bool(dist.converged)
    x = np.asarray(dist.x)
    rel = np.linalg.norm(dia.to_dense() @ x - b) / np.linalg.norm(b)
    assert rel < 1e-11


def test_jacobi_sharded(mesh):
    n = 512
    dia = lap2d_reference(n)
    b = source_term(n)
    plain = sharded_cg_solve(dia, b, mesh=mesh, tol=1e-8)
    pc = sharded_cg_solve(dia, b, mesh=mesh, tol=1e-8, jacobi=True)
    assert bool(pc.converged)
    # constant-diagonal matrix: Jacobi is a uniform scaling, so counts
    # stay in the same ballpark; solution must match
    np.testing.assert_allclose(
        np.asarray(pc.x), np.asarray(plain.x), rtol=1e-6, atol=1e-6
    )


def test_history_trace_sharded(mesh):
    n = 256
    dia = lap2d_reference(n)
    b = source_term(n)
    dist = sharded_cg_solve(dia, b, mesh=mesh, tol=1e-6, history=64)
    hist = np.asarray(dist.history)
    k = int(dist.iterations)
    assert np.isfinite(hist[: min(k + 1, 64)]).all()
    single = cg_solve(DiaOperator.from_host(dia), jnp.asarray(b), tol=1e-6, history=64)
    np.testing.assert_allclose(
        hist[:32], np.asarray(single.history)[:32], rtol=1e-9
    )


def test_mesh_subset_sizes():
    """Strong-scaling sweep shape: solves on 1..8 devices all agree."""
    n = 128
    dia = lap2d_reference(n)
    b = source_term(n)
    xs = []
    for p in (1, 2, 4, 8):
        res = sharded_cg_solve(dia, b, mesh=make_mesh(p), tol=1e-6)
        xs.append(np.asarray(res.x))
    for x in xs[1:]:
        np.testing.assert_allclose(x, xs[0], rtol=1e-8, atol=1e-8)


def test_auto_strategy_falls_back_when_halo_too_wide(mesh):
    """strategy='auto' with bandwidth > shard size must pick allgather
    instead of crashing."""
    n = 64  # inc+1 = 9 > n_loc = 8 on 8 devices
    dia = lap2d_reference(n)
    b = source_term(n)
    res = sharded_cg_solve(dia, b, mesh=mesh, tol=1e-6)
    assert bool(res.converged)


def test_dia_halo_stream2d_local_kernel(mesh):
    """local_kernel='stream2d' (the Pallas HBM-streaming local mat-vec,
    interpret mode on CPU) must reproduce the XLA local path: the halo
    patching of the edge strips is exact, so iterates match to fp
    roundoff and the iteration count is identical."""
    n = 512
    dia = lap2d_reference(n)
    b = source_term(n)
    ref = sharded_cg_solve(dia, b, mesh=mesh, strategy="halo", tol=1e-6)
    stream = sharded_cg_solve(
        dia, b, mesh=mesh, strategy="halo", tol=1e-6,
        local_kernel="stream2d",
    )
    assert int(stream.iterations) == int(ref.iterations)
    np.testing.assert_allclose(
        np.asarray(stream.x), np.asarray(ref.x), rtol=1e-10, atol=1e-10
    )


def test_operator_resident_solver(mesh):
    """make_sharded_solver uploads the operator and jits ONCE; repeated
    solves with new right-hand sides, warm starts, and per-call tol
    overrides must match one-shot sharded_cg_solve exactly."""
    from cgx.parallel.sharded_cg import make_sharded_solver

    n = 512
    dia = lap2d_reference(n)
    b1 = source_term(n)
    b2 = 0.5 * b1 + 1e-3
    solver = make_sharded_solver(dia, n, dtype=b1.dtype, mesh=mesh,
                                 strategy="halo", tol=1e-6)
    r1 = solver.solve(b1)
    r2 = solver(b2)  # __call__ alias
    ref1 = sharded_cg_solve(dia, b1, mesh=mesh, strategy="halo", tol=1e-6)
    ref2 = sharded_cg_solve(dia, b2, mesh=mesh, strategy="halo", tol=1e-6)
    np.testing.assert_array_equal(np.asarray(r1.x), np.asarray(ref1.x))
    np.testing.assert_array_equal(np.asarray(r2.x), np.asarray(ref2.x))
    # warm start from the exact solution: converges immediately
    rw = solver.solve(b1, x0=np.asarray(r1.x))
    assert int(rw.iterations) <= 1
    # per-call tol override is a runtime scalar (no retrace): a looser
    # tol must stop earlier
    rl = solver.solve(b1, tol=1e-2)
    assert int(rl.iterations) < int(r1.iterations)


def test_local_kernel_auto_is_xla_on_cpu(mesh):
    """'auto' must resolve to the XLA local path on CPU and for fp64
    (Mosaic has no fp64) — the Pallas route is an accelerator-only
    big-shard optimization."""
    from cgx.parallel.sharded_cg import _resolve_local_kernel

    assert _resolve_local_kernel("auto", 10_000_000, np.float32) == "xla"
    assert _resolve_local_kernel("stream2d", 8, np.float64) == "stream2d"


def test_pipelined_sharded_residual_is_global(mesh):
    """residual_norm must be the global norm, not a per-shard partial."""
    n = 512
    dia = lap2d_reference(n)
    b = source_term(n)
    single = sharded_cg_solve(dia, b, mesh=make_mesh(1), tol=1e-6, method="pipelined")
    multi = sharded_cg_solve(dia, b, mesh=mesh, tol=1e-6, method="pipelined")
    np.testing.assert_allclose(
        float(multi.residual_norm), float(single.residual_norm), rtol=1e-6
    )


@pytest.mark.parametrize("method", ["reference", "pipelined"])
def test_neumann_sharded_halves_iterations(mesh, method):
    """Distributed Neumann preconditioning: ~half the iterations, same
    solution (one extra mat-vec-comm per iteration)."""
    n = 1024
    dia = lap2d_reference(n)
    b = source_term(n)
    plain = sharded_cg_solve(dia, b, mesh=mesh, tol=1e-8, method=method)
    pc = sharded_cg_solve(
        dia, b, mesh=mesh, tol=1e-8, method=method, precond="neumann"
    )
    assert bool(pc.converged)
    assert int(pc.iterations) < 0.7 * int(plain.iterations)
    np.testing.assert_allclose(
        np.asarray(pc.x), np.asarray(plain.x), rtol=1e-6, atol=1e-5
    )


def test_pipelined_jacobi_sharded(mesh):
    n = 512
    dia = lap2d_reference(n)
    b = source_term(n)
    res = sharded_cg_solve(
        dia, b, mesh=mesh, tol=1e-8, method="pipelined", precond="jacobi"
    )
    assert bool(res.converged)
    x = np.asarray(res.x)
    rel = np.linalg.norm(dia.to_dense() @ x - b) / np.linalg.norm(b)
    assert rel < 1e-10


def test_ell_sharded(mesh):
    """ELLPACK rows-sharded path (values+indices planes, all-gather p)."""
    from cgx.mats.containers import ELLMatrix
    from cgx.mats.generators import lap2d_fd_coo_lower

    ell = ELLMatrix.from_coo(lap2d_fd_coo_lower(20))  # N=400
    n = ell.shape[0]
    b = source_term(n)
    dist = sharded_cg_solve(ell, b, mesh=mesh, tol=1e-6)
    assert bool(dist.converged)
    want = np.zeros((n, n))
    rows = np.repeat(np.arange(n), ell.indices.shape[1])
    np.add.at(want, (rows, ell.indices.ravel()), ell.values.ravel())
    x = np.asarray(dist.x)
    assert np.linalg.norm(want @ x - b) / np.linalg.norm(b) < 1e-6
    # jacobi precond on the ELL path exercises the diag extraction
    pc = sharded_cg_solve(ell, b, mesh=mesh, tol=1e-6, precond="jacobi")
    assert bool(pc.converged)


def test_csr_sharded(mesh):
    """CSR rows-sharded path: per-shard nnz-padded triplets +
    segment_sum; matches the single-device CSR operator exactly."""
    from cgx.mats.containers import CSRMatrix
    from cgx.mats.generators import lap2d_fd_coo_lower
    from cgx.solver.operators import CsrOperator

    csr = CSRMatrix.from_coo(lap2d_fd_coo_lower(20))  # N=400
    n = csr.shape[0]
    b = source_term(n)
    single = cg_solve(CsrOperator.from_host(csr), jnp.asarray(b), tol=1e-6)
    dist = sharded_cg_solve(csr, b, mesh=mesh, tol=1e-6)
    assert bool(dist.converged)
    assert int(dist.iterations) == int(single.iterations)
    np.testing.assert_allclose(
        np.asarray(dist.x), np.asarray(single.x), rtol=1e-9, atol=1e-9
    )
    # jacobi precond exercises the CSR diag extraction
    # jacobi on the constant-diagonal Laplacian is pure scaling: same count
    pc = sharded_cg_solve(csr, b, mesh=mesh, tol=1e-6, precond="jacobi")
    assert bool(pc.converged)
    assert int(pc.iterations) == int(dist.iterations)


def test_coo_sharded_converts_to_csr(mesh):
    from cgx.mats.generators import lap2d_fd_coo_lower

    coo = lap2d_fd_coo_lower(13)  # N=169, odd shard sizes force padding
    n = coo.shape[0]
    b = source_term(n)
    dist = sharded_cg_solve(coo, b, mesh=mesh, tol=1e-8)
    assert bool(dist.converged)
    x = np.asarray(dist.x)
    want = coo.to_dense()
    assert np.linalg.norm(want @ x - b) / np.linalg.norm(b) < 1e-8


def test_chebyshev_sharded(mesh):
    """method='chebyshev': zero per-iteration reductions; converges to
    the same solution over the halo'd DIA path."""
    n = 400
    dia = lap2d_reference(n)
    b = source_term(n)
    dist = sharded_cg_solve(dia, b, mesh=mesh, method="chebyshev", tol=1e-8)
    assert bool(dist.converged)
    x = np.asarray(dist.x)
    a = dia.to_dense()
    assert np.linalg.norm(a @ x - b) / np.linalg.norm(b) < 1e-6


def test_chebyshev_sharded_matches_single_device(mesh):
    """Same bounds => identical scalar recurrence: the sharded and
    single-device Chebyshev solves agree to solver precision."""
    from cgx.solver.chebyshev import chebyshev_solve, host_spectral_bounds

    n = 400
    dia = lap2d_reference(n)
    b = source_term(n)
    bounds = host_spectral_bounds(dia)
    single = chebyshev_solve(
        DiaOperator.from_host(dia), jnp.asarray(b), bounds=bounds, tol=1e-8
    )
    dist = sharded_cg_solve(
        dia, b, mesh=mesh, method="chebyshev", bounds=bounds, tol=1e-8
    )
    assert int(dist.iterations) == int(single.iterations)
    np.testing.assert_allclose(
        np.asarray(dist.x), np.asarray(single.x), rtol=1e-8, atol=1e-10
    )


def test_chebyshev_sharded_rejects_precond(mesh):
    dia = lap2d_reference(64)
    b = source_term(64)
    with pytest.raises(ValueError, match="preconditioner"):
        sharded_cg_solve(dia, b, mesh=mesh, method="chebyshev", precond="jacobi")


def test_chebyshev_precond_sharded(mesh):
    """Distributed degree-3 Chebyshev polynomial preconditioner:
    correctness + iteration envelope (see test_api for why polynomial
    preconditioning cannot cut TOTAL matvecs); with exact bounds the
    count must strictly drop."""
    n = 400
    dia = lap2d_reference(n)
    b = source_term(n)
    base = sharded_cg_solve(dia, b, mesh=mesh, tol=1e-8)
    pc = sharded_cg_solve(dia, b, mesh=mesh, tol=1e-8, precond="chebyshev")
    assert bool(pc.converged) and not bool(pc.breakdown)
    assert int(pc.iterations) <= 1.3 * int(base.iterations)
    x = np.asarray(pc.x)
    a = dia.to_dense()
    assert np.linalg.norm(a @ x - b) / np.linalg.norm(b) < 1e-8
    # exact bounds: fewer iterations than plain, each with 1/4 the
    # reductions per matvec
    w = np.linalg.eigvalsh(a)
    exact = sharded_cg_solve(
        dia, b, mesh=mesh, tol=1e-8, precond="chebyshev",
        bounds=(float(w.min()), float(w.max())),
    )
    assert int(exact.iterations) < int(base.iterations)


def test_sharded_refine_mixed_precision(mesh):
    """fp32 inner sharded CG + fp64 outer sweeps reaches the
    reference's absolute tolerance (the multi-chip mixed-precision
    path; single-device analogue: refine_fixed_sweeps)."""
    from cgx.parallel.sharded_cg import sharded_refine_fixed_sweeps

    n = 1024
    dia = lap2d_reference(n)
    b = source_term(n)
    res = sharded_refine_fixed_sweeps(dia, b, mesh=mesh, sweeps=4)
    assert bool(res.converged)
    x = np.asarray(res.x)
    rel = np.linalg.norm(dia.to_dense() @ x - b) / np.linalg.norm(b)
    assert rel < 1e-11  # fp64-quality answer from fp32 inner work
    # per-sweep inner counts recorded; later sweeps freeze after converging
    hist = np.asarray(res.history)
    assert hist.shape == (4,) and hist[0] > 0


def test_sharded_refine_padding(mesh):
    from cgx.parallel.sharded_cg import sharded_refine_fixed_sweeps

    n = 509
    dia = lap2d_reference(n)
    b = source_term(n)
    res = sharded_refine_fixed_sweeps(dia, b, mesh=mesh, sweeps=5)
    assert res.x.shape == (n,)
    assert bool(res.converged)
