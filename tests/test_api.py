"""High-level cgx.solve() dispatcher tests."""

import jax.numpy as jnp
import numpy as np
import pytest

import cgx
from cgx import SolveConfig


@pytest.fixture
def problem():
    dia = cgx.lap2d_reference(256)
    return dia, cgx.source_term(256)


def test_default_config(problem):
    dia, b = problem
    res = cgx.solve(dia, b)
    assert bool(res.converged)
    x = np.asarray(res.x)
    rel = np.linalg.norm(dia.to_dense() @ x - b) / np.linalg.norm(b)
    assert rel < 1e-11


def test_fp32_config(problem):
    dia, b = problem
    tol = 1e-4 * np.linalg.norm(b)
    res = cgx.solve(dia, b, SolveConfig(precision="fp32", tolerance=tol))
    assert bool(res.converged)
    assert res.x.dtype == jnp.float32


def test_pallas_vmem_path(problem):
    dia, b = problem
    tol = 1e-4 * np.linalg.norm(b)
    res = cgx.solve(
        dia, b, SolveConfig(precision="fp32", tolerance=tol, use_pallas=True)
    )
    assert bool(res.converged)
    base = cgx.solve(dia, b, SolveConfig(precision="fp32", tolerance=tol))
    assert abs(int(res.iterations) - int(base.iterations)) <= 1


def test_sharded_dispatch(problem):
    dia, b = problem
    res = cgx.solve(dia, b, n_devices=4)
    assert bool(res.converged)
    single = cgx.solve(dia, b)
    np.testing.assert_allclose(
        np.asarray(res.x), np.asarray(single.x), rtol=1e-8, atol=1e-8
    )


def test_fp64_requires_x64_guard(problem, monkeypatch):
    import jax

    dia, b = problem
    # conftest enables x64; verify the guard logic via the flag check
    assert jax.config.jax_enable_x64
    res = cgx.solve(dia, b, SolveConfig(precision="fp64"))
    assert res.x.dtype == jnp.float64


def test_history_and_maxiter(problem):
    dia, b = problem
    res = cgx.solve(dia, b, SolveConfig(maxiter=30, history=30, tolerance=0.0))
    assert int(res.iterations) == 30
    assert np.isfinite(np.asarray(res.history)).all()


def test_bf16_smoke(problem):
    dia, b = problem
    tol = 5e-2 * np.linalg.norm(b)
    res = cgx.solve(dia, b, SolveConfig(precision="bf16", tolerance=tol, maxiter=2000))
    assert res.x.dtype == jnp.bfloat16
    assert bool(res.converged)


def test_config_method_and_precond(problem):
    dia, b = problem
    tol = 1e-6 * np.linalg.norm(b)
    base = cgx.solve(dia, b, SolveConfig(tolerance=tol))
    pipe = cgx.solve(dia, b, SolveConfig(tolerance=tol, method="pipelined"))
    assert abs(int(pipe.iterations) - int(base.iterations)) <= 1
    nm = cgx.solve(dia, b, SolveConfig(tolerance=tol, precond="neumann"))
    assert int(nm.iterations) < 0.7 * int(base.iterations)
    cheb = cgx.solve(dia, b, SolveConfig(tolerance=tol, method="chebyshev"))
    assert bool(cheb.converged)
    pn = cgx.solve(
        dia, b, SolveConfig(tolerance=tol, method="pipelined", precond="neumann")
    )
    assert int(pn.iterations) < 0.7 * int(base.iterations)
    with pytest.raises(ValueError):
        cgx.solve(dia, b, SolveConfig(method="nope"))
    with pytest.raises(ValueError):
        cgx.solve(dia, b, SolveConfig(precond="ilu"))


def test_config_vmem_neumann(problem):
    dia, b = problem
    tol = 1e-3 * np.linalg.norm(b)
    plain = cgx.solve(
        dia, b, SolveConfig(precision="fp32", tolerance=tol, use_pallas=True)
    )
    pcg = cgx.solve(
        dia, b,
        SolveConfig(precision="fp32", tolerance=tol, use_pallas=True,
                    precond="neumann"),
    )
    assert bool(pcg.converged)
    assert int(pcg.iterations) < 0.7 * int(plain.iterations)


def test_sharded_chebyshev_dispatch(problem):
    dia, b = problem
    res = cgx.solve(dia, b, n_devices=4, method="chebyshev")
    assert bool(res.converged)
    x = np.asarray(res.x)
    rel = np.linalg.norm(dia.to_dense() @ x - b) / np.linalg.norm(b)
    assert rel < 1e-9


def test_sharded_csr_dispatch(problem):
    from cgx.mats.containers import CSRMatrix
    from cgx.mats.generators import lap2d_fd_coo_lower

    csr = CSRMatrix.from_coo(lap2d_fd_coo_lower(16))
    b = cgx.source_term(csr.shape[0])
    res = cgx.solve(csr, b, n_devices=4)
    assert bool(res.converged)


def test_chebyshev_precond_dispatch(problem):
    """Polynomial preconditioning cannot cut TOTAL matvecs (PCG's
    Krylov space is a constrained subset of plain CG's) — it trades
    reductions-per-matvec. Assert correctness + a sane iteration
    envelope, not a >2x cut."""
    dia, b = problem
    base = cgx.solve(dia, b)
    res = cgx.solve(dia, b, SolveConfig(precond="chebyshev"))
    assert bool(res.converged) and not bool(res.breakdown)
    # with Lanczos-estimated (safety-factored) bounds the count stays
    # within ~1.3x of plain while each iteration carries 4 matvecs per
    # reduction pair instead of 1
    assert int(res.iterations) <= 1.3 * int(base.iterations)
    x = np.asarray(res.x)
    rel = np.linalg.norm(dia.to_dense() @ x - b) / np.linalg.norm(b)
    assert rel < 1e-11


def test_mg_precond_dispatch():
    """precond='mg': grid-independent iteration counts through the
    one-call dispatcher, single-device and sharded."""
    fd = cgx.lap2d_fd(64)
    b = cgx.source_term(64 * 64)
    base = cgx.solve(fd, b)
    res = cgx.solve(fd, b, SolveConfig(precond="mg"))
    assert bool(res.converged)
    assert int(res.iterations) < 0.2 * int(base.iterations)
    x = np.asarray(res.x)
    rel = np.linalg.norm(fd.to_dense() @ x - b) / np.linalg.norm(b)
    assert rel < 1e-11
    sh = cgx.solve(fd, b, SolveConfig(precond="mg"), n_devices=8)
    assert bool(sh.converged)
    x2 = np.asarray(sh.x)
    rel2 = np.linalg.norm(fd.to_dense() @ x2 - b) / np.linalg.norm(b)
    assert rel2 < 1e-11


def test_mixed_precision_dispatch(problem):
    """precision='mixed': fp32 inner + fp64 sweeps through the one-call
    dispatcher, single-device and sharded; tolerance is relative."""
    dia, b = problem
    res = cgx.solve(dia, b, SolveConfig(precision="mixed", tolerance=1e-11))
    assert bool(res.converged)
    x = np.asarray(res.x)
    rel = np.linalg.norm(dia.to_dense() @ x - b) / np.linalg.norm(b)
    assert rel < 1e-11
    sh = cgx.solve(dia, b, SolveConfig(precision="mixed", tolerance=1e-11),
                   n_devices=8)
    assert bool(sh.converged)
    x2 = np.asarray(sh.x)
    rel2 = np.linalg.norm(dia.to_dense() @ x2 - b) / np.linalg.norm(b)
    assert rel2 < 1e-11
    with pytest.raises(ValueError, match="mixed"):
        cgx.solve(dia, b, SolveConfig(precision="mixed", precond="jacobi"))


def test_method_knobs_config(problem):
    dia, b = problem
    r1 = cgx.solve(dia, b, SolveConfig(method="sstep", sstep_s=2, tolerance=1e-8))
    r2 = cgx.solve(dia, b, SolveConfig(method="sstep", sstep_s=8, tolerance=1e-8))
    assert bool(r1.converged) and bool(r2.converged)
    ch = cgx.solve(dia, b, SolveConfig(method="chebyshev", check_every=8,
                                       tolerance=1e-8))
    assert bool(ch.converged)
    sh = cgx.solve(dia, b, n_devices=4,
                   config=SolveConfig(method="sstep", sstep_s=8, tolerance=1e-8))
    assert bool(sh.converged)
    # distributed matrix-powers basis through the config surface
    dh = cgx.solve(dia, b, n_devices=4,
                   config=SolveConfig(method="sstep", sstep_s=2,
                                      sstep_powers="deephalo",
                                      tolerance=1e-8))
    assert bool(dh.converged)
    np.testing.assert_allclose(np.asarray(dh.x), np.asarray(sh.x),
                               rtol=1e-6, atol=1e-8)
    # single-device powers: interpret-mode kernel on the CPU backend
    pw = cgx.solve(dia, b, config=SolveConfig(method="sstep", sstep_s=2,
                                              precision="fp32",
                                              sstep_powers="interpret",
                                              tolerance=1e-3))
    assert bool(pw.converged)
    # wrong-context powers values fail loudly, never silently degrade
    with pytest.raises(ValueError, match="single-device mode"):
        cgx.solve(dia, b, n_devices=4,
                  config=SolveConfig(method="sstep",
                                     sstep_powers="pallas"))
    with pytest.raises(ValueError, match="sharded mode"):
        cgx.solve(dia, b, config=SolveConfig(method="sstep",
                                             sstep_powers="deephalo"))
    with pytest.raises(ValueError, match="unknown sstep_powers"):
        cgx.solve(dia, b, config=SolveConfig(method="sstep",
                                             sstep_powers="deephallo"))


def test_large_banded_stream_dispatch(problem):
    """use_pallas + large_banded='stream' routes above-VMEM banded
    fp32 problems to the fused-iteration streaming kernel (interpret
    on CPU); tiny problems still take the VMEM whole-solve path."""
    import cgx.config as cfgmod

    dia, b = problem
    cfg = SolveConfig(precision="fp32", use_pallas=True,
                      large_banded="stream", tolerance=1e-3)
    # force the above-VMEM branch by shrinking the budget
    old_budget = cfgmod.VMEM_BUDGET_BYTES
    import cgx.solver.api as apimod
    apimod.VMEM_BUDGET_BYTES = 1
    try:
        res = cgx.solve(dia, b, cfg)
    finally:
        apimod.VMEM_BUDGET_BYTES = old_budget
    assert bool(res.converged)
    # precond='neumann' routes to the fused PCG streaming kernel
    # (dia_cg_solve_stream_pcg) rather than falling back to XLA
    cfg_pc = SolveConfig(precision="fp32", use_pallas=True,
                         large_banded="stream", precond="neumann",
                         tolerance=1e-3)
    apimod.VMEM_BUDGET_BYTES = 1
    try:
        res_pc = cgx.solve(dia, b, cfg_pc)
    finally:
        apimod.VMEM_BUDGET_BYTES = old_budget
    assert bool(res_pc.converged)
    assert int(res_pc.iterations) < int(res.iterations)
    with pytest.raises(ValueError, match="unknown large_banded"):
        apimod.VMEM_BUDGET_BYTES = 1
        try:
            cgx.solve(dia, b, SolveConfig(precision="fp32",
                                          use_pallas=True,
                                          large_banded="nope"))
        finally:
            apimod.VMEM_BUDGET_BYTES = old_budget


def test_sharded_mg_dispatch_3d():
    """Sharded precond='mg' must infer 3-D geometry (incl. the
    ambiguous N=4096 = 64^2 = 16^3 case)."""
    dia = cgx.lap3d_fd(16)
    b = cgx.source_term(16**3)
    res = cgx.solve(dia, b, SolveConfig(precond="mg"), n_devices=8)
    assert bool(res.converged)
    assert int(res.iterations) < 25  # grid-independent counts, not 2-D-mangled
    x = np.asarray(res.x)
    rel = np.linalg.norm(dia.mat_vec(x) - b) / np.linalg.norm(b)
    assert rel < 1e-11


def test_mixed_dispatch_large_n_falls_back():
    """precision='mixed' beyond the VMEM budget must route to the
    XLA-fused inner loop instead of overflowing the Pallas kernel."""
    dia = cgx.lap2d_reference(400_000)
    b = cgx.source_term(400_000)
    res = cgx.solve(dia, b, SolveConfig(precision="mixed", tolerance=1e-11,
                                        maxiter=4000))
    assert bool(res.converged)
    x = np.asarray(res.x)
    rel = np.linalg.norm(dia.mat_vec(x) - b) / np.linalg.norm(b)
    assert rel < 1e-11


def test_solve_multi_rhs_block_dispatch():
    """A 2-D b routes cgx.solve to breakdown-free block CG, honoring
    the preconditioner, single-device and sharded."""
    import jax
    import numpy as np

    import cgx
    from cgx.mats.generators import lap2d_fd, source_term

    g = 64
    fd = lap2d_fd(g)
    b0 = np.asarray(source_term(g * g))
    B = np.stack([b0, 0.5 * b0 + 1.0], axis=1)

    r1 = cgx.solve(fd, B, cgx.SolveConfig(precond="mg", mg_smoother="gs"))
    assert bool(r1.converged.all()) and int(r1.iterations) < 20
    a = fd.to_dense()
    X = np.asarray(r1.x)
    for j in range(2):
        rel = np.linalg.norm(a @ X[:, j] - B[:, j]) / np.linalg.norm(B[:, j])
        assert rel < 1e-11

    assert len(jax.devices()) >= 8
    r2 = cgx.solve(fd, B, cgx.SolveConfig(precond="mg"), n_devices=8)
    assert bool(r2.converged.all()) and int(r2.iterations) < 20

    import pytest as _pytest

    with _pytest.raises(ValueError, match="multi-RHS"):
        cgx.solve(fd, B, cgx.SolveConfig(method="sstep"))


def test_warm_start_all_methods(problem):
    """cgx.solve(x0=...) warm-starts every single-RHS recurrence and
    the sharded path; an x0 at 1e-8 relative error converges in far
    fewer iterations at full quality. gvpipe's replacement floor must
    be warm-start-safe (keyed to the b energy, not the small warm r0 —
    see cgx/solver/gvpipe.py)."""
    dia, b = problem
    a = np.asarray(dia.to_dense())
    b_np = np.asarray(b)
    x_star = np.linalg.solve(a, b_np)
    x0 = x_star * (1 + 1e-8)
    n = b_np.shape[0]
    for method in ("reference", "pipelined", "gvpipe", "sstep"):
        cfg = SolveConfig(tolerance=1e-10, method=method, maxiter=6 * n)
        cold = cgx.solve(dia, b_np, cfg)
        warm = cgx.solve(dia, b_np, cfg, x0=x0)
        rel = np.linalg.norm(a @ np.asarray(warm.x) - b_np) / (
            np.linalg.norm(b_np)
        )
        assert bool(warm.converged) and rel < 1e-11, method
        assert int(warm.iterations) < 0.75 * int(cold.iterations), method
    warm8 = cgx.solve(
        dia, b_np, SolveConfig(tolerance=1e-10), n_devices=8, x0=x0
    )
    assert bool(warm8.converged)
    rel8 = np.linalg.norm(a @ np.asarray(warm8.x) - b_np) / (
        np.linalg.norm(b_np)
    )
    assert rel8 < 1e-11


def test_warm_start_block_and_rejections(problem):
    dia, b = problem
    a = np.asarray(dia.to_dense())
    b_np = np.asarray(b)
    # multi-RHS warm start via the shift identity: X0 near the
    # solutions converges in a handful of iterations at full quality,
    # single-device AND sharded
    B = np.stack([b_np, 0.5 * b_np + 1.0], 1)
    X_star = np.linalg.solve(a, B)
    X0 = X_star * (1 + 1e-8)
    cold = cgx.solve(dia, B, SolveConfig(tolerance=1e-8))
    for kw in ({}, {"n_devices": 8}):
        warm = cgx.solve(dia, B, SolveConfig(tolerance=1e-8), x0=X0, **kw)
        assert bool(np.asarray(warm.converged).all())
        for j in range(2):
            rel = np.linalg.norm(
                a @ np.asarray(warm.x)[:, j] - B[:, j]
            ) / np.linalg.norm(B[:, j])
            assert rel < 1e-9, (kw, j, rel)
        # abs tol: the 1e-8-relative X0 still leaves ~4 orders of
        # residual reduction, so the saving is real but not dramatic
        assert int(np.max(np.asarray(warm.iterations))) < int(
            np.max(np.asarray(cold.iterations))
        )
    with pytest.raises(ValueError, match="must match"):
        cgx.solve(dia, B, x0=b_np)
    with pytest.raises(ValueError, match="mixed"):
        cgx.solve(dia, b_np, SolveConfig(precision="mixed"), x0=b_np)


def test_scipy_sparse_interop():
    """scipy.sparse matrices work directly: as_operator accepts any
    scipy format (duck-typed tocoo), COOMatrix round-trips to/from
    scipy with symmetric mirroring."""
    import scipy.sparse as sps

    import jax.numpy as jnp

    from cgx.mats.containers import COOMatrix
    from cgx.mats.generators import lap2d_fd, lap2d_fd_coo_lower, source_term

    g = 16
    n = g * g
    a_sp = sps.csr_matrix(np.asarray(lap2d_fd(g).to_dense()))
    op = cgx.as_operator(a_sp)
    b = jnp.asarray(source_term(n))
    res = cgx.cg_solve(op, b, tol=1e-10)
    assert bool(res.converged)
    rel = np.linalg.norm(
        a_sp @ np.asarray(res.x) - np.asarray(b)
    ) / np.linalg.norm(np.asarray(b))
    assert rel < 1e-11
    # COO round trip, incl. the symmetric (stored-triangle) mirror
    lower = lap2d_fd_coo_lower(g)
    assert lower.symmetric
    sp2 = lower.to_scipy()
    np.testing.assert_allclose(
        sp2.toarray(), np.asarray(lower.to_dense())
    )
    back = COOMatrix.from_scipy(sp2)
    np.testing.assert_allclose(
        np.asarray(back.to_dense()), np.asarray(lower.to_dense())
    )
    # every scipy format converts
    for fmt in (sps.coo_matrix, sps.csc_matrix, sps.lil_matrix):
        assert bool(
            cgx.cg_solve(
                cgx.as_operator(fmt(a_sp)), b, tol=1e-8
            ).converged
        )


def test_multi_rhs_batched_route(problem):
    """multi_rhs='batched': independent per-column recurrences through
    cgx.solve — single-device vmap and the (rows x rhs) 2-D-mesh
    batched loop (method=gvpipe supported there), with warm starts via
    the shift identity."""
    dia, b = problem
    a = np.asarray(dia.to_dense())
    b_np = np.asarray(b)
    rng = np.random.default_rng(3)
    B = np.stack([b_np, rng.standard_normal(b_np.shape[0])], 1)
    cfg = SolveConfig(tolerance=1e-8, multi_rhs="batched")

    res1 = cgx.solve(dia, B, cfg)
    res8 = cgx.solve(dia, B, cfg, n_devices=8)
    resgv = cgx.solve(dia, B, cfg, n_devices=8, method="gvpipe")
    for res in (res1, res8, resgv):
        assert np.asarray(res.x).shape == B.shape
        assert bool(np.asarray(res.converged).all())
        for j in range(2):
            rel = np.linalg.norm(
                a @ np.asarray(res.x)[:, j] - B[:, j]
            ) / np.linalg.norm(B[:, j])
            assert rel < 1e-9, (j, rel)
    # independent recurrences: per-column counts differ (unlike block)
    it8 = np.asarray(res8.iterations)
    assert it8.shape == (2,)
    # warm start through the batched sharded path
    X0 = np.linalg.solve(a, B) * (1 + 1e-8)
    warm = cgx.solve(dia, B, cfg, n_devices=8, x0=X0)
    assert bool(np.asarray(warm.converged).all())
    assert int(np.max(np.asarray(warm.iterations))) < int(np.max(it8))
    # guards
    with pytest.raises(ValueError, match="needs a mesh"):
        cgx.solve(dia, B, cfg, method="pipelined")
    with pytest.raises(ValueError, match="unknown multi_rhs"):
        cgx.solve(dia, B, SolveConfig(multi_rhs="bogus"))


def test_vmem_compile_failure_falls_back_to_stream(problem, monkeypatch):
    """A compile-service rejection of the whole-solve VMEM kernel must
    fall through to the streaming kernel, not surface to the caller.
    Measured trigger on the round-4 rig: the relay's chipless AOT
    compile helper HTTP-500s Pallas programs with scoped VMEM >~48 MB
    (results/hw_queue_r4/cliff_bisect3.json vmem2d_err rows) even
    though the chip has 128 MB."""
    import jax

    import cgx.solver.api as apimod

    dia, b = problem

    def boom(*a, **k):
        raise jax.errors.JaxRuntimeError(
            "INTERNAL: http://127.0.0.1:8113/remote_compile: HTTP 500: "
            "tpu_compile_helper subprocess exit code 1"
        )

    calls = {}
    from cgx.ops import cg_stream as csmod

    real_stream = csmod.dia_cg_solve_stream

    def spy_stream(*a, **k):
        calls["stream"] = True
        return real_stream(*a, **k)

    monkeypatch.setattr(
        "cgx.ops.cg_kernel.dia_cg_solve_vmem", boom
    )
    monkeypatch.setattr(
        "cgx.ops.cg_stream.dia_cg_solve_stream", spy_stream
    )
    cfg = SolveConfig(precision="fp32", use_pallas=True,
                      large_banded="stream", tolerance=1e-3)
    with pytest.warns(RuntimeWarning, match="falling back"):
        res = cgx.solve(dia, b, cfg)
    assert bool(res.converged)
    assert calls.get("stream")
