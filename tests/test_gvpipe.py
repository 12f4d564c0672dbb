"""Ghysels-Vanroose communication-hiding pipelined CG (cgx.solver.gvpipe).

Correctness vs classic CG, the guarded residual-replacement behaviour
(the GV recursion's attainable-accuracy floor and its cure), breakdown
semantics, preconditioned variants, API/sharded routing. The
communication-structure claims (one fused psum, collective critical
depth 1) are pinned in tests/test_collective_counts.py.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import cgx
from cgx.mats.generators import lap2d_fd, source_term
from cgx.solver.cg import cg_solve
from cgx.solver.gvpipe import gv_cg_solve

G = 32
N = G * G


@pytest.fixture(scope="module")
def dia():
    return lap2d_fd(G)


@pytest.fixture(scope="module")
def op(dia):
    return cgx.as_operator(dia)


@pytest.fixture(scope="module")
def b():
    return jnp.asarray(source_term(N))


@pytest.fixture(scope="module")
def dense(dia):
    return np.asarray(dia.to_dense())


def true_rel(dense, x, b):
    x = np.asarray(x)
    b = np.asarray(b)
    return np.linalg.norm(dense @ x - b) / np.linalg.norm(b)


def test_matches_classic_cg_at_reference_tolerance(op, b, dense):
    """Default (guarded replacement, cadence 25) reaches the
    reference's absolute tol 1e-10 with classic-CG-quality x and an
    iteration count within ~15% of classic (the replacement resets
    cost a few iterations)."""
    ref = cg_solve(op, b, tol=1e-10)
    res = gv_cg_solve(op, b, tol=1e-10)
    assert bool(res.converged)
    assert not bool(res.breakdown)
    assert true_rel(dense, res.x, b) < 1e-12
    assert int(res.iterations) <= int(ref.iterations) * 1.15 + 2


def test_unreplaced_recursion_floors_with_honest_breakdown(op, b, dense):
    """replace_every=0: the GV recurrences drift, floor ~2-3 digits
    above classic attainable accuracy, and the solver EXITS on the
    denom<=0 breakdown with the last finite state — converged=False,
    breakdown=True, x still a good solution (the drift corrupts the
    recursive residual, not x)."""
    res = gv_cg_solve(op, b, tol=1e-10, replace_every=0)
    assert not bool(res.converged)
    assert bool(res.breakdown)
    x = np.asarray(res.x)
    assert np.isfinite(x).all()
    assert true_rel(dense, res.x, b) < 1e-9  # good x despite the stall
    assert int(res.iterations) < N  # exited early, not at maxiter


def test_replacement_guard_blocks_noise_floor_injections(op, b, dense):
    """Aggressive cadence 10 converges BECAUSE the guard self-disables
    replacement near the explicit-residual noise floor (unguarded it
    diverges to inf — measured during development)."""
    res = gv_cg_solve(op, b, tol=1e-10, replace_every=10)
    assert bool(res.converged)
    assert true_rel(dense, res.x, b) < 1e-12


def test_history_matches_classic_trajectory_early(op, b):
    """Exact-arithmetic equivalence shows as matching residual
    trajectories away from the rounding floor."""
    ref = cg_solve(op, b, tol=1e-10, history=40)
    res = gv_cg_solve(op, b, tol=1e-10, history=40)
    # gvpipe records ||r_k|| at iteration start; classic records
    # ||r_{k+1}|| after the update -> shifted by one (same convention
    # as pipelined, tests/test_pipelined.py)
    h_ref = np.asarray(ref.history)[:39]
    h_gv = np.asarray(res.history)[1:40]
    assert np.allclose(h_ref, h_gv, rtol=1e-6)


@pytest.mark.parametrize("pc_name", ["jacobi", "neumann"])
def test_preconditioned(dia, op, b, dense, pc_name):
    from cgx.solver import precond as P

    bands = jnp.asarray(np.asarray(dia.bands))
    diag = bands[list(dia.offsets).index(0)]
    if pc_name == "jacobi":
        pc = P.jacobi(diag)
    else:
        pc = P.neumann_banded(bands, dia.offsets, sweeps=2)
    ref = cg_solve(op, b, tol=1e-10, precond=pc)
    res = gv_cg_solve(op, b, tol=1e-10, precond=pc)
    assert bool(res.converged)
    assert true_rel(dense, res.x, b) < 1e-12
    assert int(res.iterations) <= int(ref.iterations) * 1.15 + 2


def test_dense_operator_and_x0(dense, b):
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.standard_normal(N))
    res = gv_cg_solve(jnp.asarray(dense), b, x0=x0, tol=1e-10)
    assert bool(res.converged)
    assert true_rel(dense, res.x, b) < 1e-12


def test_fp32(dia, b, dense):
    """fp32 GV attains ~7e-7 relative on this problem (the fp32 analogue
    of the fp64 floor) — ask for an attainable absolute tolerance
    (||b|| ~ 2.3e5 here, so tol=5 is rel ~2e-5)."""
    op32 = cgx.as_operator(dia, dtype=jnp.float32)
    b32 = jnp.asarray(np.asarray(b), dtype=jnp.float32)
    res = gv_cg_solve(op32, b32, tol=5.0)
    assert res.x.dtype == jnp.float32
    assert bool(res.converged)
    assert true_rel(dense, res.x, b) < 1e-4


def test_pre_converged_exit(op):
    res = gv_cg_solve(op, jnp.zeros(N, jnp.float64), tol=1e-10)
    assert bool(res.converged)
    assert int(res.iterations) == 0


def test_api_routing(dia, b, dense):
    """cgx.solve(method='gvpipe') routes single-device and sharded."""
    cfg = cgx.SolveConfig(method="gvpipe")
    res = cgx.solve(dia, np.asarray(b), cfg)
    assert bool(res.converged)
    assert true_rel(dense, res.x, b) < 1e-12
    res8 = cgx.solve(dia, np.asarray(b), cfg, n_devices=8)
    assert bool(res8.converged)
    assert true_rel(dense, res8.x, b) < 1e-12


def test_sharded_matches_single_device(dia, b, dense):
    from cgx.parallel.sharded_cg import sharded_cg_solve

    single = gv_cg_solve(cgx.as_operator(dia), b, tol=1e-10)
    shard = sharded_cg_solve(
        dia, np.asarray(b), n_devices=8, method="gvpipe", tol=1e-10
    )
    assert bool(shard.converged)
    assert true_rel(dense, shard.x, b) < 1e-12
    # same recurrence, different reduction order: iterations agree to
    # a few (fp64 rounding-floor sensitivity, see test_cg_core.py)
    assert abs(int(shard.iterations) - int(single.iterations)) <= 5


def test_sharded_preconditioned(dia, b, dense):
    from cgx.parallel.sharded_cg import sharded_cg_solve

    res = sharded_cg_solve(
        dia, np.asarray(b), n_devices=8, method="gvpipe",
        precond="neumann", tol=1e-10,
    )
    assert bool(res.converged)
    assert true_rel(dense, res.x, b) < 1e-12


def test_cli_grammar(tmp_path, capsys):
    from cgx.cli.main import main

    out = tmp_path / "out.txt"
    rc = main(["400", str(out), "--method", "gvpipe"])
    assert rc == 0
    txt = capsys.readouterr().out
    assert "[STEP" in txt
    row = out.read_text().strip().split(",")
    assert row[0] == "400"
