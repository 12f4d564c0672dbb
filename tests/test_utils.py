"""Timers, structured records, checkpoint/resume."""

import os

import jax.numpy as jnp
import numpy as np

from cgx import DiaOperator, cg_solve, lap2d_reference, source_term
from cgx.utils.checkpoint import CGCheckpoint, cg_solve_resumable
from cgx.utils.records import SolveRecord
from cgx.utils.timer import PhaseTimer


def test_phase_timer():
    t = PhaseTimer()
    with t.phase("a"):
        sum(range(1000))
    with t.phase("b"):
        pass
    with t.phase("a"):
        pass
    rep = t.report()
    assert set(rep) == {"a", "b"}
    assert t.counts["a"] == 2
    assert "a" in t.summary()


def test_solve_record_roundtrip(tmp_path):
    n = 128
    dia = lap2d_reference(n)
    b = jnp.asarray(source_term(n))
    res = cg_solve(DiaOperator.from_host(dia), b, tol=1e-8, history=16)
    rec = SolveRecord.from_result(res, n=n, elapsed_s=0.5, psize=4)
    assert rec.iterations == int(res.iterations)
    assert rec.converged
    j = rec.to_json()
    assert '"psize": 4' in j
    mpi_csv = tmp_path / "strong.txt"
    rec.append_mpi_row(mpi_csv)
    assert mpi_csv.read_text().strip() == f"{n},4,0.5"
    cuda_csv = tmp_path / "cuda.txt"
    rec.append_cuda_row(cuda_csv, 1024, 16)
    assert cuda_csv.read_text().strip() == "1024,16,0.5"
    assert "[STEP" in rec.debug_line()


def test_checkpoint_resume_exact(tmp_path):
    """Interrupted + resumed solve must land on the same trajectory as
    an uninterrupted one."""
    n = 256
    dia = lap2d_reference(n)
    op = DiaOperator.from_host(dia)
    b = jnp.asarray(source_term(n))
    straight = cg_solve_resumable(
        op, b, tmp_path / "s.npz", tol=1e-8, segment=1000
    )

    ck_path = tmp_path / "c.npz"
    # phase 1: only 40 iterations allowed (simulated preemption)
    partial_res = cg_solve_resumable(
        op, b, ck_path, tol=1e-8, maxiter=40, segment=20
    )
    assert int(partial_res.iterations) == 40
    assert os.path.exists(ck_path)
    ck = CGCheckpoint.load(ck_path)
    assert ck.k == 40
    # phase 2: resume to convergence
    resumed = cg_solve_resumable(op, b, ck_path, tol=1e-8, segment=50)
    assert bool(resumed.converged)
    assert int(resumed.iterations) == int(straight.iterations)
    np.testing.assert_allclose(
        np.asarray(resumed.x), np.asarray(straight.x), rtol=1e-12
    )


def test_checkpoint_atomic_save_load(tmp_path):
    ck = CGCheckpoint(
        x=np.arange(4.0), r=np.ones(4), p=np.zeros(4), rsold=2.5, k=7
    )
    path = tmp_path / "ck.npz"
    ck.save(path)
    back = CGCheckpoint.load(path)
    np.testing.assert_array_equal(back.x, ck.x)
    assert back.rsold == 2.5 and back.k == 7


def test_multihost_helpers_single_process():
    from cgx.parallel.multihost import global_mesh, is_multihost, process_local_rows

    assert not is_multihost()
    mesh = global_mesh()
    start, count = process_local_rows(100, mesh)
    assert start == 0 and count == 100


def test_sharded_checkpoint_resume_exact(tmp_path):
    """Sharded interrupted + resumed solve lands on the same trajectory;
    checkpoints interoperate with the single-device solver (global
    un-padded vectors, same npz format)."""
    from cgx.utils.checkpoint import sharded_cg_solve_resumable

    n = 256
    dia = lap2d_reference(n)
    op = DiaOperator.from_host(dia)
    b = source_term(n)
    straight = cg_solve_resumable(
        op, jnp.asarray(b), tmp_path / "s.npz", tol=1e-8, segment=1000
    )

    ck_path = tmp_path / "c.npz"
    partial_res = sharded_cg_solve_resumable(
        dia, b, ck_path, n_devices=4, tol=1e-8, maxiter=40, segment=20
    )
    assert int(partial_res.iterations) == 40
    ck = CGCheckpoint.load(ck_path)
    assert ck.k == 40 and ck.x.shape == (n,)
    # resume on a DIFFERENT mesh size
    resumed = sharded_cg_solve_resumable(
        dia, b, ck_path, n_devices=8, tol=1e-8, segment=50
    )
    assert bool(resumed.converged)
    assert int(resumed.iterations) == int(straight.iterations)
    np.testing.assert_allclose(
        np.asarray(resumed.x), np.asarray(straight.x), rtol=1e-10, atol=1e-12
    )


def test_sharded_checkpoint_cross_resume_single_device(tmp_path):
    """A sharded checkpoint resumes on the single-device solver."""
    from cgx.utils.checkpoint import sharded_cg_solve_resumable

    n = 128
    dia = lap2d_reference(n)
    op = DiaOperator.from_host(dia)
    b = source_term(n)
    ck_path = tmp_path / "x.npz"
    sharded_cg_solve_resumable(
        dia, b, ck_path, n_devices=4, tol=1e-9, maxiter=20, segment=10
    )
    resumed = cg_solve_resumable(op, jnp.asarray(b), ck_path, tol=1e-9)
    assert bool(resumed.converged)
    x = np.asarray(resumed.x)
    rel = np.linalg.norm(dia.to_dense() @ x - b) / np.linalg.norm(b)
    assert rel < 1e-9
