"""Golden regression tests: iteration counts and residual trajectories
pinned on the CPU fp64 path (SURVEY §4 implication (d)).

These pin THIS framework's behaviour so numerical regressions are
caught; cross-implementation parity with the reference is asserted at
the trajectory level in test_cg_core.py (see the rounding-floor note
there).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from cgx import DiaOperator, cg_solve, lap2d_reference, source_term
from cgx.mats.generators import lap2d_fd

# (generator, arg, tol, expected k) — recorded on CPU x64 at build time.
GOLDENS = [
    (lap2d_reference, 256, 1e-6, 73),
    (lap2d_reference, 1024, 1e-6, 150),
    (lap2d_fd, 16, 1e-6, 58),  # N=256 true 5-pt Laplacian
    (lap2d_fd, 32, 1e-6, 119),  # N=1024
]


@pytest.mark.parametrize("gen,arg,tol,k_expect", GOLDENS)
def test_golden_iteration_counts(gen, arg, tol, k_expect):
    dia = gen(arg)
    n = dia.shape[0]
    b = jnp.asarray(source_term(n))
    res = cg_solve(DiaOperator.from_host(dia), b, tol=tol)
    assert bool(res.converged)
    assert int(res.iterations) == k_expect, (
        f"{gen.__name__}({arg}) tol={tol}: expected k={k_expect}, "
        f"got {int(res.iterations)}"
    )


def test_golden_residual_prefix():
    """First residuals of the N=256 reference problem, fp64."""
    n = 256
    dia = lap2d_reference(n)
    b = jnp.asarray(source_term(n))
    res = cg_solve(DiaOperator.from_host(dia), b, tol=1e-6, history=8)
    hist = np.asarray(res.history)[:4]
    # pinned from the literal NumPy reference recurrence (test_cg_core)
    expect = np.array(
        [np.linalg.norm(_ref_step(dia.to_dense(), np.asarray(b), k)) for k in range(1, 5)]
    )
    np.testing.assert_allclose(hist, expect, rtol=1e-10)


def _ref_step(A, b, upto):
    x = np.zeros_like(b)
    r = b - A @ x
    p = r.copy()
    rsold = r @ p
    for _ in range(upto):
        Ap = A @ p
        alpha = rsold / max(p @ Ap, rsold * 1e-14)
        x += alpha * p
        r -= alpha * Ap
        rsnew = r @ r
        p = r + (rsnew / rsold) * p
        rsold = rsnew
    return r


# --- flagship goldens: the exact problem BENCH numbers come from ------
# (VERDICT r1 item 4: N=1e4, tol 1e-10, fp64 — the reference's actual
# operating point, cg.cc:144-154 DEBUG semantics.)

FLAGSHIP = [
    # (generator, arg, k, first-8 recursive residuals sqrt(rsold))
    (
        lap2d_fd,
        100,  # the lap2D_5pt_n100.mtx matrix, regenerated
        488,
        [
            1.07063277869174667e07,
            1.75349458723023348e07,
            2.74651125490928143e07,
            2.77661385929982923e07,
            2.65666156891916655e07,
            2.76468291995650306e07,
            2.49027236340865903e07,
            2.66006474327106588e07,
        ],
    ),
    (
        lap2d_reference,
        10000,  # generate_lap2d_matrix(10000) quasi-stencil parity
        607,
        [
            9.73651372396838479e06,
            3.12457512412081882e07,
            3.11245496621514186e07,
            3.48747115235015601e07,
            3.93113117033372298e07,
            3.42798756200103164e07,
            3.75301595863472968e07,
            3.23599153440569490e07,
        ],
    ),
]


@pytest.mark.parametrize("gen,arg,k_expect,hist_expect", FLAGSHIP)
def test_flagship_golden_n1e4_tol1e10(gen, arg, k_expect, hist_expect):
    """Iteration count, residual-trajectory prefix, and true-residual
    quality gate for the N=10^4 / tol=1e-10 flagship problem — pinned
    on the deterministic CPU fp64 path. If XLA changes summation
    order these need re-pinning (expected rarely); a drift without an
    XLA upgrade is a real numerical regression."""
    dia = gen(arg)
    n = dia.shape[0]
    assert n == 10000
    b = jnp.asarray(source_term(n))
    res = cg_solve(DiaOperator.from_host(dia), b, tol=1e-10, history=8)
    assert bool(res.converged)
    assert int(res.iterations) == k_expect
    np.testing.assert_allclose(
        np.asarray(res.history)[:8], np.asarray(hist_expect), rtol=1e-12
    )
    # the reference's DEBUG quality gate: true relative residual
    # (cg.cc:150-153). 1e-11 bounds both recorded values (1.3e-12,
    # 2.5e-12) with an order of magnitude to spare.
    x = np.asarray(res.x)
    b_np = np.asarray(b)
    rel = np.linalg.norm(dia.mat_vec(x) - b_np) / np.linalg.norm(b_np)
    assert rel < 1e-11, rel
