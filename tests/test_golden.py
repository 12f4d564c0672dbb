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
