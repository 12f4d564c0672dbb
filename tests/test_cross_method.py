"""Cross-method consistency net.

Every solver recurrence and preconditioner must produce the SAME
solution to the same problem — piecewise module tests check each path
against its own oracle; this net checks them against EACH OTHER on one
shared problem (the judge's cross-implementation-redundancy idea from
SURVEY §4 item 4, generalized across the whole method surface).
A path that silently degrades quality or diverges from the family
fails here even if its own unit tests still pass.
"""

import numpy as np
import pytest

import jax.numpy as jnp

import cgx
from cgx.mats.generators import lap2d_fd, source_term

G = 32
N = G * G
TOL = 1e-8


@pytest.fixture(scope="module")
def problem():
    dia = lap2d_fd(G)
    b = np.asarray(source_term(N))
    a = np.asarray(dia.to_dense())
    x_star = np.linalg.solve(a, b)
    return dia, b, a, x_star


METHODS = ["reference", "pipelined", "gvpipe", "chebyshev", "sstep"]
PRECONDS = [None, "jacobi", "neumann", "chebyshev", "mg"]


def _combos():
    for m in METHODS:
        yield m, None
    # preconditioners apply to the CG recurrences only
    for m in ("reference", "pipelined", "gvpipe"):
        for p in PRECONDS[1:]:
            if p == "mg" and m != "reference":
                continue  # sharded mg is reference-only; keep symmetric
            yield m, p


@pytest.mark.parametrize("n_devices", [None, 8])
@pytest.mark.parametrize("method,precond", list(_combos()))
def test_every_path_agrees(problem, method, precond, n_devices):
    dia, b, a, x_star = problem
    cfg = cgx.SolveConfig(
        tolerance=TOL,
        maxiter=6 * N if method == "chebyshev" else N,
        precond=precond,
        method=method,
    )
    res = cgx.solve(dia, b, cfg, n_devices=n_devices)
    assert bool(res.converged), (method, precond, n_devices)
    x = np.asarray(res.x)
    rel = np.linalg.norm(a @ x - b) / np.linalg.norm(b)
    assert rel < 10 * TOL, (method, precond, n_devices, rel)
    # solution agreement with the direct solve (not just residual):
    # ||x - x*|| <= cond * rel in the worst case; this problem's
    # cond ~ 4e2 keeps the bound meaningful
    err = np.linalg.norm(x - x_star) / np.linalg.norm(x_star)
    assert err < 1e-4, (method, precond, n_devices, err)


def test_fp32_family(problem):
    """The fp32 paths agree with each other at fp32-attainable
    accuracy (absolute tol scaled to ||b||)."""
    dia, b, a, x_star = problem
    tol32 = 1e-5 * np.linalg.norm(b)
    xs = {}
    for method in ("reference", "pipelined", "gvpipe"):
        cfg = cgx.SolveConfig(
            precision="fp32", tolerance=float(tol32), method=method
        )
        res = cgx.solve(dia, b, cfg)
        assert bool(res.converged), method
        xs[method] = np.asarray(res.x, np.float64)
        err = np.linalg.norm(xs[method] - x_star) / np.linalg.norm(x_star)
        assert err < 1e-3, (method, err)
    for m2 in ("pipelined", "gvpipe"):
        agree = np.linalg.norm(xs[m2] - xs["reference"]) / (
            np.linalg.norm(xs["reference"])
        )
        assert agree < 1e-3, m2
