"""fp64-QUALITY row OFF the MG-friendly grid (round-4 VERDICT item 6).

Every quality-gated large-N row so far used the geometric-MG inner on a
square lap2d grid. The reference's .mtx path implies arbitrary SPD
operators (/root/reference/code/CUDA/cg_main.cc:36-37), where geometric
MG may not apply. This probe runs the triple-word refinement with the
documented no-MG fallback — a Jacobi-preconditioned plain fp32 CG
inner — on a variable-coefficient Poisson operator (checkerboard
coefficient jumps, cgx.mats.generators.poisson2d_var): banded, SPD,
NOT the constant-stencil operator the MG hierarchy was built for.

Gate: tw-evaluated true relative residual < 1e-10 (the reference's
cg.cc:144-154 metric), plus a host-longdouble cross-check of the final
residual.

Usage: python scripts/fp64q_offgrid.py [g] > out.json
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/tmp/cgx_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from cgx.mats.generators import poisson2d_var, source_term  # noqa: E402
from cgx.ops.tw32 import residual_tw, tw_from_f64  # noqa: E402
from cgx.solver.operators import DiaOperator  # noqa: E402
from cgx.solver.refine import refine_pcg_sweeps_tw  # noqa: E402


def _host_longdouble_rel(dia_host, x_words, b64):
    """Banded mat-vec in numpy longdouble: gate cross-check.

    x is reconstructed in longdouble from the THREE tw words — collapsing
    to a single f64 first would discard ~kappa*2^-53 of certifiable
    residual (measured: 1.33e-10 at g=1024 contrast 8, vs the true
    solution's sub-1e-11; results/hw_queue_r4/fp64q_offgrid.json was
    this very mistake)."""
    bands = np.asarray(dia_host.bands, np.longdouble)
    offs = list(dia_host.offsets)
    x = sum(np.asarray(w, np.longdouble) for w in x_words)
    n = x.shape[0]
    b = np.asarray(b64, np.longdouble)
    ax = np.zeros(n, np.longdouble)
    for k, off in enumerate(offs):
        i0, i1 = max(0, -off), min(n, n - off)
        ax[i0:i1] += bands[k, i0:i1] * x[i0 + off : i1 + off]
    r = ax - b
    return float(np.sqrt(np.sum(r * r)) / np.sqrt(np.sum(b * b)))


def main():
    g = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    n = g * g
    dev = jax.devices()[0].device_kind
    print(f"# device {dev} g={g} n={n}", file=sys.stderr, flush=True)

    # checkerboard coefficient jumps: kappa ~ contrast * lap2d kappa.
    # 8x8-cell checkerboard of 1.0 / 8.0 diffusion coefficients.
    cells = 8
    rng = np.random.default_rng(11)
    board = np.where(
        (np.indices((cells, cells)).sum(axis=0) % 2).astype(bool), 8.0, 1.0
    )
    coeff = np.kron(board, np.ones((g // cells, g // cells)))
    coeff = coeff[:g, :g]
    dia = poisson2d_var(g, coeff)
    op64 = DiaOperator(jnp.asarray(dia.bands, jnp.float64),
                       tuple(dia.offsets))
    b64 = jnp.asarray(source_term(n), jnp.float64)

    # no-MG inner: Jacobi (inverse-diagonal) in fp32 — the documented
    # fallback class for operators the grid hierarchy cannot decode
    d0 = list(dia.offsets).index(0)
    inv_diag32 = jnp.asarray(1.0 / np.asarray(dia.bands[d0]), jnp.float32)

    def jacobi(r):
        return r * inv_diag32

    def solve(rhs):
        return refine_pcg_sweeps_tw(
            op64, rhs, precond=jacobi, sweeps=24, rtol=3e-11,
            inner_tol=1e-6, inner_maxiter=20000,
        )

    t0 = time.time()
    res = solve(b64)
    jax.block_until_ready(res.x_words)
    elapsed = time.time() - t0

    # warm re-solves with perturbed RHS (cache-proof): the race-table
    # row wants steady-state solve time, not the one-time compile
    warm = []
    for rep in range(3):
        bw = b64 * (1.0 + 1e-13 * (rep + 1))
        t0 = time.time()
        rw = solve(bw)
        jax.block_until_ready(rw.x_words)
        warm.append(time.time() - t0)
    warm_median = float(np.median(warm))

    offsets = tuple(op64.offsets)

    # Independent gate recomputation. The bands are NOT f32-exact here
    # (harmonic-mean coefficients), so the gate must evaluate the exact
    # 3-word band split — a single f32 plane is a ~6e-8 relative operator
    # perturbation, which x kappa swamps a 1e-10 gate (the session-1 run
    # measured exactly that: tw-vs-f32-plane disagreement 1.03e-3).
    from cgx.ops.tw32 import bands_f32_exact, split_bands_tw

    assert not bands_f32_exact(op64.bands), "probe wants non-f32-exact bands"
    outer_bands = split_bands_tw(op64.bands)

    @jax.jit
    def rel_tw(outer_bands, x_words, b):
        _, r_norm = residual_tw(outer_bands, offsets, tw_from_f64(b), x_words)
        return r_norm / jnp.sqrt(jnp.vdot(b, b).real)

    rel = float(rel_tw(outer_bands, res.x_words, b64))
    rel_solver = float(res.residual_norm / jnp.sqrt(jnp.vdot(b64, b64).real))
    rel_ld = _host_longdouble_rel(
        dia, [np.asarray(w) for w in res.x_words], np.asarray(b64))
    out = {
        "device": dev,
        "g": g,
        "n": n,
        "candidate": "refine_jacobi_tw",
        "coeff_contrast": 8.0,
        "first_solve_s": round(elapsed, 3),
        "warm_solve_s_median": round(warm_median, 4),
        "warm_solve_s": [round(w, 4) for w in warm],
        "sweeps": int(res.outer_iterations),
        "inner_iterations": int(np.sum(np.asarray(res.inner_iterations))),
        "true_rel_tw": rel,
        "true_rel_tw_solver": rel_solver,
        "true_rel_longdouble": rel_ld,
        "gate_pass": bool(res.converged) and rel < 1e-10 and rel_ld < 1e-10,
    }
    print(json.dumps(out, indent=1))
    print(json.dumps(out), file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()
