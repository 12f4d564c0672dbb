"""Large-N fp64-QUALITY race (round-3 VERDICT item 1).

Every number the reference published is an fp64 solve judged by the
true-residual DEBUG gate (cg.cc:144-154); its dense storage capped it
at N=16384. This probe races end-to-end fp64-quality candidates (true
relative residual < 1e-10) at N = 4e6 and ~1e7 on the real chip:

  mg_mixed      fp64 PCG, fp32 multigrid V-cycle preconditioner
  refine_mg     fp64 refinement sweeps around an fp32 MG-PCG inner
                (refine_pcg_sweeps: ONE dispatch)
  refine_stream fp64 refinement around the fp32 streaming
                Neumann-PCG kernel (iterative_refinement use_pallas)
  fp64_plain    (optional, --plain) the emulated-fp64 XLA loop

Problems are built ON DEVICE (cgx.mats.device) — no 400 MB band
upload through the relay. Timed runs perturb b on device with a fresh
seed so the relay result cache cannot short-circuit; each timed region
ends with a scalar fetch. Quality is the device-computed fp64 true
relative residual against the unperturbed operator.

Usage: python scripts/fp64q_probe.py [--grids 2000,3200] [--plain]
           [--reps 3] > results/hw_queue_r3/fp64q.json
"""

import argparse
import contextlib
import json
import os
import signal
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/tmp/cgx_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from cgx.mats.device import lap2d_operator, source_term_device  # noqa: E402
from cgx.solver.cg import cg_solve  # noqa: E402
from cgx.solver.multigrid import mg_preconditioner  # noqa: E402
from cgx.ops.dd import residual_dd  # noqa: E402
from cgx.solver.refine import (  # noqa: E402
    iterative_refinement, refine_pcg_sweeps, refine_pcg_sweeps_dd,
    refine_pcg_sweeps_tw,
)

REL_GATE = 1e-10  # the reference's printed quality metric threshold


@contextlib.contextmanager
def deadline(seconds: int):
    def _raise(signum, frame):
        raise TimeoutError(f"exceeded {seconds}s")

    old = signal.signal(signal.SIGALRM, _raise)
    signal.alarm(seconds)
    try:
        yield
    finally:
        signal.alarm(0)
        signal.signal(signal.SIGALRM, old)


@jax.jit
def _perturb(b, seed):
    noise = jax.random.normal(jax.random.PRNGKey(seed), b.shape, b.dtype)
    return b * (1.0 + 1e-13 * noise)


def probe_size(g: int, reps: int, include_plain: bool,
               only=None, dd_sweeps: int = 16) -> dict:
    n = g * g
    op64 = lap2d_operator(g, jnp.float64)
    b64 = source_term_device(n, jnp.float64)
    b_norm = float(jnp.sqrt(jnp.vdot(b64, b64).real))

    offsets = tuple(op64.offsets)

    # NOTE: every evaluator takes the band array as an ARGUMENT.
    # Closing over op64 bakes its 400 MB (N=1e7, fp64) of bands into
    # the jitted program as constants, and the relay's compile request
    # carries program constants — measured HTTP 413 at g=3200
    # (results/hw_queue_r3/fp64q_g3200_tw.log).
    @jax.jit
    def _rel64(bands, x, b):
        from cgx.solver.operators import banded_matvec

        r = b - banded_matvec(bands, offsets, x)
        return jnp.sqrt(jnp.vdot(r, r).real) / jnp.sqrt(
            jnp.vdot(b, b).real
        )

    def true_rel(x, b):
        return _rel64(op64.bands, x, b)

    @jax.jit
    def _rel_tw(bands, x_words, b):
        from cgx.ops.tw32 import residual_tw, tw_from_f64

        _, r_norm = residual_tw(bands.astype(jnp.float32), offsets,
                                tw_from_f64(b), x_words)
        return r_norm / jnp.sqrt(jnp.vdot(b, b).real)

    def true_rel_tw(x_words, b):
        """True relative residual of the f32 triple, evaluated in
        triple-word f32 (f32 EFTs are device-exact:
        results/hw_queue_r3/eft_probe.json)."""
        return _rel_tw(op64.bands, x_words, b)

    def host_referee_tw(x_words, b) -> float:
        """Download the triple + b and evaluate ||b - A x|| / ||b|| in
        x86 longdouble (eps ~ 5.4e-20) — an independent referee below
        every level asserted here."""
        xl = sum(np.asarray(w, np.longdouble) for w in x_words)
        bl = np.asarray(b, np.longdouble)
        bands = np.asarray(op64.bands, np.longdouble)
        r = bl.copy()
        for d, off in enumerate(tuple(op64.offsets)):
            sh = np.zeros(n, np.longdouble)
            if off == 0:
                sh = xl
            elif off > 0:
                sh[:n - off] = xl[off:]
            else:
                sh[-off:] = xl[:off]
            r -= bands[d] * sh
        return float(np.sqrt(np.sum(r * r)) / np.sqrt(np.sum(bl * bl)))

    @jax.jit
    def _rel_dd(bands, x_hi, x_lo, b):
        _, r_norm = residual_dd(bands, offsets, b, x_hi, x_lo)
        return r_norm / jnp.sqrt(jnp.vdot(b, b).real)

    def true_rel_dd(x_hi, x_lo, b):
        """True relative residual of the dd pair, evaluated with
        error-free transforms (the fp64 expression b - A x cannot see
        below ~eps*kappa — measured 5.03e-10 at N=4e6)."""
        return _rel_dd(op64.bands, x_hi, x_lo, b)

    row = {"g": g, "n": n, "b_norm": b_norm}

    t0 = time.perf_counter()
    mg32 = mg_preconditioner(op64, g, dtype=jnp.float32)
    # force hierarchy materialization before stopping the clock
    jax.block_until_ready(mg32.fine.bands)
    for op in mg32.coarse_ops:
        jax.block_until_ready(op.bands)
    if mg32.coarsest_inv is not None:
        jax.block_until_ready(mg32.coarsest_inv)
    row["mg_setup_s"] = time.perf_counter() - t0
    row["mg_grids"] = list(mg32.grids)

    candidates = {
        "mg_mixed": lambda b: cg_solve(
            op64, b, tol=3e-11 * b_norm, maxiter=400,
            precond=mg32.apply_mixed,
        ),
        "refine_mg": lambda b: refine_pcg_sweeps(
            op64, b, precond=mg32.apply, sweeps=8, inner_tol=1e-6,
            inner_maxiter=80,
        ),
        "refine_stream": lambda b: iterative_refinement(
            op64, b, use_pallas=True, inner_maxiter=40000,
        ),
        "refine_mg_dd": lambda b: refine_pcg_sweeps_dd(
            op64, b, precond=mg32.apply, sweeps=dd_sweeps, rtol=3e-11,
            inner_tol=1e-6, inner_maxiter=80,
        ),
        # triple-word f32 outer: the TPU-native beyond-fp64 path (the
        # dd path is hardware-invalid here — see cgx/ops/tw32.py and
        # results/hw_queue_r3/eft_probe.json)
        "refine_mg_tw": lambda b: refine_pcg_sweeps_tw(
            op64, b, precond=mg32.apply, sweeps=dd_sweeps, rtol=3e-11,
            inner_tol=1e-6, inner_maxiter=80,
        ),
    }
    if include_plain:
        candidates["fp64_plain"] = lambda b: cg_solve(
            op64, b, tol=3e-11 * b_norm, maxiter=60000
        )

    for name, fn in candidates.items():
        if only and name not in only:
            continue
        entry = {}
        try:
            with deadline(900):
                t0 = time.perf_counter()
                res = fn(b64)
                if hasattr(res, "x_words"):
                    rel = float(true_rel_tw(res.x_words, b64))
                    entry["rel_fp64_eval_of_sum"] = float(
                        true_rel(res.x, b64)
                    )
                    entry["rel_host_longdouble"] = host_referee_tw(
                        res.x_words, b64
                    )
                elif hasattr(res, "x_lo"):
                    rel = float(true_rel_dd(res.x_hi, res.x_lo, b64))
                    entry["rel_fp64_eval_of_hi"] = float(
                        true_rel(res.x_hi, b64)
                    )
                else:
                    rel = float(true_rel(res.x, b64))
                entry["first_run_s"] = time.perf_counter() - t0
                entry["true_rel_resid"] = rel
                entry["converged"] = bool(np.asarray(res.converged))
                its = getattr(res, "iterations", None)
                if its is not None:
                    entry["iterations"] = int(np.asarray(its))
                inner = getattr(res, "inner_iterations", None)
                if inner is not None and np.asarray(inner).size:
                    entry["inner_iterations"] = (
                        np.asarray(inner).ravel().tolist()
                    )
                outer = getattr(res, "outer_iterations", None)
                if outer is not None:
                    entry["outer_sweeps"] = int(outer)
                hist = getattr(res, "residual_history", None)
                if hist is not None:
                    h = np.asarray(hist)
                    entry["rel_resid_per_sweep"] = [
                        float(v) / b_norm for v in h[~np.isnan(h)]
                    ]
            times = []
            with deadline(900):
                for rep in range(reps):
                    bi = _perturb(b64, rep + 1)
                    jax.block_until_ready(bi)
                    float(jnp.zeros(()) + rep)  # drain dispatch queue
                    t0 = time.perf_counter()
                    r2 = fn(bi)
                    # scalar fetch forces completion through the relay
                    float(np.asarray(r2.residual_norm))
                    times.append(time.perf_counter() - t0)
                if hasattr(r2, "x_words"):
                    entry["final_rel_resid"] = float(
                        true_rel_tw(r2.x_words, bi)
                    )
                elif hasattr(r2, "x_lo"):
                    entry["final_rel_resid"] = float(
                        true_rel_dd(r2.x_hi, r2.x_lo, bi)
                    )
                else:
                    entry["final_rel_resid"] = float(true_rel(r2.x, bi))
            times.sort()
            entry["times_s"] = times
            entry["median_s"] = times[len(times) // 2]
            entry["gate_pass"] = (
                entry["converged"] and entry["true_rel_resid"] < REL_GATE
            )
        except Exception as e:  # noqa: BLE001 — record and keep racing
            entry["error"] = f"{type(e).__name__}: {e}"[:200]
        row[name] = entry
        print(f"# g={g} {name}: {entry}", file=sys.stderr, flush=True)
    return row


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--grids", default="2000,3200")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--plain", action="store_true")
    ap.add_argument("--only", default=None,
                    help="comma-separated candidate filter")
    ap.add_argument("--dd-sweeps", type=int, default=16)
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (wiring smoke test)")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    only = set(args.only.split(",")) if args.only else None
    out = {}
    for g in [int(s) for s in args.grids.split(",")]:
        out[str(g)] = probe_size(g, args.reps, args.plain, only,
                                 dd_sweeps=args.dd_sweeps)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
