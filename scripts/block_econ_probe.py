"""Block-CG hardware economics (round-3 VERDICT item 4).

The pitch for block CG on TPU is arithmetic intensity: the stencil's
band data streams from HBM once per iteration for ALL s right-hand
sides (cgx/solver/blockcg.py), so s/iter should grow far slower than
s, and solving an s-RHS family in one block iteration should beat s
sequential solves past some crossover s*. Until now that claim was
evidenced only by CPU iteration counts at n <= 65k; this probe
measures it on the chip:

  per s in {1, 2, 4, 8}:
    - slope-method seconds/iteration of breakdown-free block CG at
      fixed iteration counts (tol=0), fp32, N in {1e6, 4e6}
    - analytic bytes/iter (bands once + 4 block vectors) -> GB/s
    - cold time-to-quality: block solve of the s-RHS family to
      rel tol 1e-6 vs s sequential cg_solve runs of the same columns

The reference re-runs its entire solver once per RHS (cg_main.cc has
exactly one b); this measures the capability that obsoletes that.

Usage: python scripts/block_econ_probe.py [--grids 1000,2000]
           [--svals 1,2,4,8] > results/hw_queue_r3/block_econ.json
"""

import argparse
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

from cgx.bench.slope import slope_seconds_per_iter  # noqa: E402
from cgx.mats.device import lap2d_operator, source_term_device  # noqa: E402
from cgx.solver.blockcg import block_cg_solve  # noqa: E402
from cgx.solver.cg import cg_solve  # noqa: E402


from functools import partial  # noqa: E402


@partial(jax.jit, static_argnames=("s",))
def _family(b, s: int):
    """An s-column RHS family: the reference source term plus s-1
    independently re-weighted copies (smooth, mutually independent
    enough to exercise the full block)."""
    cols = [b]
    for j in range(1, s):
        key = jax.random.PRNGKey(j)
        w = jax.random.normal(key, b.shape, b.dtype)
        cols.append(b * (0.5 + 0.1 * j) + w * jnp.sqrt(
            jnp.vdot(b, b).real / b.shape[0]))
    return jnp.stack(cols, axis=1)


def probe_size(g: int, svals, reps: int) -> dict:
    n = g * g
    op = lap2d_operator(g, jnp.float32)
    b = source_term_device(n, jnp.float32)
    ndiag = op.bands.shape[0]
    row = {"g": g, "n": n, "ndiag": ndiag}

    for s in svals:
        entry = {}
        bs = _family(b, s) if s > 1 else b[:, None]
        jax.block_until_ready(bs)

        def run(bi, k):
            return block_cg_solve(op, bi, tol=0.0, maxiter=k).x

        def make_b(rep):
            key = jax.random.PRNGKey(1000 + rep)
            noise = jax.random.normal(key, bs.shape, bs.dtype)
            return np.asarray(bs * (1 + 1e-6) + 1e-6 * noise)

        try:
            sl = slope_seconds_per_iter(
                run, make_b, ks=(40, 80, 120), reps=reps,
            )
            entry["s_per_iter"] = sl["s_per_iter"]
            entry["fit_rel_err"] = sl.get("fit_rel_err")
            # analytic HBM floor: bands once + (X R P AP) block reads
            # + (X R P) writes, f32
            words = ndiag * n + 7 * n * s
            entry["bytes_per_iter"] = 4 * words
            entry["gbps"] = 4 * words / sl["s_per_iter"] / 1e9
            entry["s_per_iter_per_rhs"] = sl["s_per_iter"] / s
        except Exception as e:  # noqa: BLE001
            entry["slope_error"] = f"{type(e).__name__}: {e}"[:200]

        # cold time-to-quality: block vs sequential on the same family
        try:
            b_norm = float(jnp.sqrt(jnp.vdot(b, b).real))
            tol = 1e-6 * b_norm
            fnb = lambda bb: block_cg_solve(  # noqa: E731
                op, bb, tol=tol, maxiter=20000)
            res = fnb(bs)  # compile
            jax.block_until_ready(res.x)
            t0 = time.perf_counter()
            res = fnb(jnp.asarray(make_b(99)))
            jax.block_until_ready(res.x)
            entry["block_ttq_s"] = time.perf_counter() - t0
            entry["block_iters"] = int(np.asarray(res.iterations))

            fn1 = lambda bb: cg_solve(  # noqa: E731
                op, bb, tol=tol, maxiter=20000)
            r1 = fn1(bs[:, 0])  # compile
            jax.block_until_ready(r1.x)
            cols = jnp.asarray(make_b(99))
            jax.block_until_ready(cols)
            t0 = time.perf_counter()
            seq_iters = []
            for j in range(s):
                rj = fn1(cols[:, j])
                jax.block_until_ready(rj.x)
                seq_iters.append(int(np.asarray(rj.iterations)))
            entry["seq_ttq_s"] = time.perf_counter() - t0
            entry["seq_iters"] = seq_iters
            entry["block_speedup_vs_seq"] = (
                entry["seq_ttq_s"] / entry["block_ttq_s"]
            )
        except Exception as e:  # noqa: BLE001
            entry["ttq_error"] = f"{type(e).__name__}: {e}"[:200]

        row[f"s{s}"] = entry
        print(f"# g={g} s={s}: {entry}", file=sys.stderr, flush=True)
    return row


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--grids", default="1000,2000")
    ap.add_argument("--svals", default="1,2,4,8")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    svals = [int(v) for v in args.svals.split(",")]
    out = {}
    for g in [int(v) for v in args.grids.split(",")]:
        out[str(g)] = probe_size(g, svals, args.reps)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
