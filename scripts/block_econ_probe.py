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


_CSR_CACHE = {}


def _true_rels(op, x_block, b_block):
    """Host fp64 true relative residuals per column (reference
    quality gate, cg.cc:144-154). The CSR build is ~seconds at
    n=4e6 and this is called per ladder step — cache it per operator."""
    import scipy.sparse as sp

    n = b_block.shape[0]
    a = _CSR_CACHE.get((id(op), n))
    if a is None:
        bands = np.asarray(op.bands, np.float64)
        ri, ci, vals = [], [], []
        for k, off in enumerate(op.offsets):
            i0, i1 = max(0, -off), min(n, n - off)
            idx = np.arange(i0, i1)
            ri.append(idx)
            ci.append(idx + off)
            vals.append(bands[k, i0:i1])
        a = sp.coo_matrix(
            (np.concatenate(vals), (np.concatenate(ri), np.concatenate(ci))),
            shape=(n, n),
        ).tocsr()
        _CSR_CACHE.clear()
        _CSR_CACHE[(id(op), n)] = a
    x64 = np.asarray(x_block, np.float64)
    b64 = np.asarray(b_block, np.float64)
    r = a @ x64 - b64
    return list(
        np.linalg.norm(r, axis=0) / np.linalg.norm(b64, axis=0)
    )


def _quality_caps(n: int):
    """Geometric iteration-cap ladder up to ~2.5 sqrt(n) (CG needs
    O(sqrt(kappa)) ~ O(g) iterations on lap2d)."""
    caps, k = [], 256
    kmax = int(2.5 * np.sqrt(n))
    while k < kmax:
        caps.append(k)
        k = int(k * 1.45)
    caps.append(kmax)
    return caps


def _floored(rel_by_cap, caps):
    """True once the last two ladder steps improved the worst column
    by <5% each AND the trajectory has actually converged (worst rel
    < 1e-2). The convergence condition is load-bearing: at kappa ~
    4e5 the CG residual 2-norm TRANSIENTLY plateaus (even grows ~10x)
    for thousands of iterations before the superlinear drop — a
    plateau-only test declares a bogus 'floor' at rel ~ 8 and the
    quality target built from it is meaningless."""
    ks = [k for k in caps if k in rel_by_cap]
    if len(ks) < 3:
        return False
    a, b, c = (max(rel_by_cap[k]) for k in ks[-3:])
    return c < 1e-2 and b > 0.95 * a and c > 0.95 * b


def _iters_to(rel_by_cap, target, solve_at=None, refine_steps: int = 3):
    """Smallest measured cap whose WORST column is at/below target
    (None if never reached). With ``solve_at(k) -> [rels]``, bisects
    between the bracketing caps (the 1.45x ladder alone would
    quantize the block-vs-seq ratio too coarsely to adjudicate a
    ~1.3x amortization crossover)."""
    ks = sorted(rel_by_cap)
    hit = None
    for k in ks:
        if max(rel_by_cap[k]) <= target:
            hit = k
            break
    if hit is None:
        return None
    lo = max([k for k in ks if k < hit], default=0)
    hi = hit
    if solve_at is not None:
        for _ in range(refine_steps):
            if hi - lo <= max(8, hi // 32):
                break
            mid = (lo + hi) // 2
            if max(solve_at(mid)) <= target:
                hi = mid
            else:
                lo = mid
    return hi


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

        # Quality-matched time-to-quality (round-4 re-adjudication of
        # the round-3 negative): at f32 and these kappa the old
        # tol=1e-6*||b|| sits BELOW the attainable true-residual floor
        # (~eps32*kappa relative), so tol-crossing counted iterations
        # of noise-spinning at the floor, not convergence — the
        # measured "2-2.5x more block iterations" was that artifact
        # (g=400 CPU check: block and sequential TRUE-residual
        # trajectories are identical). Here both arms run capped with
        # tol=0, true residuals are recomputed in fp64 on the host
        # (the reference's own quality gate, cg.cc:144-154), the
        # shared target is 2x the worse arm's floor, and
        # time-to-quality = iters-to-target x slope sec/iter.
        try:
            caps = _quality_caps(n)
            blk_rel = {}
            for k in caps:
                res = block_cg_solve(op, bs, tol=0.0, maxiter=k)
                rels = _true_rels(op, np.asarray(res.x), np.asarray(bs))
                blk_rel[k] = rels
                print(f"#   block s={s} k={k}: max_rel={max(rels):.3e}",
                      file=sys.stderr, flush=True)
                if _floored(blk_rel, caps):
                    break
            seq_rel = {}
            if s == 1:
                seq_rel = {k: v for k, v in blk_rel.items()}
                entry["seq_is_block"] = True
            else:
                for k in caps:
                    rels = []
                    for j in range(s):
                        rj = cg_solve(op, bs[:, j], tol=0.0, maxiter=k)
                        rels.append(_true_rels(
                            op, np.asarray(rj.x)[:, None],
                            np.asarray(bs[:, j])[:, None])[0])
                    seq_rel[k] = rels
                    print(f"#   seq s={s} k={k}: max_rel={max(rels):.3e}",
                          file=sys.stderr, flush=True)
                    if _floored(seq_rel, caps):
                        break
            blk_floor = min(max(v) for v in blk_rel.values())
            seq_floor = min(max(v) for v in seq_rel.values())
            target = 2.0 * max(blk_floor, seq_floor)

            def blk_at(k):
                res = block_cg_solve(op, bs, tol=0.0, maxiter=k)
                return _true_rels(op, np.asarray(res.x), np.asarray(bs))

            blk_k = _iters_to(blk_rel, target, solve_at=blk_at)
            if entry.get("seq_is_block"):
                seq_k = blk_k  # s=1: same solve, speedup is 1 by def
            else:
                # sequential: each column independently to the target
                seq_k = 0
                for j in range(s):
                    col = {k: [v[j]] for k, v in seq_rel.items()}

                    def seq_at(k, _j=j):
                        rj = cg_solve(op, bs[:, _j], tol=0.0, maxiter=k)
                        return _true_rels(
                            op, np.asarray(rj.x)[:, None],
                            np.asarray(bs[:, _j])[:, None])

                    kj = _iters_to(col, target, solve_at=seq_at)
                    seq_k = (
                        None if (kj is None or seq_k is None) else seq_k + kj
                    )
            entry["quality_target_rel"] = target
            entry["block_floor_rel"] = blk_floor
            entry["seq_floor_rel"] = seq_floor
            entry["block_iters_to_q"] = blk_k
            entry["seq_iters_to_q_total"] = seq_k
            spi = entry.get("s_per_iter")
            if spi and blk_k and seq_k:
                # sequential per-iteration cost = the s=1 slope if
                # already measured at this size, else this row's
                # per-RHS slope (conservative for the block)
                spi1 = row.get("s1", {}).get("s_per_iter", spi / s)
                entry["block_ttq_s"] = blk_k * spi
                entry["seq_ttq_s"] = seq_k * spi1
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
