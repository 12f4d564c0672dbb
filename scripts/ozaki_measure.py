"""Slope-measure the Ozaki dense fp64-quality CG vs emulated fp64 on
the real chip (run under the default axon/TPU platform).

Reports s/iter, achieved GB/s vs the analytic traffic (S bf16 slices
of A per mat-vec), and the speedup over the XLA emulated-fp64 dense
path (BENCHMARKS.md: 58.4 ms/iter at N=1e4).
"""

import json
import sys

import jax

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/tmp/cgx_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from cgx.bench.slope import (  # noqa: E402
    slope_seconds_per_iter,
    utilization_report,
)
from cgx.mats.generators import lap2d_fd  # noqa: E402
from cgx.ops.ozaki import OzakiDenseOperator  # noqa: E402
from cgx.solver.cg import cg_solve  # noqa: E402
from cgx.solver.operators import as_operator, densify_on_device  # noqa: E402


def main():
    g = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    slices = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    dia = lap2d_fd(g)
    n = dia.shape[0]
    op64 = as_operator(dia, dtype=jnp.float64)
    dense = densify_on_device(op64)
    print(f"# building Ozaki slices on device (n={n}, S={slices})...",
          file=sys.stderr, flush=True)
    import time
    t0 = time.perf_counter()
    oz = OzakiDenseOperator.from_dense(dense.a, num_slices=slices)
    float(np.asarray(oz.sigma[0]))
    setup_s = time.perf_counter() - t0
    print(f"# slice setup: {setup_s:.2f}s", file=sys.stderr, flush=True)

    rs = np.random.default_rng(0)

    def make_b(rep):
        return (1.0 + 0.01 * (rep + 2)) * rs.standard_normal(n)

    results = {}
    for name, op, ks, reps in [
        ("ozaki_dense64", oz, (50, 100, 150), 3),
        ("xla_dense64_emulated", dense, (10, 20, 30), 3),
    ]:
        def run(b, k, _op=op):
            return cg_solve(_op, b, tol=0.0, maxiter=k).x

        out = slope_seconds_per_iter(run, make_b, ks=ks, reps=reps)
        if name.startswith("ozaki"):
            bpi = float(slices) * n * n * 1  # S int8 slices of A
        else:
            bpi = float(n) * n * 8  # one fp64 pass over A
        out.update(utilization_report(out["s_per_iter"], bpi))
        out["bytes_per_iter"] = bpi
        results[name] = out
        print(f"# {name}: {out['s_per_iter']*1e3:.3f} ms/iter, "
              f"{out['achieved_gbps']:.0f} GB/s "
              f"({100*out['fraction_of_peak']:.0f}% of peak), "
              f"fit_rel_err={out['fit_rel_err']:.2e}",
              file=sys.stderr, flush=True)

    # quality: one real solve to tol 1e-10, true residual check
    from cgx.mats.generators import source_term
    b = jnp.asarray(source_term(n))
    res = cg_solve(oz, b, tol=1e-10, maxiter=n)
    x = np.asarray(res.x)
    a_bands = np.asarray(dia.bands)
    r = dia.mat_vec(x) - np.asarray(b)
    rel = float(np.linalg.norm(r) / np.linalg.norm(np.asarray(b)))
    results["quality"] = {
        "iterations": int(res.iterations),
        "converged": bool(res.converged),
        "true_rel_residual": rel,
        "slice_setup_s": setup_s,
    }
    print(f"# quality: k={int(res.iterations)} converged={bool(res.converged)} "
          f"true rel resid={rel:.3e}", file=sys.stderr, flush=True)
    speed = (results["xla_dense64_emulated"]["s_per_iter"]
             / results["ozaki_dense64"]["s_per_iter"])
    results["ozaki_speedup_vs_emulated_fp64"] = speed
    print(f"# ozaki speedup vs emulated fp64: {speed:.1f}x",
          file=sys.stderr, flush=True)
    print(json.dumps(results, default=float))


if __name__ == "__main__":
    main()
