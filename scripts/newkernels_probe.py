"""Measure the session's three new kernels on real hardware.

1. Whole-solve VMEM kernel, (rows, cols)-plane layout (layout='2d')
   vs the (1, n) layout — per-iteration time below the old ceiling and
   coverage above it (the 1-D layout is Mosaic-rejected past ~32 MB
   state; the 2-D layout should compile to VMEM capacity).
2. HBM-streaming fused-iteration Chronopoulos-Gear kernel
   (cgx.ops.cg_stream) vs the XLA-fused flat CG (round-2 champion) at
   N where state exceeds VMEM — targets the 62-67% -> ~30% roofline
   fall-off the flat loop shows at N=1e6..1e7 (BENCHMARKS.md).
3. Fused matrix-powers s-step basis (cgx.ops.dia_powers) vs the
   2s-mat-vec basis build inside sstep fp32.

All numbers via the slope method (cgx.bench.slope): fixed-iteration
solves at several maxiter values, per-iteration time from the fitted
line, median over perturbed-RHS reps — the relay's ~40 ms dispatch
floor cancels.

Usage: python scripts/newkernels_probe.py [stage ...] > out.json
  stages: vmem2d stream powers (default: all)
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/cgx_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from cgx.bench.slope import (  # noqa: E402
    chip_hbm_gbps,
    dia_cg_bytes_per_iter,
    slope_seconds_per_iter,
)
from cgx.mats.generators import lap2d_fd  # noqa: E402
from cgx.ops.cg_kernel import dia_cg_solve_vmem  # noqa: E402
from cgx.ops.cg_stream import (  # noqa: E402
    dia_cg_solve_stream,
    dia_cg_solve_stream_pcg,
)
from cgx.solver.cg import cg_solve  # noqa: E402
from cgx.solver.operators import DiaOperator  # noqa: E402
from cgx.solver.pipelined import pipelined_cg_solve  # noqa: E402
from cgx.solver.sstep import sstep_cg_solve  # noqa: E402


def problem(n_target):
    g = int(np.sqrt(n_target))
    dia = lap2d_fd(g)
    n = dia.shape[0]
    op = DiaOperator(
        jnp.asarray(np.asarray(dia.bands, np.float32)), tuple(dia.offsets)
    )
    rs = np.random.default_rng(0)

    def make_b(rep):
        return (1.0 + 0.01 * (rep + 2)) * rs.standard_normal(n).astype(
            np.float32
        )

    return op, n, make_b


def measure(row, tag, run, make_b, ideal_bytes, peak, ks):
    last = None
    for _try in range(3):
        try:
            r = slope_seconds_per_iter(run, make_b, ks=ks, reps=5)
            break
        except Exception as e:  # noqa: BLE001
            last = e
    else:
        row[f"{tag}_err"] = repr(last)[:160]
        print(f"#   {tag}: ERR {row[f'{tag}_err']}", file=sys.stderr,
              flush=True)
        return None
    row[f"{tag}_us"] = r["s_per_iter"] * 1e6
    row[f"{tag}_pct"] = ideal_bytes / r["s_per_iter"] / peak * 100
    row[f"{tag}_fit"] = r["fit_rel_err"]
    row[f"{tag}_spread"] = r["ts_spread"]
    print(
        f"#   {tag}: {row[f'{tag}_us']:.1f}us"
        f" ({row[f'{tag}_pct']:.0f}% of mem-roofline)"
        f" fit {row[f'{tag}_fit']:.3f} spread {row[f'{tag}_spread']:.3f}",
        file=sys.stderr, flush=True,
    )
    return r


def stage_vmem2d(out, peak):
    # below the 1-D ceiling: head-to-head; above: 2-D only
    # 2.0e6 sits just under the analytic capacity guard (est ~120 MiB);
    # 2.4e6 documents the guard's clean ValueError (was a Mosaic OOM)
    for n_target, both in ((250_000, True), (810_000, True),
                           (1_600_000, False), (2_000_000, False),
                           (2_400_000, False)):
        op, n, make_b = problem(n_target)
        ndiag = op.bands.shape[0]
        state_mb = (ndiag + 4) * n * 4 / 1e6
        row = {"n": n, "state_mb": round(state_mb, 1)}
        # VMEM-resident: per-iter traffic is ~zero; report us/iter and
        # the equivalent streaming-CG roofline pct for context
        cg_bytes = dia_cg_bytes_per_iter(n, ndiag, 4)
        ks = (256, 512, 1024)
        if both:
            def run1(b, k):
                return dia_cg_solve_vmem(
                    op, b, tol=0.0, maxiter=k, chunk=64
                ).x

            measure(row, "vmem1d", run1, make_b, cg_bytes, peak, ks)

        def run2(b, k):
            return dia_cg_solve_vmem(
                op, b, tol=0.0, maxiter=k, chunk=64, layout="2d"
            ).x

        measure(row, "vmem2d", run2, make_b, cg_bytes, peak, ks)
        out.setdefault("vmem2d", []).append(row)


def stage_stream(out, peak):
    for n_target in (1_000_000, 4_000_000, 10_000_000):
        op, n, make_b = problem(n_target)
        ndiag = op.bands.shape[0]
        cg_bytes = dia_cg_bytes_per_iter(n, ndiag, 4)
        # the stream kernel's analytic traffic: (ndiag + 10) N words
        stream_bytes = (ndiag + 10.0) * n * 4
        row = {"n": n}
        ks = (64, 128, 256) if n_target >= 4_000_000 else (128, 256, 512)

        def run_flat(b, k):
            return cg_solve(op, b, tol=0.0, maxiter=k).x

        def run_pipe(b, k):
            return pipelined_cg_solve(op, b, tol=0.0, maxiter=k).x

        def run_stream(b, k):
            return dia_cg_solve_stream(op, b, tol=0.0, maxiter=k).x

        # PCG traffic: u joins the streamed state, (ndiag + 12) N words
        pcg_bytes = (ndiag + 12.0) * n * 4

        def run_stream_pcg(b, k):
            return dia_cg_solve_stream_pcg(op, b, tol=0.0, maxiter=k).x

        measure(row, "flat", run_flat, make_b, cg_bytes, peak, ks)
        measure(row, "pipelined", run_pipe, make_b, cg_bytes, peak, ks)
        measure(row, "stream", run_stream, make_b, stream_bytes, peak, ks)
        measure(row, "stream_pcg", run_stream_pcg, make_b, pcg_bytes,
                peak, ks)
        out.setdefault("stream", []).append(row)


def stage_powers(out, peak):
    s = 4
    for n_target in (1_000_000, 4_000_000):
        op, n, make_b = problem(n_target)
        ndiag = op.bands.shape[0]
        # s-step per-iteration traffic ~ basis build amortized: off =
        # 2s band passes / s iters; powers = 1 pass + basis write
        cg_bytes = dia_cg_bytes_per_iter(n, ndiag, 4)
        row = {"n": n, "s": s}
        ks = (96, 192, 384) if n_target < 4_000_000 else (48, 96, 192)
        bounds = (1e-4, 8.0)

        def run_off(b, k):
            return sstep_cg_solve(
                op, b, s=s, tol=0.0, maxiter=k, bounds=bounds
            ).x

        def run_pow(b, k):
            return sstep_cg_solve(
                op, b, s=s, tol=0.0, maxiter=k, bounds=bounds,
                powers="pallas",
            ).x

        measure(row, "sstep_off", run_off, make_b, cg_bytes, peak, ks)
        measure(row, "sstep_powers", run_pow, make_b, cg_bytes, peak, ks)
        out.setdefault("powers", []).append(row)


def main():
    peak = chip_hbm_gbps() * 1e9
    stages = sys.argv[1:] or ["vmem2d", "stream", "powers"]
    print(f"# device {jax.devices()[0].device_kind}, peak {peak/1e9} GB/s",
          file=sys.stderr, flush=True)
    out = {"device": jax.devices()[0].device_kind, "peak_gbps": peak / 1e9}
    for st in stages:
        print(f"# stage {st}", file=sys.stderr, flush=True)
        {"vmem2d": stage_vmem2d, "stream": stage_stream,
         "powers": stage_powers}[st](out, peak)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
