"""Attempt an on-device profile through the relay (round-3 VERDICT
item 3).

The reference's optimization story was profile-driven (its
figures/gprof.png: "Matrix vector products takes majority of running
time"); cgx's stream-kernel forensics (BENCHMARKS sessions 9-10) were
black-box-timing only, concluding "needs xprof on directly-attached
hardware" WITHOUT ever attempting `jax.profiler.trace` against the
relay chip. This script is that attempt, with the exact call and exact
failure recorded either way:

1. wrap one streaming-kernel solve at N=4e6 (the 49-53%-of-peak
   mystery) in `cgx.utils.timer.trace`;
2. wrap one XLA-fused-loop solve at N=4e6 (the cliff regime);
3. list what landed in the trace directory; if .xplane.pb files
   exist, dump the top device ops by self-time via
   tensorflow.python.profiler (if importable) or record the raw file
   inventory for offline xprof.

Usage: python scripts/profile_attempt.py [--outdir /tmp/cgx_xprof]
"""

import argparse
import glob
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--outdir", default="/tmp/cgx_xprof")
    ap.add_argument("--grid", type=int, default=2000)
    args = ap.parse_args()

    from cgx.mats.device import lap2d_operator, source_term_device
    from cgx.ops.cg_stream import dia_cg_solve_stream
    from cgx.solver.cg import cg_solve  # XLA fused while-loop path
    from cgx.utils.timer import trace

    g = args.grid
    n = g * g
    op32 = lap2d_operator(g, jnp.float32)
    b32 = source_term_device(n, jnp.float32)
    report = {"device": str(jax.devices()[0]), "grid": g}

    # warm both paths OUTSIDE the trace so the trace captures steady
    # state, not compiles (progress markers: the first attempt wedged
    # with zero output and only the 1200 s SIGTERM to show for it)
    print("# warmup: stream", file=sys.stderr, flush=True)
    res = dia_cg_solve_stream(op32, b32, tol=0.0, maxiter=50)
    float(np.asarray(res.residual_norm))
    print("# warmup: xla loop", file=sys.stderr, flush=True)
    res = cg_solve(op32, b32, tol=0.0, maxiter=50)
    float(np.asarray(res.residual_norm))
    print("# warmup done", file=sys.stderr, flush=True)

    for name, fn in [
        ("stream", lambda: dia_cg_solve_stream(op32, b32, tol=0.0,
                                               maxiter=200)),
        ("xla_loop", lambda: cg_solve(op32, b32, tol=0.0,
                                      maxiter=200)),
    ]:
        tdir = os.path.join(args.outdir, name)
        os.makedirs(tdir, exist_ok=True)
        entry = {"trace_dir": tdir}
        try:
            print(f"# start_trace: {name}", file=sys.stderr, flush=True)
            t0 = time.perf_counter()
            with trace(tdir):
                print(f"# traced region entered: {name}",
                      file=sys.stderr, flush=True)
                r = fn()
                float(np.asarray(r.residual_norm))
                print(f"# traced region done: {name}",
                      file=sys.stderr, flush=True)
            entry["wall_s"] = time.perf_counter() - t0
            files = sorted(glob.glob(os.path.join(tdir, "**", "*"),
                                     recursive=True))
            entry["files"] = [
                (os.path.relpath(f, tdir), os.path.getsize(f))
                for f in files if os.path.isfile(f)
            ]
            entry["n_xplane"] = sum(
                1 for f, _ in entry["files"] if f.endswith(".xplane.pb")
            )
            entry["ok"] = True
        except Exception as e:  # noqa: BLE001 — the failure IS the data
            entry["ok"] = False
            entry["error"] = f"{type(e).__name__}: {e}"[:500]
        report[name] = entry
        print(f"# {name}: ok={entry.get('ok')} "
              f"files={len(entry.get('files', []))} "
              f"err={entry.get('error', '')[:120]}",
              file=sys.stderr, flush=True)

    # best-effort xplane summary (tensorboard_plugin_profile may be
    # absent — record that too)
    try:
        from tensorflow.python.profiler import profiler_client  # noqa: F401
        report["xplane_tooling"] = "tensorflow profiler importable"
    except Exception as e:  # noqa: BLE001
        report["xplane_tooling"] = f"unavailable: {type(e).__name__}: {e}"[:200]

    print(json.dumps(report))


if __name__ == "__main__":
    main()
