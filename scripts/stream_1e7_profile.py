"""Profile-attribute the N=1e7 streaming-tail gap (round-4 VERDICT
item 2, fallback clause: neither bf16 planes nor the aliased stacked
layout closes the >=80% target — split_f32 sits at ~75-80%, measured
trusted in results/hw_queue_r4/stream_1e7_race2.json).

Captures a device trace of 200 aliased-split-kernel iterations at
N=1.024e7 and totals device ops, separating:
  - the Pallas iteration kernel's self-time,
  - residual XLA copies (any while-carry copy the aliasing missed),
  - everything else (scalar recurrence ops, gaps).
Comparison point: the same capture at N=4e6, where the kernel reaches
90.4% — the DELTA between the two op profiles is the attribution.

Usage: python scripts/stream_1e7_profile.py > out.json
"""

import glob
import gzip
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/cgx_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def _top_device_ops(trace_dir, k=14):
    paths = glob.glob(
        os.path.join(trace_dir, "**", "*.trace.json.gz"), recursive=True
    )
    if not paths:
        return {"error": "no chrome trace found"}
    with gzip.open(sorted(paths)[-1], "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    name_by_pid = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            name_by_pid[e["pid"]] = e["args"].get("name", "")
    dev_pids = {
        p for p, nm in name_by_pid.items()
        if "TPU" in nm or "device" in nm.lower() or "/device" in nm
    }
    totals = {}
    tmin, tmax = None, None
    for e in events:
        if e.get("ph") == "X" and e.get("pid") in dev_pids:
            nm = e.get("name", "?")
            dur = float(e.get("dur", 0.0))
            totals[nm] = totals.get(nm, 0.0) + dur
            ts = float(e.get("ts", 0.0))
            tmin = ts if tmin is None else min(tmin, ts)
            tmax = max(tmax or 0.0, ts + dur)
    top = sorted(totals.items(), key=lambda kv: -kv[1])[:k]
    return {
        "top_ops_us": [
            {"op": nm[:90], "total_us": round(us, 1)} for nm, us in top
        ],
        "total_device_busy_us": round(sum(totals.values()), 1),
        "device_span_us": round((tmax - tmin) if tmin is not None else 0, 1),
    }


def main():
    from cgx.mats.device import lap2d_operator
    from cgx.ops.cg_stream import dia_cg_solve_stream
    from cgx.utils.timer import trace

    dev = jax.devices()[0].device_kind
    report = {"device": dev}
    rng = np.random.default_rng(9)
    for g in (2000, 3200):
        n = g * g
        op = lap2d_operator(g, jnp.float32)
        b = jnp.asarray(rng.standard_normal(n), jnp.float32)
        # warm outside the trace
        r = dia_cg_solve_stream(op, b, tol=0.0, maxiter=20)
        float(np.asarray(r.residual_norm))
        print(f"# warm g={g} done", file=sys.stderr, flush=True)
        tdir = f"/tmp/cgx_xprof/stream1e7/g{g}"
        os.makedirs(tdir, exist_ok=True)
        iters = 200
        with trace(tdir):
            r = dia_cg_solve_stream(op, b, tol=0.0, maxiter=iters)
            float(np.asarray(r.residual_norm))
        entry = _top_device_ops(tdir)
        entry["iters"] = iters
        entry["n"] = n
        if "device_span_us" in entry:
            entry["span_us_per_iter"] = round(
                entry["device_span_us"] / iters, 1
            )
            entry["busy_us_per_iter"] = round(
                entry.get("total_device_busy_us", 0) / iters, 1
            )
        report[f"g{g}"] = entry
        print(json.dumps({f"g{g}": entry}), file=sys.stderr, flush=True)
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
