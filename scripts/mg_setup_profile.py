"""Profile the MG hierarchy setup at the flagship size (round-4
VERDICT item 7: 41.8 s of Galerkin build for a 0.786 s solve at
N=1.024e7, never profiled).

Three measurements:
1. per-LEVEL wall time of the device Galerkin band-probe chain
   (g=3200 -> 1600 -> ... -> 50), separating compile (first call) from
   steady-state (second call with perturbed bands);
2. a `jax.profiler.trace` around the steady-state finest-level probe;
3. top device ops from the captured Chrome trace.

Usage: python scripts/mg_setup_profile.py [g] [--outdir DIR] > out.json
"""

import glob
import gzip
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


def _top_device_ops(trace_dir, k=12):
    """Summarize the Chrome trace: total duration by op name for
    device-lane events."""
    paths = glob.glob(
        os.path.join(trace_dir, "**", "*.trace.json.gz"), recursive=True
    )
    if not paths:
        return {"error": "no chrome trace found"}
    with gzip.open(paths[0], "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    # device lanes: pid whose process_name mentions TPU / device
    name_by_pid = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            name_by_pid[e["pid"]] = e["args"].get("name", "")
    dev_pids = {
        p for p, nm in name_by_pid.items()
        if "TPU" in nm or "device" in nm.lower() or "/device" in nm
    }
    totals = {}
    for e in events:
        if e.get("ph") == "X" and e.get("pid") in dev_pids:
            nm = e.get("name", "?")
            totals[nm] = totals.get(nm, 0.0) + float(e.get("dur", 0.0))
    top = sorted(totals.items(), key=lambda kv: -kv[1])[:k]
    return {
        "device_pids": sorted(
            name_by_pid[p] for p in dev_pids if p in name_by_pid
        ),
        "top_ops_us": [
            {"op": nm, "total_us": round(us, 1)} for nm, us in top
        ],
        "total_device_us": round(sum(totals.values()), 1),
    }


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    g0 = int(args[0]) if args else 3200
    outdir = "/tmp/cgx_xprof/mg_setup"
    for a in sys.argv[1:]:
        if a.startswith("--outdir="):
            outdir = a.split("=", 1)[1]

    from cgx.mats.device import lap2d_operator
    from cgx.solver.multigrid import galerkin_probe
    from cgx.utils.timer import trace

    dev = jax.devices()[0].device_kind
    print(f"# device {dev} g={g0}", file=sys.stderr, flush=True)
    report = {"device": dev, "g": g0, "levels": []}

    op = lap2d_operator(g0, jnp.float64)
    bands = jnp.asarray(op.bands, jnp.float32)  # cycle dtype build
    offs = tuple(op.offsets)
    gg = g0
    ndim = 2
    min_coarse = 32
    chain = []
    while gg % 2 == 0 and gg // 2 >= min_coarse:
        t0 = time.perf_counter()
        b2, o2 = galerkin_probe(bands, offs, gg, ndim, "bilinear")
        jax.block_until_ready(b2)
        t_first = time.perf_counter() - t0
        # steady state: perturb bands so the relay can't replay-cache
        t0 = time.perf_counter()
        b2b, _ = galerkin_probe(bands * 1.0000001, offs, gg, ndim,
                                "bilinear")
        jax.block_until_ready(b2b)
        t_warm = time.perf_counter() - t0
        lvl = {
            "g": gg, "n_fine": gg * gg, "ndiag_in": int(bands.shape[0]),
            "first_s": round(t_first, 3), "warm_s": round(t_warm, 3),
        }
        report["levels"].append(lvl)
        print(json.dumps(lvl), file=sys.stderr, flush=True)
        chain.append((gg, bands, offs))
        bands, offs = b2, tuple(o2)
        gg //= 2
    report["total_first_s"] = round(
        sum(l["first_s"] for l in report["levels"]), 2
    )
    report["total_warm_s"] = round(
        sum(l["warm_s"] for l in report["levels"]), 2
    )

    # trace the finest-level probe in steady state
    g_f, bands_f, offs_f = chain[0]
    tdir = os.path.join(outdir, f"g{g_f}")
    os.makedirs(tdir, exist_ok=True)
    try:
        with trace(tdir):
            b2, _ = galerkin_probe(bands_f * 1.0000002, offs_f, g_f,
                                   ndim, "bilinear")
            jax.block_until_ready(b2)
        report["finest_trace"] = _top_device_ops(tdir)
    except Exception as e:  # noqa: BLE001
        report["finest_trace"] = {"error": f"{type(e).__name__}: {e}"[:300]}
    print(json.dumps(report, indent=1))
    print(json.dumps({"total_first_s": report["total_first_s"],
                      "total_warm_s": report["total_warm_s"]}),
          file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()
