"""vmem2d <-> stream routing-cliff bisect — attempt 6, per-row
interleaved control gating (round-4 VERDICT item 6; the FINAL attempt:
if this cannot produce a trusted curve, the item closes as
environment-bounded per the r4 verdict).

History: attempts 1-5 (results/hw_queue_r3/cliff_bisect.json,
hw_queue_r4/cliff_bisect2-5.json) all died to relay tenancy — the
last with every row untrusted and stream brackets at 209-498% of
peak. Attempt-4's lesson: pre/post drift gating is insufficient
because a burst BETWEEN the brackets leaves both clean. This attempt
applies the verdict's prescription exactly: the stream kernel (the
known-good control) is slope-measured immediately before and after
EVERY candidate measurement (cgx.bench.tenancy.measure_with_control),
the candidate is refused and re-measured when either adjacent control
deviates >5% from the per-size calibrated value, and the calibrated
control itself must land in the physically-sane window before any
candidate runs.

Structural facts already established (stable across all attempts, and
already encoded in the routing default):
  (a) the relay's ~48 MB scoped-VMEM compile cap removes the vmem2d
      arm above n ~ 9e5 on this rig (HTTP 500, bisected 46.4/51.8 MB);
  (b) below the cap, vmem2d wins by the VMEM-residency margin
      (5.9 us/iter at n=8.1e5 vs ~29 us HBM-equivalent).
What is missing is a TRUSTED curve: vmem2d / stream / xla us-per-iter
across the sub-cap range plus the stream/xla comparison above it.

Usage: python scripts/cliff_bisect6.py [n ...] > out.json
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
    slope_seconds_per_iter,
)
from cgx.bench.tenancy import (  # noqa: E402
    calibrate_control,
    measure_with_control,
)
from cgx.config import VMEM_BUDGET_BYTES  # noqa: E402
from cgx.mats.device import lap2d_operator  # noqa: E402
from cgx.ops.cg_kernel import dia_cg_solve_vmem, vmem2d_scoped_bytes  # noqa: E402
from cgx.ops.cg_stream import dia_cg_solve_stream  # noqa: E402
from cgx.solver.cg import cg_solve  # noqa: E402

PCT_SANE = (20.0, 105.0)  # plausible stream %-of-peak window
CONTROL_DEV = float(os.environ.get("CONTROL_DEV", "0.05"))
ROW_RETRIES = int(os.environ.get("ROW_RETRIES", "3"))


def main():
    ns = [int(float(a)) for a in sys.argv[1:]] or [
        250_000, 490_000, 640_000, 810_000, 1_000_000, 2_000_000,
        4_000_000,
    ]
    peak = chip_hbm_gbps() * 1e9
    dev = jax.devices()[0].device_kind
    print(f"# device {dev}", file=sys.stderr, flush=True)
    out = {"device": dev, "peak_gbps": peak / 1e9,
           "control_dev": CONTROL_DEV, "rows": []}
    rs = np.random.default_rng(0)
    for n_target in ns:
        g = int(np.sqrt(n_target))
        n = g * g
        op = lap2d_operator(g, jnp.float32)
        ndiag = op.bands.shape[0]
        # bands_dtype='auto' -> bf16 planes on lap2d: ndiag*2 bytes
        # + 10 f32 state words (f32-word model overcounts bands 2x)
        stream_bytes_elem = ndiag * 2 + 10 * 4

        def make_b(rep, _n=n):
            return (1.0 + 0.01 * (rep + 2)) * rs.standard_normal(
                _n).astype(np.float32)

        # adaptive iteration counts: size k so the largest run holds
        # ~2 s of roofline-model device time. Attempt-4's 150 ms was
        # still tenancy-hypersensitive; the round-5 session-2 finding
        # is that SECONDS-scale slope runs reproduce to 0.2% in the
        # same windows that poison sub-second runs (BENCHMARKS r5 s2)
        t_iter_est = stream_bytes_elem * n / (0.8 * peak)
        k_max = max(2048, int(2.0 / t_iter_est) // 64 * 64)
        ks_adaptive = (k_max // 4, k_max // 2, k_max)

        def run_stream(b, k, _op=op):
            return dia_cg_solve_stream(_op, b, tol=0.0, maxiter=k).x

        def run_xla(b, k, _op=op):
            return cg_solve(_op, b, tol=0.0, maxiter=k, history=0).x

        def run_vmem(b, k, _op=op):
            return dia_cg_solve_vmem(_op, b, tol=0.0, maxiter=k).x

        def control():
            m = slope_seconds_per_iter(
                run_stream, make_b, ks=ks_adaptive, reps=2
            )
            return m["s_per_iter"] * 1e6

        def measure_candidate(run, name):
            def one():
                try:
                    m = slope_seconds_per_iter(
                        run, make_b, ks=ks_adaptive, reps=3
                    )
                except Exception as e:  # noqa: BLE001
                    return {"err": repr(e)[:160], "us_per_iter": None,
                            "ts_spread": None}
                return {
                    "us_per_iter": m["s_per_iter"] * 1e6,
                    "ts_spread": m["ts_spread"],
                    "fit_rel_err": m["fit_rel_err"],
                }

            r = measure_with_control(
                one, control, expected,
                deviation=CONTROL_DEV, retries=ROW_RETRIES,
            )
            r["candidate"] = name
            return r

        row = {"n": n, "ks": list(ks_adaptive)}
        expected = calibrate_control(
            control, rel_spread_gate=CONTROL_DEV
        )
        if expected is not None:
            ctl_pct = (100 * stream_bytes_elem * n
                       / (expected / 1e6) / peak)
            row["control_us"] = expected
            row["control_pct_peak"] = ctl_pct
            if not (PCT_SANE[0] <= ctl_pct <= PCT_SANE[1]):
                # internally consistent but physically impossible —
                # a sustained burst; do not trust this calibration
                expected = None
                row["calibration_insane_pct"] = ctl_pct
        if expected is None:
            row["trusted"] = False
            row["calibration_failed"] = True
            out["rows"].append(row)
            print(json.dumps(row), file=sys.stderr, flush=True)
            continue

        scoped = vmem2d_scoped_bytes(ndiag, n, 4, 4)
        row["vmem2d_scoped_mb"] = round(scoped / 2**20, 1)
        cands = []
        # the relay's chipless AOT helper rejects scoped-VMEM programs
        # past ~48 MB (bisected 46.4 ok / 51.8 HTTP 500) — don't burn
        # queue minutes re-proving it at every size
        if scoped > 48 * 2**20:
            row["vmem2d_skip"] = "relay ~48MB scoped-VMEM compile cap"
        elif scoped <= VMEM_BUDGET_BYTES:
            cands.append((run_vmem, "vmem2d"))
        cands.append((run_xla, "xla"))
        for run, name in cands:
            r = measure_candidate(run, name)
            row[name] = r
            print(json.dumps({"n": n, name: r}), file=sys.stderr,
                  flush=True)
        row["stream_us"] = expected  # the control IS the stream arm
        row["trusted"] = all(
            row[name].get("row_trusted")
            and row[name].get("us_per_iter") is not None
            and (row[name].get("ts_spread") or 99) <= 0.25
            for _, name in cands
        )
        out["rows"].append(row)
        print(json.dumps(row), file=sys.stderr, flush=True)
    json.dump(out, sys.stdout, indent=1)
    print()


if __name__ == "__main__":
    main()
