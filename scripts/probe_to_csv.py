"""Convert the checked-in hardware probe JSONs (results/hw_queue_r2s*)
into results/*.txt CSV tables (round-3 VERDICT item 8).

The reference's tuning artifact is a plots.ipynb-consumable CSV
(results/CUDA_T.txt, produced by CUDA/cg.run:26-30). The dense path
already has that discipline (results/kernel_sweep_tpu.txt); this gives
the champion streaming/VMEM kernels the same: regenerate with

    python scripts/probe_to_csv.py

after re-running the probes (scripts/stream_tune.py,
scripts/newkernels_probe.py, scripts/stream_stacked_race.py,
scripts/stream_loop_overhead.py, scripts/shift_race.py,
scripts/pad_stride_race.py).
"""

import json
import os

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RES = os.path.join(ROOT, "results")

CAVEAT = """\
# Measured on the shared TPU v5e dev chip through the network relay
# (slope method: Theil-Sen per-iteration fit over multiple fixed-k
# runs with per-run-perturbed inputs; the ~30-45 ms dispatch floor
# cancels in the slope). pct_peak is against the nominal 819 GB/s HBM
# roofline. Ratios between rows co-measured in one session are solid;
# absolute numbers move with relay tenancy (fit/spread columns in the
# source JSONs flag distrusted rows).
"""


def load(path):
    with open(os.path.join(RES, path)) as f:
        return json.load(f)


def write(path, header, schema, rows):
    out = os.path.join(RES, path)
    with open(out, "w") as f:
        f.write(header)
        f.write(CAVEAT)
        f.write(f"# schema: {schema}\n")
        for r in rows:
            f.write(",".join(str(v) for v in r) + "\n")
    print(f"wrote {out} ({len(rows)} rows)")


def stream_sweep():
    d = load("hw_queue_r2s8/stream_tune.json")
    rows = [
        (r["n"], r["rows"], r["cols"], round(r["us"], 1),
         round(r["pct"], 1))
        for r in d["rows_cols"]
    ]
    write(
        "stream_kernel_sweep.txt",
        "# Streaming fused-iteration CG kernel (cgx/ops/cg_stream.py)"
        " block-shape sweep\n"
        "# — the CUDA_T.txt analogue for the large-N champion kernel"
        " (fp32, lap2d_fd).\n"
        "# Session-8 verdict: the surface is flat (48-53% of nominal"
        " peak across all\n"
        "# shapes) => the kernel is bandwidth-bound, not tile-bound;"
        " (256,512) kept as\n"
        "# default. Source: results/hw_queue_r2s8/stream_tune.json"
        " (scripts/stream_tune.py).\n",
        "n,block_rows,block_cols,us_per_iter,pct_of_hbm_peak",
        rows,
    )


def kernel_race():
    d = load("hw_queue_r2s8/newkernels3.json")
    rows = []
    for r in d["stream"]:
        for tag in ("flat", "pipelined", "stream", "stream_pcg"):
            if f"{tag}_us" in r:
                rows.append((
                    r["n"], tag, round(r[f"{tag}_us"], 1),
                    round(r[f"{tag}_pct"], 1),
                ))
    for r in d["vmem2d"]:
        for tag in ("vmem1d", "vmem2d"):
            if f"{tag}_us" in r:
                rows.append((
                    r["n"], tag, round(r[f"{tag}_us"], 2),
                    round(r[f"{tag}_pct"], 1),
                ))
    for r in d["powers"]:
        for tag in ("sstep_off", "sstep_powers"):
            if f"{tag}_us" in r:
                rows.append((
                    r["n"], f"{tag}_s{r['s']}",
                    round(r[f"{tag}_us"], 1),
                    round(r[f"{tag}_pct"], 1),
                ))
    rows.sort()
    write(
        "kernel_race_large_n.txt",
        "# Large-N banded-CG kernel race (session 8): XLA fused loop"
        " (flat/pipelined)\n"
        "# vs streaming fused-iteration kernel (stream/stream_pcg) vs"
        " VMEM whole-solve\n"
        "# (vmem1d/vmem2d; pct > 100 means VMEM-resident, above the"
        " HBM roofline) vs\n"
        "# s-step matrix-powers (per-iteration-equivalent). These rows"
        " set the routing\n"
        "# defaults in cgx/solver/api.py (stream above N~2e6, vmem2d"
        " below). Source:\n"
        "# results/hw_queue_r2s8/newkernels3.json"
        " (scripts/newkernels_probe.py).\n",
        "n,path,us_per_iter,pct_of_hbm_peak",
        rows,
    )


def variant_race():
    rows = []
    d = load("hw_queue_r2s8/stacked_race.json")
    for r in d["rows"]:
        rows.append((
            r["n"], f"layout_{r['tag']}", round(r["us"], 1),
            round(r["pct_nominal"], 1),
        ))
    d = load("hw_queue_r2s8/loop_overhead.json")
    for r in d["rows"]:
        rows.append((
            r["n"], r["tag"], round(r["us"], 1),
            round(r["pct_nominal"], 1),
        ))
    d = load("hw_queue_r2s10_shift_race.json")
    for r in d["rows"]:
        rows.append((
            r["n"], f"{r['tag']}_{r['variant']}roll",
            round(r["us_per_iter"], 1), round(r["pct_peak"], 1),
        ))
    d = load("hw_queue_r2s10_pad_race.json")
    for r in d["rows"]:
        rows.append((
            r["n"], f"pad_{r['arm']}", round(r["us_per_iter"], 1),
            round(r["pct_peak"], 1),
        ))
    rows.sort()
    write(
        "stream_variant_race.txt",
        "# Streaming-kernel variant forensics (sessions 8-10): state"
        " layout\n"
        "# (split vs stacked), bare mat-vec chain without the"
        " while_loop boundary,\n"
        "# shared vs unshared band-shift lane rolls, and grid-stride"
        " padding arms.\n"
        "# Verdicts recorded in BENCHMARKS.md sessions 9-10: DMA"
        " count, loop\n"
        "# boundary, write mix, and lane rolls all acquitted; shared"
        " rolls kept,\n"
        "# pad_stride default OFF. Sources:"
        " results/hw_queue_r2s8/{stacked_race,\n"
        "# loop_overhead}.json, results/hw_queue_r2s10_*.json.\n",
        "n,variant,us_per_iter,pct_of_hbm_peak",
        rows,
    )


def fp64_quality_race():
    """results/hw_queue_r3/fp64q_*.json -> fp64_quality_race.txt: the
    round-3 flagship table (end-to-end time-to-quality at the
    reference's true-rel-residual <1e-10 gate, cg.cc:144-154)."""
    rows = []
    for fname in ("hw_queue_r3/fp64q_g2000.json",
                  "hw_queue_r3/fp64q_g2000_dd.json",
                  "hw_queue_r3/fp64q_g2000_tw.json",
                  "hw_queue_r3/fp64q_g3200_tw.json"):
        try:
            data = load(fname)
        except FileNotFoundError:
            continue
        for g, row in data.items():
            for cand, e in row.items():
                if not isinstance(e, dict) or "median_s" not in e:
                    continue
                rows.append((
                    row["n"], cand, round(e["median_s"], 4),
                    f"{e['true_rel_resid']:.3e}",
                    "PASS" if e.get("gate_pass") else "fail",
                    e.get("outer_sweeps", e.get("iterations", "")),
                ))
    rows.sort(key=lambda r: (r[0], r[2]))
    write(
        "fp64_quality_race.txt",
        "# fp64-QUALITY race: end-to-end solve time to the reference's\n"
        "# quality gate (recomputed TRUE relative residual < 1e-10,\n"
        "# cg.cc:144-154) on generated lap2d problems. The reference's\n"
        "# dense storage caps it at N=16384; these are 244-625x larger.\n"
        "# Gate evaluation: plain candidates fp64; _dd double-double;\n"
        "# _tw triple-word f32 (host-longdouble cross-checked). Source:\n"
        "# results/hw_queue_r3/fp64q_*.json (scripts/fp64q_probe.py).\n",
        "n,candidate,median_solve_s,true_rel_resid,gate_lt_1e-10,outer_iters_or_sweeps",
        rows,
    )


def sstep_stream_race():
    """results/hw_queue_r3/sstep_stream_race*.json ->
    sstep_stream_race.txt (the fused s-step block vs the stream
    kernel, per-CG-iteration slope rows)."""
    rows = []
    for fname, tag in (("hw_queue_r3/sstep_stream_race.json", "f32replay"),
                       ("hw_queue_r3/sstep_stream_race2.json", "f64replay"),
                       ("hw_queue_r3/sstep_stream_race3.json", "comp32replay"),
                       ("hw_queue_r3/sstep_stream_race4.json", "comp32+alias")):
        try:
            data = load(fname)
        except FileNotFoundError:
            continue
        for r in data["rows"]:
            if "variant" not in r:
                continue
            rows.append((r["n"], tag, r["variant"],
                         round(r["us_per_iter"], 1),
                         round(r["pct_peak"], 1),
                         round(r.get("ts_spread", 0), 3)))
    write(
        "sstep_stream_race.txt",
        "# Fused streaming s-step block vs the plain stream kernel\n"
        "# (cgx/ops/sstep_stream.py): seconds per CG ITERATION, slope\n"
        "# method, N=4e6 fp32. Tags name the replay arithmetic of the\n"
        "# run (see BENCHMARKS round-3 session 2).\n",
        "n,replay,variant,us_per_iter,pct_of_hbm_peak,ts_spread",
        rows,
    )


if __name__ == "__main__":
    stream_sweep()
    kernel_race()
    variant_race()
    fp64_quality_race()
    sstep_stream_race()
