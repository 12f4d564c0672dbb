"""Count XLA fusions + their HBM traffic in the compiled CG loop.

The slope measurements (BENCHMARKS.md round-2 table; cliff_probe)
show banded fp32 CG at 62-67% of HBM peak at N=1e6 falling to ~30%
past N~2e6 while a pure banded mat-vec loop stays fast — so the
suspect is XLA's fusion DECISIONS changing with size: the analytic
(ndiag + 13) N-word traffic model assumes the iteration fuses into a
minimal number of passes, and every fusion boundary XLA adds
materializes an extra N-vector round-trip to HBM.

This script compiles the exact cg_solve while_loop at several sizes
ON THE ACTUAL BACKEND, parses the optimized HLO, and reports per
size: the number of fusions inside the while body, each fusion's
input+output bytes, and the implied total bytes/iteration — the
compiler-truth replacement for the analytic model. No execution, so
it is safe to run alongside nothing (compile-service load only).

Usage: python scripts/fusion_census.py [sizes...] (default 1e6 2e6 4e6 1e7)
"""

import json
import os
import re
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/tmp/cgx_jax_cache")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from cgx.mats.generators import lap2d_fd  # noqa: E402
from cgx.solver.cg import cg_solve  # noqa: E402
from cgx.solver.operators import DiaOperator  # noqa: E402

_SHAPE = re.compile(r"([a-z0-9]+)\[([0-9,]*)\]")


def dtype_bytes(name: str) -> int:
    return {
        "f64": 8, "f32": 4, "bf16": 2, "f16": 2,
        "s64": 8, "u64": 8, "s32": 4, "u32": 4, "pred": 1,
        "s8": 1, "u8": 1,
    }.get(name, 4)


def shape_bytes(sig: str) -> int:
    """Sum the bytes of every array literal like f32[1000,1000] in a
    (possibly tuple) HLO shape signature string."""
    total = 0
    for m in _SHAPE.finditer(sig):
        dt, dims = m.groups()
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * dtype_bytes(dt)
    return total


def census(hlo: str):
    """Per-computation fusion stats from optimized HLO text."""
    comps = defaultdict(list)  # computation name -> instruction lines
    cur = None
    for line in hlo.splitlines():
        m = re.match(r"\s*%?([\w.\-]+)\s*(\([^)]*\))?\s*->.*\{\s*$", line)
        if ("{" in line and ("ENTRY" in line or re.match(
                r"\s*%?[\w.\-]+ \(", line))):
            name = re.search(r"%?([\w.\-]+)\s*\(", line)
            cur = name.group(1) if name else None
            continue
        if cur and line.strip().startswith("}"):
            cur = None
            continue
        if cur:
            comps[cur].append(line)
    # find the while-body computation: the one with the most fusions
    body_name, body_fusions = None, []
    for name, lines in comps.items():
        fus = [ln for ln in lines if re.search(r"= [^=]*fusion\(", ln)]
        if "body" in name and len(fus) > len(body_fusions):
            body_name, body_fusions = name, fus
    if body_name is None:  # fall back: most-fusion computation
        for name, lines in comps.items():
            fus = [ln for ln in lines if re.search(r"= [^=]*fusion\(", ln)]
            if len(fus) > len(body_fusions):
                body_name, body_fusions = name, fus
    rows = []
    for ln in body_fusions:
        # `%name = f32[...]{...} fusion(%a, %b, ...), kind=...`
        rhs = ln.split("=", 1)[1]
        out_sig = rhs.split("fusion(", 1)[0]
        rows.append(
            {
                "kind": (re.search(r"kind=(\w+)", ln) or [None, "?"])[1],
                "out_bytes": shape_bytes(out_sig),
            }
        )
    return body_name, rows


def main():
    sizes = [int(float(s)) for s in (sys.argv[1:] or
                                     ["1e6", "2e6", "4e6", "1e7"])]
    backend = jax.default_backend()
    print(f"# backend {backend}", file=sys.stderr, flush=True)
    out = {"backend": backend}
    for n_target in sizes:
        g = int(np.sqrt(n_target))
        dia = lap2d_fd(g)
        n = dia.shape[0]
        op = DiaOperator(
            jnp.asarray(np.asarray(dia.bands, np.float32)),
            tuple(dia.offsets),
        )
        b = jnp.asarray(
            np.random.default_rng(0).standard_normal(n), jnp.float32
        )

        def run(bb):
            return cg_solve(op, bb, tol=0.0, maxiter=100).x

        compiled = jax.jit(run).lower(b).compile()
        hlo = compiled.as_text()
        body, rows = census(hlo)
        fused_out = sum(r["out_bytes"] for r in rows)
        # traffic proxy: every fusion writes its output and (at least)
        # re-reads it in the next fusion -> 2x outputs + the bands read
        ndiag = op.bands.shape[0]
        model = (ndiag + 13) * n * 4
        row = {
            "n": n,
            "while_body": body,
            "n_fusions": len(rows),
            "fusion_out_bytes": fused_out,
            "model_bytes": model,
            "out_over_model": fused_out / model if model else None,
            "fusions": rows,
        }
        # memory-access analysis if the backend exposes it
        try:
            an = compiled.cost_analysis()
            an = an[0] if isinstance(an, (list, tuple)) else an
            if an and "bytes accessed" in an:
                row["cost_bytes_accessed_total"] = an["bytes accessed"]
        except Exception:  # noqa: BLE001
            pass
        out[str(n)] = row
        print(
            f"# n={n}: {len(rows)} fusions in {body}, fusion outputs "
            f"{fused_out / 1e6:.1f} MB vs model {model / 1e6:.1f} MB "
            f"(x{row['out_over_model']:.2f})",
            file=sys.stderr, flush=True,
        )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
