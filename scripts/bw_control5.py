"""Write-mix bandwidth control: is 10R+5W capped below pure-read BW?

Every honest control so far was read-heavy: chainD29 (28R+1W) -> ~800
GB/s, planes mat-vec (6R+1W model) -> ~880 GB/s apparent. The fused
streaming-CG kernel (10R+5W) holds 396-447 GB/s and the bare-chain
probe proved neither the while_loop boundary, nor DMA stream count,
nor VPU compute explains the gap. Remaining hypothesis: HBM/memory-
controller efficiency drops on write-heavy interleaved streams, and
the kernel is already AT the achievable rate for its mix.

chainW replicates the CG iteration's exact traffic shape in pure XLA:
5 carried arrays read+written (y1..y5) + 5 iteration-dependent fixed
reads (dynamic-slice halves, CSE-proof) = 10R + 5W = 15 words/iter.
If chainW lands at ~420-450 GB/s, the fused kernel is at the mixed-
stream roofline and its ~50%-of-nominal number needs a mix-corrected
denominator; if chainW reaches ~800, the kernel still owes a 2x.

Usage: python scripts/bw_control5.py [n ...] > out.json
"""

import functools
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/cgx_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from cgx.bench.slope import chip_hbm_gbps, slope_seconds_per_iter  # noqa: E402


@functools.partial(jax.jit, static_argnames=("k", "n"))
def chain_w(ys, xs2, k, n):
    """ys: 5 carried (n,) arrays; xs2: 5 (2n,) buffers — iteration i
    reads half (i % 2). 10R + 5W per iteration."""

    def body(i, ys):
        off = (i % 2) * n
        outs = []
        prev = ys[-1]
        for y, x2 in zip(ys, xs2):
            x = jax.lax.dynamic_slice(x2, (off,), (n,))
            prev = 0.4 * y + 0.3 * prev + x  # couple carries: no DCE
            outs.append(prev)
        return jax.lax.optimization_barrier(tuple(outs))

    return jax.lax.fori_loop(0, k, body, ys)[0]


@functools.partial(jax.jit, static_argnames=("k", "n"))
def chain_w2(ys, xs2, k, n):
    """2R+... variant at the planes-mat-vec mix: 6R + 1W (words 7):
    one carry, 5 fixed reads + carry read, carry write."""

    def body(i, y):
        off = (i % 2) * n
        for x2 in xs2:
            y = 0.5 * y + jax.lax.dynamic_slice(x2, (off,), (n,))
        return jax.lax.optimization_barrier(y)

    return jax.lax.fori_loop(0, k, body, ys[0])


def main():
    ns = [int(float(a)) for a in sys.argv[1:]] or [4_000_000, 10_000_000]
    peak = chip_hbm_gbps() * 1e9
    dev = jax.devices()[0].device_kind
    print(f"# device {dev}, nominal peak {peak/1e9} GB/s",
          file=sys.stderr, flush=True)
    out = {"device": dev, "peak_gbps": peak / 1e9, "rows": []}
    rs = np.random.default_rng(0)
    for n in ns:
        xs2 = tuple(
            jax.device_put(
                0.01 * rs.standard_normal(2 * n).astype(np.float32)
            )
            for _ in range(5)
        )

        def make_b(rep, _n=n):
            return (1.0 + 0.01 * (rep + 2)) * rs.standard_normal(_n).astype(
                np.float32
            )

        def runW(b, k):
            ys = tuple(b * (0.9 + 0.02 * t) for t in range(5))
            return chain_w(ys, xs2, k, n)

        def runW2(b, k):
            return chain_w2((b,), xs2, k, n)

        cases = [
            ("chainW_10r5w", 15.0, runW),
            ("chainW_6r1w", 7.0, runW2),
        ]
        for tag, words, run in cases:
            row = {"n": n, "tag": tag, "words": words}
            try:
                r = slope_seconds_per_iter(
                    run, make_b, ks=(64, 128, 256), reps=5
                )
                row["us"] = r["s_per_iter"] * 1e6
                row["gbps"] = words * n * 4 / r["s_per_iter"] / 1e9
                row["pct_nominal"] = row["gbps"] / (peak / 1e9) * 100
                row["fit"] = r["fit_rel_err"]
                row["spread"] = r["ts_spread"]
                print(
                    f"#   n={n} {tag}: {row['us']:.1f}us"
                    f" -> {row['gbps']:.0f} GB/s"
                    f" ({row['pct_nominal']:.0f}% nominal)"
                    f" fit {row['fit']:.3f} spread {row['spread']:.3f}",
                    file=sys.stderr, flush=True,
                )
            except Exception as e:  # noqa: BLE001
                row["err"] = repr(e)[:160]
                print(f"#   n={n} {tag}: ERR {row['err']}",
                      file=sys.stderr, flush=True)
            out["rows"].append(row)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
