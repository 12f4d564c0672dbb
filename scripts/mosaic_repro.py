"""Reproduce the session-7 remote-compile failures with full error text.

The hw_queue newkernels run saw `MosaicError: INTERNAL: .../remote_compile:
HTTP 500: tpu_compile_helper subprocess exit code 1` for
dia_cg_solve_stream (N=1e6, 1e7), stream_pcg (1e6, 1e7), the vmem2d
whole-solve kernel (N=2.4e6), and sstep powers (1e6). This script runs
ONE failing case and prints the complete error so we can tell an infra
crash (relay compile-helper OOM/timeout -> retry) from a genuine Mosaic
diagnostic (kernel bug -> fix).

Usage: python scripts/mosaic_repro.py [case] [n]
  case in {stream, stream_pcg, vmem2d, powers}; default stream 1e6.
"""

import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/tmp/cgx_jax_cache")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from cgx.mats.generators import lap2d_fd  # noqa: E402
from cgx.solver.operators import DiaOperator  # noqa: E402


def main():
    case = sys.argv[1] if len(sys.argv) > 1 else "stream"
    n_target = int(float(sys.argv[2])) if len(sys.argv) > 2 else 10**6
    g = int(np.sqrt(n_target))
    dia = lap2d_fd(g)
    n = dia.shape[0]
    bands = jnp.asarray(np.asarray(dia.bands, np.float32))
    op = DiaOperator(bands, tuple(dia.offsets))
    b = jnp.asarray(np.random.default_rng(0).standard_normal(n), jnp.float32)
    print(f"# case={case} n={n}", flush=True)
    try:
        if case == "stream":
            from cgx.ops.cg_stream import dia_cg_solve_stream

            out = dia_cg_solve_stream(op, b, tol=0.0, maxiter=5).x
        elif case == "stream_pcg":
            from cgx.ops.cg_stream import dia_cg_solve_stream_pcg

            out = dia_cg_solve_stream_pcg(op, b, tol=0.0, maxiter=5).x
        elif case == "vmem2d":
            from cgx.ops.cg_kernel import dia_cg_solve_vmem

            out = dia_cg_solve_vmem(op, b, tol=0.0, maxiter=5, layout="2d").x
        elif case == "powers":
            from cgx.ops.dia_powers import dia_sstep_basis

            out = dia_sstep_basis(
                bands,
                b,
                b,
                offsets=tuple(dia.offsets),
                s=4,
                theta=4.0,
                delta=2.0,
            )
        else:
            raise SystemExit(f"unknown case {case}")
        val = float(jnp.linalg.norm(out.astype(jnp.float32).ravel()[:8]))
        print(f"# OK: compiled and ran, probe={val:.3e}")
    except Exception:
        traceback.print_exc()
        print("# FAILED (full traceback above)")


if __name__ == "__main__":
    main()
