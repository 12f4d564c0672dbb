"""Global configuration and reference-parity constants.

The numerical constants mirror the reference solver so that residual
trajectories and iteration counts can be compared one-to-one:

- ``NEARZERO`` guards the alpha denominator (reference: MPI cg.cc:8,
  CUDA cg.cu:11, both ``1.0e-14``; used as ``alpha = rsold /
  max(conj, rsold * NEARZERO)``).
- ``DEFAULT_TOLERANCE`` is the *absolute* residual-norm tolerance
  ``sqrt(<r, r>) < tol`` (reference: cg.hh:56 MPI / cg.hh:40 CUDA).
- ``maxIter`` defaults to the problem size N (exact-arithmetic CG
  converges in <= N steps; reference README.md:73-76, cg.cc:172).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

NEARZERO: float = 1.0e-14
DEFAULT_TOLERANCE: float = 1.0e-10

# Per-core scoped-VMEM budget used when deciding whether a whole
# problem can stay resident in the Pallas whole-solve kernel
# (layout='2d'). Compared against the analytic estimate
# cgx.ops.cg_kernel.vmem2d_scoped_bytes (bands + ~10 vector units of
# windows/staging, calibrated on the real OOM dump). Shared by
# cgx.solve, the refinement dispatch, and the kernel guard.
# Hardware-bisected on the v5e (round 2 session 8,
# results/hw_queue_r2s8/newkernels3): n=2.0e6 fp32 5-band (est
# ~115 MiB) compiles and runs at 48.6 us/iter — 11x the XLA-fused
# loop at that size — while n=2.4e6 (est 137 MiB) OOMs the 128 MiB
# chip VMEM. The old (1, n)-layout kernel hit a Mosaic tiling
# rejection at ~37 MB of state; the (rows, cols)-plane layout is what
# lifts the ceiling to chip capacity.
VMEM_BUDGET_BYTES: int = 120 * 1024 * 1024


def enable_x64() -> None:
    """Enable 64-bit JAX types (required for the fp64 parity path).

    On TPU, float64 is software-emulated by XLA: element-wise VPU ops and
    128x128-tiled matmuls retain full fp64 accuracy, but long 1-D
    ``jnp.dot`` contractions lose accuracy (~1e-9 relative on this
    hardware) — which is why :mod:`cgx.ops.reduce` routes scalar
    reductions through element-wise multiply + sum instead.
    """
    jax.config.update("jax_enable_x64", True)


def default_dtype() -> jnp.dtype:
    """The widest float currently available (f64 if x64 is enabled)."""
    return jnp.float64 if jax.config.jax_enable_x64 else jnp.float32


@dataclasses.dataclass(frozen=True)
class SolveConfig:
    """Configuration of a CG solve.

    Mirrors the reference's runtime knobs (tolerance setter cg.hh:39,
    ``set_max_iter`` cg.cc:204-216) plus TPU-native extensions.
    """

    tolerance: float = DEFAULT_TOLERANCE
    maxiter: Optional[int] = None  # None -> problem size N
    nearzero: float = NEARZERO
    # Residual-history trace length (0 disables the trace buffer).
    history: int = 0
    # Precision of the mat-vec / vector updates ("fp64", "fp32",
    # "bf16", "mixed", or "tw"). "mixed" = fp32 inner CG + fp64
    # refinement sweeps to fp64-quality answers (BASELINE.json config
    # 4; routes to refine_fixed_sweeps / sharded_refine_fixed_sweeps —
    # banded operators only, tolerance interpreted RELATIVE to ||b||).
    # "tw" = triple-word f32 refinement (refine_pcg_sweeps_tw) judged
    # on the tw-evaluated TRUE residual — quality beyond the fp64
    # evaluation floor on hardware whose fp64 is emulated (banded
    # operators, single-device, relative tolerance). For the
    # other precisions scalar reductions are always accumulated in the
    # widest available float (fp64 when x64 is enabled).
    precision: str = "fp64"
    # Use Pallas kernels for the hot ops where available.
    use_pallas: bool = False
    # With use_pallas, banded fp32/bf16 problems ABOVE the VMEM budget:
    # "stream" (default) runs the fused-iteration HBM-streaming
    # Chronopoulos-Gear kernel (cgx.ops.cg_stream, one launch/iter,
    # 15N-word traffic; with precond="neumann" the fused PCG variant
    # applies the degree-1 Neumann M^-1 in-slab, (ndiag+12)N words for
    # typically ~40% fewer iterations); "xla" keeps the XLA-fused
    # while_loop. Hardware race (v5e, results/hw_queue_r2s8): stream
    # 566.6/1505.7 us/iter at N=4e6/1e7 (52/49% of HBM roofline) vs
    # the XLA loop's 1248/2954 us (28/30%) — a 2.0-2.2x win above the
    # VMEM ceiling, hence the default.
    # Note: the stream kernel runs the PIPELINED recurrence; iteration
    # counts match the reference recurrence to within one.
    large_banded: str = "stream"
    # Solver recurrence: "reference" (comm-parity CG), "pipelined"
    # (Chronopoulos-Gear, one fused reduction/iter), "gvpipe"
    # (Ghysels-Vanroose communication-HIDING pipelined CG: one fused
    # reduction/iter whose latency overlaps the mat-vec), "chebyshev"
    # (zero reductions/iter; spectral bounds estimated when needed), or
    # "sstep" (communication-avoiding CG: s iterations per reduction).
    method: str = "reference"
    # Preconditioner: None | "jacobi" | "block_jacobi" | "neumann" |
    # "chebyshev" (degree-3 polynomial with Lanczos-estimated spectral
    # bounds) | "mg" (geometric-multigrid V-cycle; banded grid
    # operators only — grid-independent iteration counts).
    precond: Optional[str] = None
    # precond="block_jacobi": rows per diagonal block. The apply is one
    # batched (nb, m, m) MXU matmul (no reductions, shards with the
    # rows); blocks are Cholesky-validated and inverted once at setup.
    # None -> 32 (capped by the problem size). Larger m captures longer
    # coupling (m = grid-line length is exact line-Jacobi) at n*m
    # words/iter of HBM traffic.
    precond_block_size: Optional[int] = None
    # precond="mg": smoother — "richardson" (scalar-damped, 1 mat-vec
    # per sweep) or "gs" (multicolor Gauss-Seidel: red-black on the
    # 5/7-point fine level, mod-(reach+1) coloring on Galerkin coarse
    # levels; ~25% fewer CG iterations/reductions for ~2x smoother
    # mat-vecs — the right trade when per-iteration latency dominates).
    mg_smoother: str = "richardson"
    # precond="mg": V-cycle arithmetic precision. "fp64" (default)
    # keeps the cycle in the solve precision. "fp32" (opt-in) runs the
    # whole cycle — smoothing mat-vecs, transfers, coarse solves — at
    # hardware-rate fp32 inside the fp64 CG recurrence: measured
    # iteration-count neutral with fp64-quality answers on the tested
    # grids, and 1.8x faster at N=1e6 on TPU (fp64 there is emulated);
    # a numerics change for ill-conditioned operators, hence opt-in.
    mg_cycle_precision: str = "fp64"
    # method="chebyshev": iterations between convergence checks (the
    # only reduction in that loop).
    check_every: int = 32
    # method="sstep": iterations per Gram reduction.
    sstep_s: int = 4
    # method="sstep": basis family — "chebyshev" (three-term on the
    # spectral interval) or "newton" (Leja-ordered Ritz shifts).
    sstep_basis: str = "chebyshev"
    # Dense fp64 mat-vec route: "auto" | "ozaki" | "emulated". On
    # accelerators fp64 matmuls are software-emulated (~1.7% of MXU
    # peak, BENCHMARKS.md); "ozaki" computes fp64-quality dense
    # mat-vecs from exact bf16 MXU slice products (cgx.ops.ozaki) —
    # error BELOW the fp64 mat-vec's own accumulation roundoff, so the
    # trajectory is fp64-equivalent. "auto" = ozaki on non-CPU
    # backends, native emulated fp64 on CPU (where fp64 is hardware).
    dense_fp64: str = "auto"
    # Sharded DIA halo strategy: LOCAL mat-vec route — "auto" | "xla"
    # | "stream2d". "stream2d" streams the shard through the Pallas
    # HBM kernel (cgx.ops.dia_spmv.dia_matvec_stream2d): ~2x per
    # iteration once the per-chip shard passes the XLA fusion cliff
    # (>= 2e6 fp32 unknowns/chip, BENCHMARKS round-2 session 8), with
    # an identical collective signature. "auto" picks it exactly there
    # (accelerator + fp32/bf16 + big shard) and XLA elsewhere.
    local_kernel: str = "auto"
    # method="sstep": guarded residual-replacement cadence in outer
    # blocks (0 = off). One extra mat-vec per sstep_s*cadence
    # iterations pins the recursive residual to the true one (enables
    # sstep_s up to ~16 at fp64); the replacement self-disables once
    # ||r||^2 < eps*||r0||^2 (the explicit-residual noise floor).
    # None (default) = off for sstep_s <= 8 (trajectory-preserving),
    # cadence 1 for larger s where fp64 needs it.
    sstep_replace_every: Optional[int] = None
    # Multi-RHS route for a 2-D b: "block" (default — ONE shared
    # breakdown-free block-CG Krylov space: fewer iterations when the
    # columns are spectrally related, survives dependent RHS) or
    # "batched" (fully independent per-column recurrences with exact
    # reference semantics — vmapped single-device, data-parallel
    # (rows x rhs) mesh sharded; supports method=
    # reference/pipelined/gvpipe).
    multi_rhs: str = "block"
    # method="gvpipe": guarded residual-replacement cadence (0 = off).
    # The GV recurrences drift faster than classic CG's; without
    # replacement the residual floors ~2-3 digits above classic
    # attainable accuracy (cgx/solver/gvpipe.py docstring).
    gv_replace_every: int = 25
    # method="sstep": matrix-powers basis build. Sharded solves:
    # "deephalo" = ONE depth-(s*h) ppermute halo exchange per s-step
    # block (2 ppermutes + 1 Gram psum per s iterations) instead of
    # 2(2s-1) per-mat-vec exchanges; needs DIA + halo strategy, s*h <=
    # shard
    # rows. Single-device solves: "pallas" = the fused HBM streaming
    # kernel (cgx.ops.dia_powers, fp32/bf16 banded); "fused" = the
    # fully fused two-kernel streaming block (cgx.ops.sstep_stream —
    # the basis never touches HBM, (2*ndiag+8)N words per s
    # iterations). "off" builds the basis from 2s-1 separate mat-vecs.
    # "auto" (default, round-4 routing decision): single-device banded
    # fp32/bf16 with s <= 6 on an accelerator -> "fused" (trusted
    # 2.03x over the aliased stream at N=1.024e7; degrades gracefully
    # to the plain streaming kernel on basis rank collapse via the
    # sstep fallback); everything else -> "off".
    sstep_powers: str = "auto"
    # method="sstep": breakdown recovery after a basis rank collapse
    # (the replay freezes at a valid iterate). "auto" = finish on the
    # plain solver warm-started from the frozen iterate; "adaptive" =
    # first walk the s-ladder (restart s-step at s//2, recursively to
    # s=2 — keeps the one-reduction-per-s economics at a
    # quadratically milder basis-conditioning requirement; one extra
    # compile per rung actually taken), then the plain solver;
    # "off" = return the frozen result (breakdown=True).
    sstep_fallback: str = "auto"
