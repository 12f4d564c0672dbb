"""Relay-robust performance measurement (VERDICT r1 item 1).

Every wall-clock number on this rig rides a remote-dispatch relay with
a ~40 ms round-trip floor and a result cache that can short-circuit
repeated identical executions — so single-solve timings at small N
measure the relay, not the chip. The slope method cancels both: time
fixed-iteration solves at maxiter=k1 and k2 > k1 and report

    s/iter = (T(k2) - T(k1)) / (k2 - k1)

The fixed dispatch cost is identical in both runs and subtracts out;
per-rep perturbed right-hand sides defeat the result cache; the
median over reps rejects relay jitter. Utilization is then analytic
bytes-per-iteration (known exactly for the DIA format) divided by
s/iter, against the chip's HBM streaming bandwidth.
"""

from __future__ import annotations

import statistics
import time
from typing import Callable, Dict, Optional, Sequence, Tuple

import numpy as np

# Peak HBM bandwidth by device_kind (GB/s, vendor spec). The roofline
# for a bandwidth-bound SpMV solve is traffic / peak_bw.
HBM_GBPS = {
    "TPU v5 lite": 819.0,  # v5e: 819 GB/s HBM2E per chip
    "TPU v5e": 819.0,
    "TPU v4": 1228.0,
    "TPU v5p": 2765.0,
    "TPU v6 lite": 1640.0,  # v6e (Trillium)
}


def chip_hbm_gbps(default: float = 819.0) -> float:
    import jax

    kind = jax.devices()[0].device_kind
    for k, v in HBM_GBPS.items():
        if kind.startswith(k):
            return v
    return default


def dia_cg_bytes_per_iter(
    n: int, ndiag: int, itemsize: int, precond_factor: float = 0.0
) -> float:
    """Analytic HBM traffic of one banded CG iteration, in bytes.

    Mat-vec: read bands (ndiag * n) + read p (n, shifted reads hit the
    same cache lines) + write Ap (n). Recurrence: x += a p (r x, r p,
    w x), r -= a Ap (r r, r Ap, w r), p = r + b p (r r, r p, w p), two
    dots (reads already counted via operands r/p/Ap re-reads — counted
    once each: r p, r Ap, r r). Total = (ndiag + 13) * n * itemsize.
    This is the MINIMUM traffic assuming perfect fusion of elementwise
    chains into single passes; achieved/peak ratios above ~100% would
    indicate the model undercounts fusion (XLA fusing dot+axpy into
    one pass), below ~50% real headroom.

    precond_factor adds that multiple of the mat-vec traffic for a
    preconditioner apply (e.g. 1.0 for one extra banded pass).
    """
    base = (ndiag + 13.0) * n * itemsize
    return base + precond_factor * (ndiag + 2.0) * n * itemsize


def device_sync(out) -> None:
    """Reliable execution barrier: FETCH one scalar of the result.

    On the remote-dispatch (axon) relay, ``block_until_ready`` can
    return before compilation/execution has actually happened (the
    first later value fetch then pays tens of seconds of queued
    work). Fetching a value is the only dependable barrier; it adds
    one relay round-trip, which is identical across iteration counts
    and therefore cancels in the slope.
    """
    import jax
    import jax.numpy as jnp

    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(jnp.ravel(leaf)[0])


def time_call(fn: Callable[[], object]) -> float:
    """Wall time of fn() including a fetch-based device sync."""
    t0 = time.perf_counter()
    device_sync(fn())
    return time.perf_counter() - t0


def slope_seconds_per_iter(
    run: Callable[[object, int], object],
    make_b: Callable[[int], np.ndarray],
    *,
    ks: Sequence[int] = (200, 400, 600),
    reps: int = 5,
    clock: Callable[[], float] = time.perf_counter,
) -> Dict[str, float]:
    """Median slope-method s/iter for a fixed-iteration solver.

    Args:
      run: (b_device, maxiter) -> device result; MUST run exactly
        maxiter iterations (tol=0 semantics) and return something
        block_until_ready-able.
      make_b: rep index -> right-hand side; MUST vary per rep so the
        relay's result cache cannot short-circuit the execution.

    Protocol hardening for the remote-dispatch relay: the RHS is
    device_put and synced BEFORE the timed region (upload time must
    not pollute either endpoint), a dummy device op drains the
    dispatch queue before each timing, each maxiter is compiled and
    executed twice in warmup, and the ks are visited in snake order
    (ascending on even reps, descending on odd) so a slow linear
    drift in relay tenancy hits every k equally instead of biasing
    the slope. The headline ``s_per_iter`` is the Theil-Sen estimate
    — the median of all pairwise slopes across every (k, t) sample of
    every rep — which survives up to ~29% outlier samples, the
    session-7 failure mode (sporadic multi-10-ms relay spikes that a
    per-rep least-squares line turns into negative or near-zero
    slopes). The per-rep least-squares fits are still returned:
    'floor' (fixed per-solve overhead), 'fit_rel_err' (max relative
    residual — a large value flags a measurement to distrust), and
    's_per_iter_lsq' (the round-1 estimator, median of per-rep LSQ
    slopes). 'ts_spread' is the relative IQR of the pairwise slopes:
    the Theil-Sen analogue of fit_rel_err. ``clock`` is injectable so
    the slope/fit math can be tested against a virtual clock, immune
    to host load.
    """
    import jax
    import jax.numpy as jnp

    def put(b):
        d = jax.device_put(b)
        device_sync(d)
        return d

    b0 = put(make_b(-1))
    for k in ks:  # compile + first-touch, twice each
        device_sync(run(b0, k))
        device_sync(run(b0, k))

    slopes, floors, errs = [], [], []
    samples = []  # (k, t) across all reps, for Theil-Sen
    for rep in range(reps):
        b = put(make_b(rep))
        order = list(ks) if rep % 2 == 0 else list(ks)[::-1]
        t_by_k = {}
        for k in order:
            device_sync(jnp.zeros(8) + float(len(t_by_k)))  # drain queue
            t0 = clock()
            out = run(b, k)
            device_sync(out)
            t_by_k[k] = clock() - t0
        ts = [t_by_k[k] for k in ks]
        samples.extend((float(k), t_by_k[k]) for k in ks)
        a_mat = np.stack([np.asarray(ks, float), np.ones(len(ks))], 1)
        coef, *_ = np.linalg.lstsq(a_mat, np.asarray(ts), rcond=None)
        pred = a_mat @ coef
        errs.append(
            float(np.max(np.abs(pred - ts) / np.maximum(ts, 1e-12)))
        )
        slopes.append(float(coef[0]))
        floors.append(float(coef[1]))
    pair_slopes = sorted(
        (t2 - t1) / (k2 - k1)
        for i, (k1, t1) in enumerate(samples)
        for (k2, t2) in samples[i + 1 :]
        if k2 != k1
    )
    ts_slope = statistics.median(pair_slopes)
    q1 = pair_slopes[len(pair_slopes) // 4]
    q3 = pair_slopes[(3 * len(pair_slopes)) // 4]
    return {
        "s_per_iter": ts_slope,
        "s_per_iter_lsq": statistics.median(slopes),
        "s_per_iter_all": slopes,
        "floor": statistics.median(floors),
        "fit_rel_err": max(errs),
        "ts_spread": (q3 - q1) / abs(ts_slope) if ts_slope else float("inf"),
        "ks": tuple(int(k) for k in ks),
        "reps": reps,
    }


def row_trusted(
    us_per_iter: float,
    ts_spread: float,
    pct_peak: float,
    *,
    spread_gate: float = 0.2,
    pct_peak_gate: float = 105.0,
) -> bool:
    """Tenancy trust gate for one slope-measured row (VERDICT r4
    item 1a). A row is trusted iff (a) the slope is positive, (b) the
    Theil-Sen pairwise-slope relative IQR is within the calm-window
    envelope measured on this rig (clean windows sit at 0.01-0.2;
    poisoned ones at 1-70, results/hw_queue_r4/*), and (c) the
    analytic utilization is physically sane — the traffic models
    overcount fused in-place updates by a few %%, so up to 105%% of
    nominal peak is plausible; beyond that the number measures relay
    tenancy, not the kernel (r4's refused row: 854.9%% of peak).
    """
    return (
        us_per_iter > 0
        and ts_spread <= spread_gate
        and 0 < pct_peak <= pct_peak_gate
    )


def utilization_report(
    s_per_iter: float,
    bytes_per_iter: float,
    peak_gbps: Optional[float] = None,
) -> Dict[str, float]:
    """GB/s achieved and fraction of HBM streaming peak."""
    if peak_gbps is None:
        peak_gbps = chip_hbm_gbps()
    gbps = bytes_per_iter / s_per_iter / 1e9
    return {
        "achieved_gbps": gbps,
        "peak_gbps": peak_gbps,
        "fraction_of_peak": gbps / peak_gbps,
    }


def dense_cg_flops_per_iter(n: int) -> float:
    """Dense mat-vec dominates: 2 n^2 multiply-adds (+O(n) vector
    work, negligible)."""
    return 2.0 * n * n


def measure_dia_cg(
    dia,
    *,
    dtype="float64",
    ks: Sequence[int] = (200, 400, 600),
    reps: int = 5,
    precond=None,
    precond_factor: float = 0.0,
) -> Dict[str, float]:
    """Slope-measure single-device banded CG on the current backend.

    Returns the slope dict + utilization fields. ``precond`` is an
    optional preconditioner callable passed to cg_solve; its extra
    traffic must be described by precond_factor for the utilization
    number to stay honest.
    """
    import jax.numpy as jnp

    from cgx.solver.cg import cg_solve
    from cgx.solver.operators import DiaOperator

    n = dia.shape[0]
    ndiag = len(dia.offsets)
    op = DiaOperator(
        jnp.asarray(np.asarray(dia.bands, dtype)), tuple(dia.offsets)
    )
    rs = np.random.default_rng(0)

    def make_b(rep: int) -> np.ndarray:
        return (1.0 + 0.01 * (rep + 2)) * (
            rs.standard_normal(n).astype(dtype)
        )

    def run(b, k):
        return cg_solve(
            op, b, tol=0.0, maxiter=k, precond=precond
        ).x

    out = slope_seconds_per_iter(
        run, make_b, ks=ks, reps=reps
    )
    itemsize = np.dtype(dtype).itemsize
    bpi = dia_cg_bytes_per_iter(n, ndiag, itemsize, precond_factor)
    out.update(
        utilization_report(out["s_per_iter"], bpi)
    )
    out["bytes_per_iter"] = bpi
    out["n"] = n
    out["dtype"] = str(dtype)
    return out


def measure_dense_cg(
    a: np.ndarray,
    *,
    dtype="float32",
    block_rows: int = 256,
    block_cols: int = 512,
    kernel: str = "pallas",
    ks: Sequence[int] = (50, 100, 150),
    reps: int = 3,
) -> Dict[str, float]:
    """Slope-measure dense CG with the Pallas mat-vec (or the XLA dot
    baseline) — the reference's actual regime (dense SPD A on one
    accelerator, CUDA_T.txt sweep analogue).

    Utilization is reported against BOTH limits: HBM streaming of A
    (the binding one for mat-vec: 1 multiply-add per element read)
    and, for reference, the flops rate.
    """
    import jax.numpy as jnp

    from cgx.solver.cg import cg_solve

    from cgx.solver.operators import DenseOperator, PallasDenseOperator

    n = a.shape[0]
    a_dev = jnp.asarray(np.asarray(a, dtype))
    # operator PYTREES, not closures: a closure bakes A into the
    # program as a constant (multi-GB relay-compile payloads)
    if kernel == "pallas":
        op = PallasDenseOperator(
            a_dev, block_rows=block_rows, block_cols=block_cols
        )
    elif kernel == "xla":
        op = DenseOperator(a_dev)
    else:
        raise ValueError(f"unknown kernel {kernel!r}")
    rs = np.random.default_rng(0)

    def make_b(rep: int) -> np.ndarray:
        return (1.0 + 0.01 * (rep + 2)) * (
            rs.standard_normal(n).astype(dtype)
        )

    def run(b, k):
        return cg_solve(op, b, tol=0.0, maxiter=k).x

    out = slope_seconds_per_iter(run, make_b, ks=ks, reps=reps)
    itemsize = np.dtype(dtype).itemsize
    bpi = float(n) * n * itemsize  # one full pass over A dominates
    out.update(utilization_report(out["s_per_iter"], bpi))
    out["bytes_per_iter"] = bpi
    out["gflops"] = dense_cg_flops_per_iter(n) / out["s_per_iter"] / 1e9
    out["n"] = n
    out["dtype"] = str(dtype)
    out["kernel"] = kernel
    out["block_rows"] = block_rows
    out["block_cols"] = block_cols
    return out
