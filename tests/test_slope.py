"""Slope-method measurement harness tests (VERDICT r1 item 1).

The real numbers come from the TPU runs recorded in BENCHMARKS.md;
here we pin the harness itself: the fixed per-solve overhead must
cancel exactly, the traffic model must count what it says, and the
end-to-end measurement must produce a sane positive s/iter on CPU.
"""


import numpy as np
import pytest

from cgx.bench.slope import (
    dia_cg_bytes_per_iter,
    measure_dia_cg,
    slope_seconds_per_iter,
    utilization_report,
)


def test_slope_cancels_fixed_overhead():
    """A synthetic runner with 5 ms fixed cost + 0.1 ms/iter must
    yield exactly 0.1 ms/iter and a 5 ms floor. Uses the injectable
    virtual clock so the slope/fit math is pinned deterministically —
    a sleep-based version was flaky under parallel CI host load."""
    vclock = {"t": 0.0}

    def run(b, k):
        vclock["t"] += 0.005 + 1e-4 * k
        return np.zeros(1)  # device_sync handles numpy leaves via jnp

    out = slope_seconds_per_iter(
        run,
        lambda rep: np.zeros(4),
        ks=(10, 40, 70),
        reps=3,
        clock=lambda: vclock["t"],
    )
    assert abs(out["s_per_iter"] - 1e-4) / 1e-4 < 1e-6
    assert abs(out["floor"] - 0.005) < 1e-9
    assert out["fit_rel_err"] < 1e-6


def test_slope_survives_outlier_spikes():
    """Session-7 failure mode: sporadic multi-10-ms relay spikes. A
    per-rep LSQ line turns one spiked sample into a garbage slope
    (negative or >100%-of-roofline); the Theil-Sen headline estimate
    must stay exact with 2 of 15 samples spiked."""
    vclock = {"t": 0.0, "calls": 0}

    def run(b, k):
        vclock["calls"] += 1
        spike = 0.080 if vclock["calls"] in (3, 11) else 0.0
        vclock["t"] += 0.005 + 1e-4 * k + spike
        return np.zeros(1)

    out = slope_seconds_per_iter(
        run,
        lambda rep: np.zeros(4),
        ks=(10, 40, 70),
        reps=5,
        clock=lambda: vclock["t"],
    )
    # calls 1..6 are warmup (2 per k); spikes land in warmup + rep 2
    assert abs(out["s_per_iter"] - 1e-4) / 1e-4 < 1e-6
    # the LSQ estimator sees the spiked rep; fit_rel_err must flag it
    assert out["fit_rel_err"] > 0.5


def test_slope_snake_order_cancels_linear_drift():
    """A linear-in-time tenancy drift (each call slower than the
    last by a fixed amount) biases ascending-k visits; the snake
    order must cancel it across rep pairs for the Theil-Sen median."""
    vclock = {"t": 0.0, "calls": 0}
    drift = 2e-3  # 2 ms extra per successive call — huge

    def run(b, k):
        vclock["calls"] += 1
        vclock["t"] += 0.005 + 1e-4 * k + drift * vclock["calls"]
        return np.zeros(1)

    out = slope_seconds_per_iter(
        run,
        lambda rep: np.zeros(4),
        ks=(10, 40, 70),
        reps=4,
        clock=lambda: vclock["t"],
    )
    # ascending-only visits would report 1e-4 + drift/30 = 1.67e-4;
    # snake order must keep the median within a few percent
    assert abs(out["s_per_iter"] - 1e-4) / 1e-4 < 0.05


def test_bytes_per_iter_model():
    # 5-diagonal fp64: (5 + 13) * n * 8
    assert dia_cg_bytes_per_iter(1000, 5, 8) == 18 * 1000 * 8
    # preconditioner adds (ndiag + 2) * n * itemsize per factor
    assert (
        dia_cg_bytes_per_iter(1000, 5, 8, precond_factor=1.0)
        == (18 + 7) * 1000 * 8
    )


def test_utilization_report():
    rep = utilization_report(1e-3, 819e6, peak_gbps=819.0)
    assert abs(rep["achieved_gbps"] - 819.0) < 1e-9
    assert abs(rep["fraction_of_peak"] - 1.0) < 1e-12


def test_measure_dia_cg_end_to_end():
    from cgx.mats.generators import lap2d_fd

    # n=1024 CPU iterations are ~us-scale, so a loaded CI host can
    # produce a negative slope from scheduler noise; widen the k span
    # and retry once before declaring the harness broken
    for attempt in range(2):
        out = measure_dia_cg(lap2d_fd(32), ks=(50, 400), reps=3)
        if out["s_per_iter"] > 0:
            break
    assert out["s_per_iter"] > 0
    assert out["bytes_per_iter"] == 18 * 1024 * 8
    assert out["n"] == 1024
    assert 0 < out["achieved_gbps"] < 1e5


def test_row_trusted_gates():
    """The bench.py tenancy trust gate (VERDICT r4 item 1a): spread
    and absolute-utilization gates, plus the negative-slope refusal.
    The three refused rows are real round-4 failures (BENCH_r04's
    854.9%-of-peak tertiary; sstep_shape_bf16.json's negative-slope
    and spread-24.7 rows)."""
    from cgx.bench.slope import row_trusted

    assert row_trusted(283.0, 0.034, 90.4)
    assert row_trusted(940.6, 0.164, 79.8)
    # r4's shipped-but-poisoned tertiary: spread 27.3, 854.9% of peak
    assert not row_trusted(34.3, 27.316, 854.9)
    # negative slope (tenancy burst mid-snake)
    assert not row_trusted(-45.3, 0.1, 50.0)
    # calm spread but impossible utilization
    assert not row_trusted(100.0, 0.05, 150.0)
    # spread just over the gate
    assert not row_trusted(283.0, 0.21, 90.4)
    # custom gates pass through
    assert row_trusted(283.0, 0.21, 90.4, spread_gate=0.25)
