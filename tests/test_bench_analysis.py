"""Sweep harness + analysis pipeline tests (reference L6/L7)."""

import numpy as np
import pytest

from cgx.bench.analysis import (
    REFERENCE_ALPHAS,
    ScalingTable,
    amdahl_bound,
    fit_alpha,
    gustafson_bound,
    weak_efficiency,
)
from cgx.bench.sweeps import kernel_sweep, strong_scaling, weak_scaling


def test_scaling_table_parse_and_speedup():
    rows = ["1024,1,1.0", "1024,2,0.6", "1024,4,0.35", "2048,1,4.0", "2048,4,1.25"]
    t = ScalingTable.parse(rows)
    sp = dict(t.speedup(1024))
    assert sp[1] == 1.0 and abs(sp[4] - 1.0 / 0.35) < 1e-12
    eff = dict(t.efficiency(2048))
    assert abs(eff[4] - (4.0 / 1.25) / 4) < 1e-12


def test_amdahl_gustafson_bounds():
    p = np.array([1, 2, 4, 8, 16])
    s = amdahl_bound(0.0, p)
    np.testing.assert_allclose(s, p)  # no serial fraction -> ideal
    s = amdahl_bound(1.0, p)
    np.testing.assert_allclose(s, np.ones_like(p, dtype=float))
    g = gustafson_bound(0.0, p)
    np.testing.assert_allclose(g, np.ones_like(p, dtype=float))
    # reference's measured alphas are small and monotonically decreasing in N
    alphas = [REFERENCE_ALPHAS[n] for n in sorted(REFERENCE_ALPHAS)]
    assert all(a2 <= a1 + 1e-12 for a1, a2 in zip(alphas, alphas[1:]))


def test_fit_alpha_roundtrip():
    p = np.array([2, 4, 8, 16, 32])
    alpha = 0.05
    speedups = list(zip(p.tolist(), amdahl_bound(alpha, p).tolist()))
    assert abs(fit_alpha(speedups) - alpha) < 1e-9


def test_weak_efficiency():
    ladder = [(1, 1.0), (4, 1.25), (16, 2.0)]
    eff = dict(weak_efficiency(ladder))
    assert eff[1] == 1.0 and eff[4] == 0.8 and eff[16] == 0.5


def test_strong_scaling_sweep_smoke(tmp_path):
    out = tmp_path / "strong.txt"
    rows = strong_scaling(
        sizes=(128,), device_counts=(1, 2), out_file=out, fmt="dia", tol=1e-4
    )
    assert len(rows) == 2
    text = out.read_text().strip().splitlines()
    assert len(text) == 2
    n, p, t = text[0].split(",")
    assert n == "128" and p == "1" and float(t) > 0


def test_weak_scaling_sweep_smoke(tmp_path):
    out = tmp_path / "weak.txt"
    rows = weak_scaling(
        base_sizes=(128,), device_counts=(1, 4), out_file=out, fmt="dia", maxiter=20
    )
    assert len(rows) == 2
    # N(4) = 128*sqrt(4) = 256
    assert rows[1].startswith("256,4,")


def test_kernel_sweep_smoke(tmp_path):
    out = tmp_path / "tiles.txt"
    rows = kernel_sweep(
        n=256, threads=(64,), block_widths=(128,), out_file=out, repeats=1
    )
    assert len(rows) == 1
    assert rows[0].startswith("64,128,")


def test_make_plots(tmp_path):
    pytest.importorskip("matplotlib")
    from cgx.bench.analysis import make_plots

    strong = tmp_path / "strong.txt"
    strong.write_text("1024,1,1.0\n1024,2,0.6\n1024,4,0.4\n")
    weak = tmp_path / "weak.txt"
    weak.write_text("1024,1,1.0\n2048,4,1.3\n4096,16,1.9\n")
    written = make_plots(strong, weak, tmp_path / "figs")
    assert len(written) == 2
    import os

    assert all(os.path.getsize(w) > 1000 for w in written)


# --- analytic communication model (VERDICT r1 item 7) -----------------


def test_comm_model_fit_roundtrip():
    """fit_comm_model_joint recovers (alpha, beta, t1) from data the
    model itself generated, across sizes (single-N sweeps cannot
    separate latency from bandwidth)."""
    from cgx.bench.analysis import (
        fit_comm_model_joint,
        predict_scaling,
        reference_comm_model,
    )

    m = reference_comm_model()
    true = {"alpha": 2e-5, "beta": 3e-10}
    by_n, iters, t1s = {}, {}, {}
    for n in (4096, 16384, 65536):
        t1 = 1e-10 * n * n  # quadratic dense work
        t1s[n] = t1
        rows = []
        for p in (1, 2, 4, 8, 16, 32):
            t = float(
                m.iter_time(p, n, t1=t1, alpha=true["alpha"], beta=true["beta"])
            )
            rows.append((p, t * 200))
        by_n[n] = rows
        iters[n] = 200
    fit = fit_comm_model_joint(by_n, iters, m)
    assert abs(fit["alpha"] - true["alpha"]) / true["alpha"] < 1e-6
    assert abs(fit["beta"] - true["beta"]) / true["beta"] < 1e-6
    for n in by_n:
        assert abs(fit[f"t1:{n}"] - t1s[n]) / t1s[n] < 1e-6
    pred = predict_scaling(
        m, 16384, [8],
        {"t1": fit["t1:16384"], "alpha": fit["alpha"], "beta": fit["beta"]},
        iters=200,
    )
    assert abs(pred[0][1] - dict(by_n[16384])[8]) < 1e-9


def test_comm_model_fits_reference_cluster_data():
    """The Thakur-style model must reproduce the reference's own
    measured strong-scaling rows (/root/reference/results/
    strong_scaling.txt) to ~25% rel RMS across N=1024..8192 — with the
    single documented exception of the p=64 inter-node cliff the
    reference itself calls out (report: 'mitigates drop with network
    communications (p > 36)')."""
    import os

    import numpy as np

    from cgx.bench.analysis import (
        ScalingTable,
        fit_comm_model_joint,
        reference_comm_model,
    )

    path = "/root/reference/results/strong_scaling.txt"
    if not os.path.exists(path):
        import pytest

        pytest.skip("reference results not available")
    ref = ScalingTable.read(path)
    by_n = {n: [(p, t) for p, t in ref.by_n[n] if p <= 32] for n in ref.by_n}
    fit = fit_comm_model_joint(by_n, {n: 1 for n in by_n}, reference_comm_model())
    assert fit["rel_rms"] < 0.25, fit
    assert fit["alpha"] > 0  # latency term is identifiable
    # serial rows dominated by compute: t1 approximately the measured p=1
    for n in (4096, 8192):
        t1_meas = dict(by_n[n])[1]
        assert abs(fit[f"t1:{n}"] - t1_meas) / t1_meas < 0.25


def test_strategy_crossover_prefers_halo_at_scale():
    """On any machine with nonzero bandwidth cost, the banded halo
    pattern (O(bandwidth) fixed traffic) must beat the reference
    allgather pattern (O(N (p-1)/p) traffic) for large N, and the
    pipelined variant must never lose to plain halo (fewer latency
    launches, same traffic)."""
    from cgx.bench.analysis import strategy_crossover

    params = {"t1": 1e-3, "alpha": 1e-6, "beta": 1e-11}
    out = strategy_crossover(n=1_000_000, bandwidth=1000, params=params)
    ag = dict(out["allgather"])
    halo = dict(out["halo"])
    pipe = dict(out["pipelined"])
    for p in (8, 32, 64):
        assert halo[p] < ag[p], (p, halo[p], ag[p])
        assert pipe[p] <= halo[p] + 1e-15


def test_sstep_deephalo_model_wins_at_high_latency():
    """At latency-dominated scale (large alpha*log2 p), the deep-halo
    s-step pattern's 5/s collectives per iteration must beat both the
    per-mat-vec-halo s-step (4s-1 per block) and pipelined (1/iter);
    at beta-dominated small p the ordering can invert."""
    from cgx.bench.analysis import (
        pipelined_comm_model,
        sstep_comm_model,
        sstep_deephalo_comm_model,
    )

    w, s, n = 1000, 8, 1_000_000  # 5/s < 1: beats pipelined for s > 5
    hi_lat = dict(t1=1e-3, alpha=5e-6, beta=1e-10)
    args = dict(n=n, **hi_lat)
    t_ss = sstep_comm_model(w, s).iter_time(64, **args)
    t_dh = sstep_deephalo_comm_model(w, s).iter_time(64, **args)
    t_pp = pipelined_comm_model(w).iter_time(64, **args)
    assert t_dh < t_ss
    assert t_dh < t_pp
    # bytes term: deephalo pays ~2w/s more per iteration than
    # per-mat-vec halos; with alpha = 0 it must NOT win
    no_lat = dict(n=n, t1=1e-3, alpha=0.0, beta=1e-8)
    assert (sstep_deephalo_comm_model(w, s).iter_time(64, **no_lat)
            > sstep_comm_model(w, s).iter_time(64, **no_lat))


def test_strategy_crossover_includes_sstep_models():
    from cgx.bench.analysis import strategy_crossover

    params = dict(t1=1e-3, alpha=1e-6, beta=1e-10)
    out = strategy_crossover(n=1_000_000, bandwidth=1000, params=params)
    assert {"sstep", "sstep_deephalo"} <= set(out)
