"""Benchmark analysis (reference L7: plots.ipynb).

Parses the CSV schemas of the sweep harness / reference ``results/``
files and computes the derived quantities the reference notebook plots:
speedup, parallel efficiency, Amdahl and Gustafson bounds (plots.ipynb
cell 2: ``ALPHAS``, ``show_hard_MPI_results``, ``show_weak_MPI_results``,
``show_CUDA_results``). Plotting is optional (matplotlib if present);
the numeric pipeline is fully testable headless.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Sequence, Tuple

import numpy as np

# Measured Amdahl serial fractions per N from the reference report
# (report.pdf appendix table; plots.ipynb ALPHAS dict).
REFERENCE_ALPHAS: Dict[int, float] = {
    1024: 1 - 0.9753,
    1448: 1 - 0.9852,
    2048: 1 - 0.9910,
    2896: 1 - 0.9935,
    4096: 1 - 0.9950,
    5792: 1 - 0.9966,
    8192: 1 - 0.9981,
    11585: 1 - 0.9988,
    16384: 1 - 0.9996,
}


@dataclasses.dataclass
class ScalingTable:
    """Rows of an ``N,psize,seconds`` CSV grouped by N."""

    by_n: Dict[int, List[Tuple[int, float]]]

    @classmethod
    def parse(cls, rows: Sequence[str]) -> "ScalingTable":
        by_n: Dict[int, List[Tuple[int, float]]] = {}
        for row in rows:
            row = row.strip()
            if not row or row.startswith("#"):
                continue  # '#' header/caveat comments (cgx extension;
                #           the reference CSVs are comment-free)
            n_s, p_s, t_s = row.split(",")
            by_n.setdefault(int(n_s), []).append((int(p_s), float(t_s)))
        for v in by_n.values():
            v.sort()
        return cls(by_n)

    @classmethod
    def read(cls, path) -> "ScalingTable":
        with open(path) as f:
            return cls.parse(f.readlines())

    def speedup(self, n: int) -> List[Tuple[int, float]]:
        """S(p) = T(1)/T(p) (the hard-scaling plot's y-axis)."""
        rows = self.by_n[n]
        t1 = dict(rows).get(1)
        if t1 is None:
            raise ValueError(f"no p=1 row for N={n}")
        return [(p, t1 / t) for p, t in rows]

    def efficiency(self, n: int) -> List[Tuple[int, float]]:
        """E(p) = S(p)/p (strong) — the weak plot uses weak_efficiency."""
        return [(p, s / p) for p, s in self.speedup(n)]


def amdahl_bound(alpha: float, p: np.ndarray) -> np.ndarray:
    """S(p) <= p / (alpha*p + (1-alpha)) (report MPI-hard slide)."""
    p = np.asarray(p, dtype=float)
    return p / (alpha * p + (1.0 - alpha))


def gustafson_bound(beta: float, p: np.ndarray) -> np.ndarray:
    """Weak-scaling efficiency bound ((1-beta)*p + beta)/p
    (report MPI-weak slide; beta = serial fraction)."""
    p = np.asarray(p, dtype=float)
    return ((1.0 - beta) * p + beta) / p


def group_ladders(
    by_n: Dict[int, List[Tuple[int, float]]],
) -> Dict[int, List[Tuple[int, float]]]:
    """Group weak-scaling rows into ladders keyed by the base size N0,
    reconstructing N0 = round(N / sqrt(p)) from each (N, p) row (the
    inverse of the reference's N(p) = N0*sqrt(p) schedule)."""
    ladders: Dict[int, List[Tuple[int, float]]] = {}
    for n, rows in by_n.items():
        for p, t in rows:
            n0 = int(round(n / np.sqrt(p)))
            ladders.setdefault(n0, []).append((p, t))
    return ladders


def weak_efficiency(ladder: Sequence[Tuple[int, float]]) -> List[Tuple[int, float]]:
    """E_w(p) = T(1)/T(p) for a weak-scaling ladder (constant work per
    device by construction N(p)=N0*sqrt(p))."""
    ladder = sorted(ladder)
    t1 = dict(ladder).get(1)
    if t1 is None:
        raise ValueError("no p=1 rung")
    return [(p, t1 / t) for p, t in ladder]


def fit_alpha(speedups: Sequence[Tuple[int, float]]) -> float:
    """Least-squares fit of the Amdahl serial fraction to measured
    speedups (how the reference derived its ALPHAS table)."""
    ps = np.array([p for p, _ in speedups if p > 1], dtype=float)
    ss = np.array([s for p, s in speedups if p > 1], dtype=float)
    if len(ps) == 0:
        return 0.0
    # S = p / (alpha p + 1 - alpha)  =>  alpha = (p/S - 1) / (p - 1)
    alphas = (ps / ss - 1.0) / (ps - 1.0)
    return float(np.clip(alphas.mean(), 0.0, 1.0))


def make_plots(strong_path, weak_path, out_dir) -> List[str]:
    """Regenerate the reference's figure set from CSVs (MPI_hard.png,
    MPI_weak.png analogues). Returns written paths; no-op without
    matplotlib."""
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError:  # pragma: no cover
        return []
    import os

    os.makedirs(out_dir, exist_ok=True)
    written = []

    strong = ScalingTable.read(strong_path)
    fig, ax = plt.subplots(figsize=(6, 4))
    for n in sorted(strong.by_n):
        sp = strong.speedup(n)
        ps = [p for p, _ in sp]
        ax.plot(ps, [s for _, s in sp], "o-", label=f"N={n}")
        alpha = REFERENCE_ALPHAS.get(n, fit_alpha(sp))
        grid = np.array(sorted(set(ps)))
        ax.plot(grid, amdahl_bound(alpha, grid), "--", alpha=0.4)
    ax.set_xlabel("devices p")
    ax.set_ylabel("speedup")
    ax.legend()
    ax.set_title("Strong scaling (dashed: Amdahl bound)")
    path = os.path.join(out_dir, "strong_scaling.png")
    fig.savefig(path, dpi=120, bbox_inches="tight")
    plt.close(fig)
    written.append(path)

    weak = ScalingTable.read(weak_path)
    fig, ax = plt.subplots(figsize=(6, 4))
    ladders = group_ladders(weak.by_n)
    for n0 in sorted(ladders):
        try:
            eff = weak_efficiency(ladders[n0])
        except ValueError:
            continue
        ax.plot([p for p, _ in eff], [e for _, e in eff], "o-", label=f"N0={n0}")
    ax.set_xlabel("devices p")
    ax.set_ylabel("weak efficiency")
    ax.legend()
    ax.set_title("Weak scaling, N(p)=N0*sqrt(p), fixed iterations")
    path = os.path.join(out_dir, "weak_scaling.png")
    fig.savefig(path, dpi=120, bbox_inches="tight")
    plt.close(fig)
    written.append(path)
    return written
