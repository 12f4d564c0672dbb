"""Phase timers and profiling hooks (SURVEY §5 'tracing/profiling').

The reference instruments exactly one wall-clock span (around solve(),
cg_main.cc:53-55) and relied on offline gprof for the "mat-vec
dominates" conclusion (figures/gprof.png). Here:

- :class:`PhaseTimer` — named wall-clock phases with jax-aware
  synchronization (block_until_ready before stopping a phase, so device
  work is attributed to the phase that launched it).
- :func:`trace` — context manager wrapping ``jax.profiler`` traces for
  on-TPU timeline capture (view in TensorBoard/XProf).
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional

import jax


class PhaseTimer:
    """Accumulating named phase timer.

    >>> t = PhaseTimer()
    >>> with t.phase("setup"):
    ...     ...
    >>> with t.phase("solve"):
    ...     ...
    >>> t.report()   # {'setup': ..., 'solve': ...}
    """

    def __init__(self, sync: bool = True):
        self.sync = sync
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def phase(self, name: str, *sync_values):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if self.sync and sync_values:
                jax.block_until_ready(sync_values)
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def report(self) -> Dict[str, float]:
        return dict(self.totals)

    def summary(self) -> str:
        total = sum(self.totals.values()) or 1.0
        lines = []
        for name, t in sorted(self.totals.items(), key=lambda kv: -kv[1]):
            lines.append(
                f"{name:>20s}: {t:9.4f} s  ({100*t/total:5.1f}%)  x{self.counts[name]}"
            )
        return "\n".join(lines)


@contextlib.contextmanager
def trace(log_dir: Optional[str] = None):
    """jax.profiler trace context; no-op when log_dir is None."""
    if log_dir is None:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
