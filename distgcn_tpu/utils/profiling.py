"""Profiling and throughput instrumentation.

The reference logs only wall-clock spans (`mwis_dqn_test.py:318,334`). Here:
- `trace(logdir)`: context manager around `jax.profiler` for device traces
  viewable in TensorBoard/XProf.
- `StepTimer`: rolling throughput counters (graphs/s, edges/s, rounds) with
  an exponential moving average matching the reference's `emv`
  (test_utils.py:7-10).
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field
from typing import Optional


@contextlib.contextmanager
def trace(logdir: str = "/tmp/distgcn_trace"):
    import jax
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


def emv(sample: float, prev: Optional[float], n: int = 3) -> float:
    """Exponential moving average (test_utils.py:7-10)."""
    if prev is None:
        return sample
    k = 2.0 / (n + 1)
    return sample * k + prev * (1 - k)


@dataclass
class StepTimer:
    name: str = "step"
    _t0: float = field(default=0.0, repr=False)
    count: int = 0
    graphs: int = 0
    edges: int = 0
    total_s: float = 0.0
    ema_s: Optional[float] = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        dt = time.perf_counter() - self._t0
        self.count += 1
        self.total_s += dt
        self.ema_s = emv(dt, self.ema_s)
        return False

    def add(self, graphs: int = 0, edges: int = 0):
        self.graphs += graphs
        self.edges += edges

    @property
    def graphs_per_s(self) -> float:
        return self.graphs / self.total_s if self.total_s else 0.0

    @property
    def edges_per_s(self) -> float:
        return self.edges / self.total_s if self.total_s else 0.0

    def summary(self) -> str:
        return (f"{self.name}: {self.count} steps, {self.total_s:.3f}s, "
                f"{self.graphs_per_s:.1f} graphs/s, "
                f"{self.edges_per_s:.3g} edges/s, ema {self.ema_s or 0:.4f}s")
