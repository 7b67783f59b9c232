"""Step-time metrics and profiler hooks.

The reference's only observability is per-step ``.count()`` log lines forcing
evaluation (``/root/reference/node2vec/spark.py:503-613``); here a lightweight
timer collects per-superstep wall times and throughput, and ``profiler_trace``
wraps a block in a ``jax.profiler`` trace for TPU timeline capture.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, List, Optional


class StepTimer:
    """Collects named step durations and derived throughput."""

    def __init__(self):
        self.times: Dict[str, List[float]] = {}

    @contextlib.contextmanager
    def measure(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.times.setdefault(name, []).append(time.perf_counter() - t0)

    def total(self, name: str) -> float:
        return sum(self.times.get(name, []))

    def mean(self, name: str) -> float:
        ts = self.times.get(name, [])
        return sum(ts) / len(ts) if ts else 0.0

    def count(self, name: str) -> int:
        return len(self.times.get(name, []))

    def throughput(self, name: str, units_per_step: float) -> float:
        """units/second for a step kind, excluding the first (compile) call."""
        ts = self.times.get(name, [])
        if not ts:
            return 0.0
        steady = ts[1:] if len(ts) > 1 else ts
        total = sum(steady)
        return (units_per_step * len(steady) / total) if total > 0 else 0.0

    def summary(self) -> Dict[str, Dict[str, float]]:
        return {
            k: {"count": len(v), "total_s": sum(v), "mean_s": sum(v) / len(v)}
            for k, v in self.times.items()
        }


@contextlib.contextmanager
def profiler_trace(log_dir: Optional[str]):
    """jax.profiler trace of the enclosed block (no-op when log_dir is None)."""
    if not log_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
