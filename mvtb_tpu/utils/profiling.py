"""Profiling + step-timing utilities (the reference had only print/tqdm —
SURVEY.md section 5 lists tracing as a gap to fill).

``trace`` wraps ``jax.profiler`` around a code block; ``StepTimer`` records
per-step wall times with compile-step exclusion and summarizes throughput.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, List, Optional

import jax


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a jax.profiler trace (view with TensorBoard / xprof)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Wall-clock step timing with warmup (compile) exclusion."""

    def __init__(self, warmup: int = 1):
        self.warmup = warmup
        self.times: List[float] = []
        self._t0: Optional[float] = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.times.append(time.perf_counter() - self._t0)

    def summary(self, items_per_step: float = 1.0) -> Dict[str, float]:
        steady = self.times[self.warmup:] or self.times
        mean = sum(steady) / len(steady)
        return {
            "steps": len(self.times),
            "mean_s": mean,
            "min_s": min(steady),
            "items_per_sec": items_per_step / mean,
            "compile_s": self.times[0] - mean if len(self.times) > self.warmup else 0.0,
        }
