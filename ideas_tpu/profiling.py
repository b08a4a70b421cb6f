"""Tracing / profiling (SURVEY.md section 5: the reference has none; the
rebuild provides jax.profiler traces + block_until_ready step timing).

Usage in the trainer: `--profile_dir /tmp/trace` captures a profiler
trace of iterations 10-15 viewable in XProf/TensorBoard; `StepTimer`
reports steady-state imgs/sec (the BASELINE.json metric) in logs.
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax


class StepTimer:
    """Wall-clock steady-state step timing with warmup skip."""

    def __init__(self, warmup: int = 3):
        self.warmup = warmup
        self.count = 0
        self.total = 0.0
        self._t0: Optional[float] = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self, result=None):
        """Call with the step's output to include device sync."""
        if result is not None:
            jax.block_until_ready(result)
        dt = time.perf_counter() - self._t0
        self.count += 1
        if self.count > self.warmup:
            self.total += dt
        return dt

    @property
    def mean_s(self) -> float:
        n = self.count - self.warmup
        return self.total / n if n > 0 else float("nan")

    def imgs_per_sec(self, batch: int) -> float:
        return batch / self.mean_s if self.mean_s > 0 else float("nan")


@contextlib.contextmanager
def trace(log_dir: Optional[str]):
    """jax.profiler trace context (no-op when log_dir is None)."""
    if not log_dir:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
