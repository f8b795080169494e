"""Profiling / tracing (SURVEY.md §5: the reference has no tracer; the TPU
equivalent is jax.profiler traces + a per-step timing context)."""

from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a TensorBoard-viewable device trace of the enclosed block."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Rolling per-step wall-clock stats."""

    def __init__(self, window: int = 50):
        self.window = window
        self.times = []
        self._last: Optional[float] = None

    def tick(self) -> float:
        now = time.perf_counter()
        dt = 0.0 if self._last is None else now - self._last
        self._last = now
        if dt > 0:
            self.times.append(dt)
            self.times = self.times[-self.window:]
        return dt

    @property
    def mean(self) -> float:
        return sum(self.times) / len(self.times) if self.times else 0.0

    def img_per_s(self, batch_size: int) -> float:
        return batch_size / self.mean if self.mean else 0.0


def annotate(name: str):
    """Named region for profile traces."""
    return jax.profiler.TraceAnnotation(name)
