"""Profiling/tracing helpers (SURVEY.md §5: the reference has none; progress
visibility was tqdm/streamlit baked into the library — here tracing is an
explicit, optional layer around the jitted programs)."""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace capturing XLA/TPU timelines (view in TensorBoard
    or Perfetto)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region inside a traced program (shows up in the profile)."""
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Lightweight wall-clock step timing with EMA smoothing; prints/records
    steps/sec without touching device buffers (call after block_until_ready
    or let dispatch overlap)."""

    def __init__(self, smoothing: float = 0.9):
        self.smoothing = smoothing
        self._last: Optional[float] = None
        self.ema_step_s: Optional[float] = None

    def tick(self) -> Optional[float]:
        now = time.perf_counter()
        if self._last is not None:
            dt = now - self._last
            self.ema_step_s = (
                dt if self.ema_step_s is None
                else self.smoothing * self.ema_step_s + (1 - self.smoothing) * dt
            )
        self._last = now
        return self.ema_step_s

    def stats(self) -> Dict[str, float]:
        if self.ema_step_s is None:
            return {}
        return {"step_seconds": self.ema_step_s, "steps_per_sec": 1.0 / self.ema_step_s}
