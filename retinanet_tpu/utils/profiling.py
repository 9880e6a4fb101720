"""Tracing / profiling (SURVEY §5: the reference has **none** — this is a
gap to fill, not parity to match).

Two layers:
  * ``trace(logdir)``: context manager around ``jax.profiler`` emitting a
    TensorBoard-profile trace of device execution (XLA ops, fusion, HBM).
  * ``StepTimer``: lightweight wall-clock step timing with p50/p99 and
    images/sec, written through the JSONL metrics writer.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional

import numpy as np


@contextlib.contextmanager
def trace(logdir: str):
    """jax.profiler trace context (view with TensorBoard's profile plugin
    or xprof)."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str):
    """Named region visible in profiler timelines."""
    import jax

    with jax.profiler.TraceAnnotation(name):
        yield


class StepTimer:
    """Rolling step-time statistics."""

    def __init__(self, window: int = 100):
        self._times = []
        self._window = window
        self._last: Optional[float] = None

    def tick(self) -> Optional[float]:
        now = time.perf_counter()
        dt = None
        if self._last is not None:
            dt = now - self._last
            self._times.append(dt)
            if len(self._times) > self._window:
                self._times.pop(0)
        self._last = now
        return dt

    def stats(self, batch_size: int = 1) -> Dict[str, float]:
        if not self._times:
            return {}
        t = np.asarray(self._times)
        return {
            "step_time_p50_ms": float(np.percentile(t, 50)) * 1e3,
            "step_time_p99_ms": float(np.percentile(t, 99)) * 1e3,
            "images_per_sec": batch_size / float(np.mean(t)),
        }
