"""Step timing, throughput counters, and profiler capture.

The reference's only tracing is hand-rolled ``time.time()`` deltas
(`/root/reference/unetr_segmentation_3d.py:218,227`; SURVEY.md §5). The
rebuild keeps that (StepTimer) and adds patches/sec / volumes/sec counters —
the BASELINE.json metrics — plus ``jax.profiler`` trace capture for real
XLA-level profiling on TPU.
"""

from __future__ import annotations

import contextlib
import time

import numpy as np


class StepTimer:
    """Accumulates wall-clock per step; mirrors the reference's running_time."""

    def __init__(self) -> None:
        self.times: list[float] = []
        self._t0: float | None = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.times.append(time.perf_counter() - self._t0)
        self._t0 = None

    @property
    def total(self) -> float:
        return float(np.sum(self.times)) if self.times else 0.0

    @property
    def mean(self) -> float:
        return float(np.mean(self.times)) if self.times else 0.0

    def percentile(self, q: float) -> float:
        return float(np.percentile(self.times, q)) if self.times else 0.0


class Throughput:
    """items/sec over a sliding window (patches/sec, volumes/sec)."""

    def __init__(self, window: int = 50) -> None:
        self.window = window
        self._stamps: list[tuple[float, int]] = []

    def update(self, n_items: int) -> None:
        self._stamps.append((time.perf_counter(), n_items))
        if len(self._stamps) > self.window:
            self._stamps.pop(0)

    @property
    def rate(self) -> float:
        if len(self._stamps) < 2:
            return 0.0
        dt = self._stamps[-1][0] - self._stamps[0][0]
        items = sum(n for _, n in self._stamps[1:])
        return items / dt if dt > 0 else 0.0


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace (view with TensorBoard / xprof)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
