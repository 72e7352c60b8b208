"""Profiling helpers: step timers and JAX trace capture.

The reference only wall-clocks around fit/evaluate
(lib/graph_model.py:110-125, utils.py:313-316); here we add a proper step
timer plus ``jax.profiler`` trace capture for per-kernel inspection.
"""

from __future__ import annotations

import contextlib
import time

import jax

__all__ = ["StepTimer", "trace"]


class StepTimer:
    """Wall-clock timer that syncs the device before each reading so queued
    async work is attributed to the step that launched it."""

    def __init__(self):
        self.times: list[float] = []
        self._t0 = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self, result=None):
        if result is not None:
            jax.block_until_ready(result)
        self.times.append(time.perf_counter() - self._t0)

    @property
    def mean_ms(self) -> float:
        return 1000.0 * sum(self.times) / max(len(self.times), 1)

    @property
    def min_ms(self) -> float:
        return 1000.0 * min(self.times) if self.times else 0.0


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace viewable in TensorBoard/Perfetto."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
