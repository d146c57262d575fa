"""Profiling: JAX profiler traces + wall-clock step timing.

The reference's only tracing was a wall-clock printf macro
(``BP_GPU.h:8-16``); here the real tool is the XLA profiler — traces open
in TensorBoard/Perfetto and show per-op device time, HBM traffic and
fusion boundaries.
"""

from __future__ import annotations

import contextlib
import time


@contextlib.contextmanager
def profile_trace(log_dir: str):
    """Capture a JAX profiler trace around a code block."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Rolling wall-clock timer with summary stats for step loops."""

    def __init__(self):
        self.times: list[float] = []
        self._t0: float | None = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.times.append(time.perf_counter() - self._t0)
        self._t0 = None

    def summary(self) -> dict:
        if not self.times:
            return {"count": 0}
        ts = sorted(self.times)
        n = len(ts)
        return {
            "count": n,
            "mean_ms": 1e3 * sum(ts) / n,
            "p50_ms": 1e3 * ts[n // 2],
            "min_ms": 1e3 * ts[0],
            "max_ms": 1e3 * ts[-1],
        }
