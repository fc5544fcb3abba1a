"""Profiling hooks: jax.profiler traces + per-step wall timing.

The reference has no tracing at all (SURVEY.md §5); this provides the
TPU-native story: a context manager around hot regions producing a
TensorBoard-compatible trace, and a fetch-forced step timer (on tunneled
TPU backends ``block_until_ready`` can return before remote execution
finishes — only a D2H fetch is trustworthy, see bench.py).
"""

from __future__ import annotations

import contextlib
import time
from pathlib import Path


@contextlib.contextmanager
def profile_trace(log_dir: str | Path, enabled: bool = True):
    """jax.profiler trace context; view with TensorBoard or xprof."""
    import jax

    if not enabled:
        yield
        return
    Path(log_dir).mkdir(parents=True, exist_ok=True)
    jax.profiler.start_trace(str(log_dir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Wall-clock step timing with forced D2H sync on a probe array."""

    def __init__(self):
        self.times: list[float] = []
        self._t0: float | None = None

    def start(self) -> None:
        self._t0 = time.perf_counter()

    def stop(self, probe=None) -> float:
        if probe is not None:
            import numpy as np

            np.asarray(probe).ravel()[:1]  # D2H fetch forces execution
        dt = time.perf_counter() - (self._t0 or time.perf_counter())
        self.times.append(dt)
        return dt

    @property
    def mean(self) -> float:
        return sum(self.times) / len(self.times) if self.times else 0.0
