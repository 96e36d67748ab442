"""Profiling helpers: jax.profiler traces + step timing.

The reference has no tracing/profiling (SURVEY.md §5); the TPU build adds
Perfetto-compatible device traces and a lightweight step timer for the
trainer's step_time_s scalar.
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture a device trace viewable in Perfetto / TensorBoard profile."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """EMA step timer; `with timer: ...` around each device step."""

    def __init__(self, ema: float = 0.9):
        self.ema = ema
        self.value: Optional[float] = None
        self._t0 = 0.0

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        dt = time.perf_counter() - self._t0
        self.value = dt if self.value is None else \
            self.ema * self.value + (1 - self.ema) * dt
        return False


def annotate(name: str):
    """Named region that shows up in device traces."""
    return jax.profiler.TraceAnnotation(name)
