"""Profiling and tracing hooks (SURVEY.md §5: the reference has only a
`timeit` print helper, models/pointnet2_utils.py:8-10, and commented-out
cudaEvent brackets; here profiling is a first-class utility).

- `timeit`: decorator/context printing wall time of a block (host side).
- `trace(logdir)`: context manager around `jax.profiler` — produces a
  TensorBoard-viewable XPlane trace of device execution.
- `StepTimer`: steady-state step timing with warmup discard, used by the
  train loop under --profile and by bench.py-style scripts.
- `annotate(name)`: jax.profiler.TraceAnnotation passthrough for labeling
  regions inside a step.
"""

from __future__ import annotations

import contextlib
import functools
import time


def timeit(fn=None, *, label: str | None = None):
    """Decorator: print the wall time of each call."""

    def wrap(f):
        @functools.wraps(f)
        def inner(*a, **k):
            t0 = time.perf_counter()
            out = f(*a, **k)
            print(f"[timeit] {label or f.__name__}: {time.perf_counter()-t0:.4f}s")
            return out

        return inner

    return wrap(fn) if fn is not None else wrap


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a device trace viewable in TensorBoard's profile tab."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Label a region inside a traced step (shows up in the profiler)."""
    import jax

    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Steady-state step timing: discards `warmup` steps, tracks mean/p50."""

    def __init__(self, warmup: int = 2):
        self.warmup = warmup
        self.times: list[float] = []
        self._t0 = None
        self._seen = 0

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        dt = time.perf_counter() - self._t0
        self._seen += 1
        if self._seen > self.warmup:
            self.times.append(dt)
        return False

    @property
    def mean(self) -> float:
        return sum(self.times) / len(self.times) if self.times else float("nan")

    @property
    def p50(self) -> float:
        if not self.times:
            return float("nan")
        s = sorted(self.times)
        return s[len(s) // 2]

    def summary(self, unit_per_step: float = 1.0, unit: str = "items"):
        if not self.times:
            return "no steady-state steps recorded"
        return (
            f"mean {self.mean*1e3:.2f} ms/step, p50 {self.p50*1e3:.2f} ms/step, "
            f"{unit_per_step/self.mean:,.0f} {unit}/s"
        )
