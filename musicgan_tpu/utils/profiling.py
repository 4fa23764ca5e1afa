"""Tracing / profiling and debug-mode hooks.

The reference has no tracing, profiling, or sanitizer support at all
(SURVEY.md §5).  Here:

* :func:`trace` — context manager around ``jax.profiler`` writing a
  Perfetto/TensorBoard-compatible trace directory;
* :func:`step_timer` — lightweight wall-clock step timing with percentile
  summary (works through the async dispatch: time-to-dispatch plus a
  periodic hard sync);
* :func:`enable_debug_mode` — turns on NaN debugging (``jax_debug_nans``)
  so a non-finite value inside a jitted step raises at the offending
  primitive instead of corrupting training silently.
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator

import jax

__all__ = ["trace", "step_timer", "enable_debug_mode", "StepTimer"]


@contextlib.contextmanager
def trace(logdir: str) -> Iterator[None]:
    """Capture a device trace: ``with trace("/tmp/trace"): step(...)``."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def enable_debug_mode(nans: bool = True, disable_jit: bool = False) -> None:
    if nans:
        jax.config.update("jax_debug_nans", True)
    if disable_jit:
        jax.config.update("jax_disable_jit", True)


class StepTimer:
    """Rolling step timer; ``sync_every`` forces a device sync so the
    measured time is real execution, not just dispatch."""

    def __init__(self, sync_every: int = 50):
        self.sync_every = sync_every
        self.times: list[float] = []
        self._last = time.perf_counter()
        self._count = 0

    def tick(self, sync_value=None) -> float:
        self._count += 1
        if sync_value is not None and self._count % self.sync_every == 0:
            jax.block_until_ready(sync_value)
        now = time.perf_counter()
        dt = now - self._last
        self._last = now
        self.times.append(dt)
        return dt

    def summary(self) -> dict:
        if not self.times:
            return {}
        xs = sorted(self.times)
        n = len(xs)
        return {
            "steps": n,
            "mean_ms": 1000 * sum(xs) / n,
            "p50_ms": 1000 * xs[n // 2],
            "p90_ms": 1000 * xs[int(n * 0.9)],
        }


def step_timer(sync_every: int = 50) -> StepTimer:
    return StepTimer(sync_every)
