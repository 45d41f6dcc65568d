"""Profiling / tracing hooks.

Replaces the reference's clock() prints (LK stage src/feature.cpp:135-141,
PnP stage src/main.cpp:180-183, frame time :209-213) with jax.profiler
integration: named trace annotations per stage and an xprof-compatible trace
dump for offline analysis.
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax


@contextlib.contextmanager
def stage(name: str):
    """Annotate a pipeline stage; shows up in xprof/perfetto traces."""
    with jax.profiler.TraceAnnotation(name):
        yield


@contextlib.contextmanager
def trace_to(logdir: str):
    """Capture a device trace for the enclosed region (view with xprof)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StageTimer:
    """Host-side wall timers printing the reference's per-stage lines
    (ms per stage + FPS) for interactive parity."""

    def __init__(self):
        self._t = {}
        self._acc = {}

    @contextlib.contextmanager
    def __call__(self, name: str):
        t0 = time.perf_counter()
        yield
        dt = (time.perf_counter() - t0) * 1000.0
        self._acc[name] = self._acc.get(name, 0.0) + dt
        self._t[name] = dt

    def last_ms(self, name: str) -> float:
        return self._t.get(name, 0.0)

    def report(self) -> dict:
        return dict(self._t)
