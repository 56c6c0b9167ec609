"""Profiling hooks (SURVEY.md §5: the reference's only tracing is ad-hoc
Instant timers + a committed samply capture; here: jax.profiler traces)."""

from __future__ import annotations

import contextlib
import time


@contextlib.contextmanager
def trace(trace_dir: str | None):
    """jax.profiler trace context; no-op when trace_dir is None."""
    if trace_dir is None:
        yield
        return
    import jax

    with jax.profiler.trace(trace_dir):
        yield


class PhaseTimer:
    """Wall-clock phase timing accumulated into a dict (device-synced)."""

    def __init__(self):
        self.timings: dict[str, float] = {}

    @contextlib.contextmanager
    def phase(self, name: str, sync=None):
        t0 = time.perf_counter()
        yield
        if sync is not None:
            sync.block_until_ready()
        self.timings[name] = self.timings.get(name, 0.0) + time.perf_counter() - t0
