"""Performance statistics + tracing helpers.

Equivalent of the reference's wall-clock counters (`PerformanceStatistics`
engine/mod.rs:192, scene/mod.rs:300; `PhysicsPerformanceStatistics`
physics/mod.rs:199) and its GPU debug scopes (server.begin_scope). Device
work is profiled through jax.profiler traces; named_scope tags kernels so
the trace viewer shows engine phases by name.
"""
from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict

import jax

__all__ = ["PerformanceStatistics", "scope", "trace_to"]


class PerformanceStatistics:
    """Accumulates wall-clock timings per phase across frames."""

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def measure(self, name: str, block_on=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if block_on is not None:
                jax.block_until_ready(block_on)
            dt = time.perf_counter() - t0
            self.totals[name] += dt
            self.counts[name] += 1

    def mean_ms(self, name: str) -> float:
        c = self.counts.get(name, 0)
        return (self.totals[name] / c * 1e3) if c else 0.0

    def report(self) -> str:
        lines = [f"{k}: {self.mean_ms(k):.2f} ms avg over {self.counts[k]}"
                 for k in sorted(self.totals)]
        return "\n".join(lines)

    def reset(self):
        self.totals.clear()
        self.counts.clear()


def scope(name: str):
    """Named trace scope for device work (shows up in jax.profiler traces,
    the analogue of the reference's server.begin_scope GPU debug groups)."""
    return jax.named_scope(name)


@contextlib.contextmanager
def trace_to(log_dir: str):
    """Capture a jax.profiler trace around a block (view with
    tensorboard/xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
