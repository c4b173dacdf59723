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


def solve_timings(batch: int = 64, dtype=None, reps: int = 3,
                  problem=None):
    """Per-stage breakdown of one batched HSDDP solve on the current backend.

    Times the fused engine's three compiled subgraphs (rollout scan /
    vmapped linearization / backward Riccati scan) in isolation, vmapped
    over `batch` lanes, plus the full solve.  This is the working
    equivalent of the reference's per-iteration {partials, backward sweep,
    line search} TIME_BENCHMARK printout (MultiPhaseDDP.cpp:163-251).
    """
    import jax.numpy as jnp
    import numpy as np

    from ..solver.fused import FusedCTG, initial_fused_alreb, make_fused_engine
    from .locomotion import MHPCLocomotion, X0_DEFAULT, default_problem

    problem = problem or default_problem()
    dtype = dtype or jnp.float64
    eng = make_fused_engine(list(problem.specs), problem.opt,
                            problem.vel_cmd, problem.ground_height,
                            problem.height_cmd, dtype)
    plan, T = eng["plan"], eng["T"]
    alreb = initial_fused_alreb(list(problem.specs), dtype)
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(X0_DEFAULT[None] + 0.01 * rng.normal(size=(batch, 14)),
                     dtype=dtype)
    ref_x = jax.vmap(lambda x: plan.ref_x.at[:, 0].add(x[0]))(x0)
    ctg0 = FusedCTG(du=jnp.zeros((T, 4), dtype),
                    Kfb=jnp.zeros((T, 4, 14), dtype),
                    G=jnp.zeros((T, 14), dtype))
    zero = jnp.zeros((), dtype)
    one = jnp.ones((), dtype)

    roll = jax.jit(jax.vmap(
        lambda x, r: eng["rollout"](x, jnp.zeros((T, 14), dtype),
                                    jnp.zeros((T, 4), dtype), ctg0, zero, r,
                                    alreb, zero, one)))
    tr = roll(x0, ref_x)
    lin_fn = jax.jit(jax.vmap(
        lambda t, r: eng["linearize"](t, r, alreb, zero, one)))
    lin = lin_fn(tr, ref_x)
    bwd = jax.jit(jax.vmap(lambda l: eng["backward"](l, zero)))

    out = {
        "rollout": time_jitted(roll, x0, ref_x, reps=reps),
        "linearize": time_jitted(lin_fn, tr, ref_x, reps=reps),
        "backward": time_jitted(bwd, lin, reps=reps),
    }
    loco = MHPCLocomotion(problem, dtype=dtype)
    out["full_solve"] = time_jitted(loco.solve_batched, x0, reps=reps)
    out["batch"] = batch
    out["device"] = str(jax.devices()[0])
    return out
