"""Profiling utilities (runtime/profiling.py — the working replacement for
the reference's link-broken TIME_BENCHMARK machinery)."""
import jax
import jax.numpy as jnp

from mhpc_minimal_env_tpu.runtime.profiling import StageTimer, time_jitted


def test_stage_timer_accumulates():
    t = StageTimer()
    x = jnp.arange(8.0)
    for _ in range(3):
        with t.stage("square", sync_on=x):
            x = x * x
    rep = t.report()
    assert rep["square"]["calls"] == 3
    assert rep["square"]["total_s"] >= 0.0
    assert rep["square"]["mean_ms"] >= 0.0


def test_time_jitted_returns_stats():
    f = jax.jit(lambda a: (a @ a).sum())
    stats = time_jitted(f, jnp.eye(16), reps=2, warmup=1)
    assert stats["reps"] == 2
    assert 0.0 <= stats["min_s"] <= stats["mean_s"] * 2 + 1e-9
