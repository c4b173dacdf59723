"""Staged batch engine vs vmap of the per-scenario solver (fused_hsddp):
both must produce the same solves — the staged engine is the same masked
program with the batch axis made explicit (channel-last) and the loop
driver hoisted to the host.  (This hop formerly pinned the retired
batch-native mirror `fused_hsddp_batched`; the staged engine is now pinned
directly — VERDICT r4 item 4.)

Also checks f32 solution quality on the production (staged, channel-last)
engine against the f64 solve.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mhpc_minimal_env_tpu.runtime.locomotion import X0_DEFAULT
from mhpc_minimal_env_tpu.solver.fused_hsddp import build_fused_solver
from mhpc_minimal_env_tpu.solver.staged import build_staged_solver
from mhpc_minimal_env_tpu.types import HSDDPOptions, PhaseSpec

pytestmark = pytest.mark.slow  # full-size solves / multi-process: run with --runslow

SPECS = [
    PhaseSpec(model="wb", mode=1, n_steps=8, dt=1e-3),
    PhaseSpec(model="wb", mode=2, n_steps=8, dt=1e-3),
    PhaseSpec(model="fb", mode=3, n_steps=8, dt=1e-3),
    PhaseSpec(model="fb", mode=4, n_steps=8, dt=1e-3),
]
OPT = HSDDPOptions(max_AL_iter=2, max_DDP_iter=2)
B = 8


def x0_batch(dtype):
    rng = np.random.default_rng(0)
    return jnp.asarray(
        X0_DEFAULT[None] + 0.005 * rng.normal(size=(B, 14)), dtype)


def test_staged_matches_vmap_f64():
    solve, _ = build_fused_solver(SPECS, OPT, 1.5, -0.404, 0.0, jnp.float64)
    solve_b, _ = build_staged_solver(
        SPECS, OPT, 1.5, -0.404, 0.0, jnp.float64)
    x0 = x0_batch(jnp.float64)
    ref = jax.jit(jax.vmap(solve))(x0)
    out = solve_b(x0)
    # staged stores (T, ..., B) channel-last; vmap stores (B, T, ...)
    cl = lambda a: np.moveaxis(np.asarray(a), -1, 0)
    np.testing.assert_array_equal(np.asarray(out.aborted),
                                  np.asarray(ref.aborted))
    np.testing.assert_allclose(out.cost, ref.cost, rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(out.viol, ref.viol, rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(cl(out.nominal.u), ref.nominal.u,
                               rtol=1e-9, atol=1e-8)
    np.testing.assert_allclose(cl(out.nominal.x), ref.nominal.x,
                               rtol=1e-9, atol=1e-8)
    np.testing.assert_allclose(cl(out.ctg.Kfb), ref.ctg.Kfb,
                               rtol=1e-7, atol=1e-7)


def test_staged_f32_solution_quality():
    """f32 production path (staged engine, channel-last, f64 accumulators):
    converges to finite cost in the vicinity of the f64 solve.  The f32
    control TRACE legitimately diverges pointwise (chaotic ~1e12x noise
    amplification through the iterate path — see PERF.md §5); solution
    QUALITY must hold."""
    B_p = 8
    solve_b, _ = build_staged_solver(
        SPECS, OPT, 1.5, -0.404, 0.0, jnp.float32, acc_dtype=jnp.float64)
    rng = np.random.default_rng(1)
    x0 = jnp.asarray(
        X0_DEFAULT[None] + 0.005 * rng.normal(size=(B_p, 14)), jnp.float32)
    out = solve_b(x0)
    assert out.cost.shape == (B_p,)
    assert bool(jnp.isfinite(out.cost).all())
    assert bool(jnp.isfinite(out.nominal.u).all())

    # f64 XLA solve on the same scenarios as a quality yardstick
    solve64, _ = build_fused_solver(SPECS, OPT, 1.5, -0.404, 0.0,
                                    jnp.float64)
    ref = jax.jit(jax.vmap(solve64))(x0.astype(jnp.float64))
    ok = ~np.asarray(out.aborted)
    assert ok.mean() > 0.9  # near-universal convergence
    cost_ratio = np.asarray(out.cost)[ok] / np.maximum(
        np.asarray(ref.cost)[ok], 1e-9)
    assert np.median(cost_ratio) < 1.1
