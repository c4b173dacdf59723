"""Pallas backward-sweep kernel vs the XLA fused backward.

Runs the kernel in interpreter mode on CPU (the kernel itself is
TPU-only compiled; numerics are identical) on a small multi-phase problem
and checks the full contract against vmap(fused.backward): gains, feedback
policies, value gradients, PSD gate, and expected-decrease accumulator.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mhpc_minimal_env_tpu.ops.riccati_pallas import (
    backward_batched_pallas, segment_plan_of,
)
from mhpc_minimal_env_tpu.solver.fused import (
    FusedCTG, initial_fused_alreb, make_fused_engine,
)
from mhpc_minimal_env_tpu.runtime.locomotion import X0_DEFAULT
from mhpc_minimal_env_tpu.types import HSDDPOptions, PhaseSpec

B = 128  # one lane tile


@pytest.fixture(scope="module")
def tiny_lin():
    """Linearization data from a real rollout of a tiny 4-phase problem.

    Generated in f64 (the f32 rollout of this unconverged random problem
    produces NaNs) and cast to f32: the comparison is pallas-vs-XLA on
    identical f32 inputs."""
    dtype = jnp.float64
    specs = [
        PhaseSpec(model="wb", mode=1, n_steps=6, dt=1e-3),
        PhaseSpec(model="wb", mode=2, n_steps=5, dt=1e-3),
        PhaseSpec(model="fb", mode=3, n_steps=6, dt=1e-3),
        PhaseSpec(model="fb", mode=4, n_steps=4, dt=1e-3),
    ]
    eng = make_fused_engine(specs, HSDDPOptions(), 1.5, -0.404, 0.0, dtype)
    plan = eng["plan"]
    T = eng["T"]
    alreb = initial_fused_alreb(specs, dtype)
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(
        X0_DEFAULT[None] + 0.01 * rng.normal(size=(B, 14)), dtype)
    ref_x = jax.vmap(lambda x: plan.ref_x.at[:, 0].add(x[0]))(x0)
    zero = jnp.zeros((), dtype)
    one = jnp.ones((), dtype)
    ctg0 = FusedCTG(du=jnp.zeros((T, 4), dtype),
                    Kfb=jnp.zeros((T, 4, 14), dtype),
                    G=jnp.zeros((T, 14), dtype))
    tr = jax.vmap(
        lambda x, r: eng["rollout"](x, jnp.zeros((T, 14), dtype),
                                    jnp.zeros((T, 4), dtype), ctg0, zero, r,
                                    alreb, zero, one)
    )(x0, ref_x)
    # include_al_grad=0: the AL terminal Hessian of this unconverged random
    # problem overflows f32 (that regime is f64-only); the kernel parity
    # check needs f32-representable data.
    lin = jax.vmap(
        lambda t, r: eng["linearize"](t, r, alreb, zero, zero)
    )(tr, ref_x)
    lin32 = jax.tree.map(lambda a: a.astype(jnp.float32), lin)
    # f32 engine: same specs, f32 plan constants — its `backward` is the
    # XLA reference implementation for the pallas comparison
    eng32 = make_fused_engine(specs, HSDDPOptions(), 1.5, -0.404, 0.0,
                              jnp.float32)
    return eng32, eng32["plan"], lin32


def test_backward_pallas_matches_xla(tiny_lin):
    eng, plan, lin = tiny_lin
    # this unconverged toy problem needs regularization for a PSD sweep
    # (in real solves the retry loop raises reg until the gate passes)
    reg = jnp.full((B,), 2.0, jnp.float32)
    ok_x, dV_x, ctg_x = jax.vmap(eng["backward"], in_axes=(0, 0))(lin, reg)
    ok_p, dV_p, ctg_p = backward_batched_pallas(
        segment_plan_of(plan), lin, reg, interpret=True)

    assert ok_p.shape == (B,)
    assert bool(np.asarray(ok_x).all()), "fixture must be PSD-healthy"
    np.testing.assert_array_equal(np.asarray(ok_p), np.asarray(ok_x))
    np.testing.assert_allclose(dV_p, dV_x, rtol=2e-4, atol=1e-6)
    scale_du = np.max(np.abs(np.asarray(ctg_x.du))) + 1e-9
    np.testing.assert_allclose(
        np.asarray(ctg_p.du), np.asarray(ctg_x.du),
        atol=2e-4 * scale_du,
    )
    scale_K = np.max(np.abs(np.asarray(ctg_x.Kfb))) + 1e-9
    np.testing.assert_allclose(
        np.asarray(ctg_p.Kfb), np.asarray(ctg_x.Kfb),
        atol=2e-4 * scale_K,
    )
    scale_G = np.max(np.abs(np.asarray(ctg_x.G))) + 1e-9
    np.testing.assert_allclose(
        np.asarray(ctg_p.G), np.asarray(ctg_x.G),
        atol=2e-4 * scale_G,
    )


def test_backward_pallas_with_regularization(tiny_lin):
    eng, plan, lin = tiny_lin
    # heterogeneous per-lane reg exercises the per-lane stream
    reg = jnp.asarray(
        np.random.default_rng(1).uniform(1.5, 4.0, size=(B,)), jnp.float32)
    ok_x, dV_x, ctg_x = jax.vmap(eng["backward"], in_axes=(0, 0))(lin, reg)
    ok_p, dV_p, ctg_p = backward_batched_pallas(
        segment_plan_of(plan), lin, reg, interpret=True)
    np.testing.assert_array_equal(np.asarray(ok_p), np.asarray(ok_x))
    scale = np.max(np.abs(np.asarray(ctg_x.du))) + 1e-9
    np.testing.assert_allclose(
        np.asarray(ctg_p.du), np.asarray(ctg_x.du), atol=2e-4 * scale)


def test_psd_gate_fires(tiny_lin):
    """Unregularized sweep of this problem is non-PSD somewhere: the gate
    must trip (reference LDLT isPositive, SinglePhase.cpp:202-209), and it
    must agree lane-by-lane with the XLA gate."""
    eng, plan, lin = tiny_lin
    reg = jnp.zeros((B,), jnp.float32)
    ok_x, _, _ = jax.vmap(eng["backward"], in_axes=(0, 0))(lin, reg)
    ok_p, _, _ = backward_batched_pallas(
        segment_plan_of(plan), lin, reg, interpret=True)
    assert not bool(np.asarray(ok_x).any())
    assert not bool(np.asarray(ok_p).any())

    # explicitly indefinite Quu also trips at high reg... (negative luu)
    bad = lin._replace(
        luu=lin.luu - 1e3 * jnp.eye(4, dtype=lin.luu.dtype)[None, None])
    ok_b, _, _ = backward_batched_pallas(
        segment_plan_of(plan), bad, jnp.full((B,), 2.0, jnp.float32),
        interpret=True)
    assert not bool(np.asarray(ok_b).any())
