"""Small math helpers (reference: Common/header/MathUtilities.h).

The reference ships two utilities: `square` (MathUtilities.h:15) and the
tolerance matrix comparison `almostEqual` (MathUtilities.h:23) — its only
"test assertion" helper.  Here they are JAX-native: `almost_equal` is
jittable and returns a traced bool so it can gate `lax.cond` inside
compiled solvers as well as serve as a test assertion.
"""
from __future__ import annotations

import jax.numpy as jnp


def square(a):
    """a**2 (MathUtilities.h:15)."""
    return a * a


def almost_equal(a, b, tol) -> jnp.ndarray:
    """True if |a - b| < tol elementwise (MathUtilities.h:23-43).

    Unlike the reference's early-exit double loop this is a single fused
    reduction — the idiomatic XLA form of the same predicate.
    """
    a = jnp.asarray(a)
    b = jnp.asarray(b)
    return jnp.all(jnp.abs(a - b) < tol)


def interpolate_linear(t, ts, ys):
    """Piecewise-linear interpolation of a sampled trajectory.

    ys: (N, ...) samples at sorted times ts: (N,).  Utility for evaluating
    plans between gridpoints (the reference itself executes
    zero-order-hold plans only — MHPCLocomotion.cpp:178-194 copies raw
    gridpoint controls — so nothing in the production solve path calls
    this; it exists for user execution layers that run faster than the
    plan rate).
    """
    idx = jnp.clip(jnp.searchsorted(ts, t, side="right") - 1, 0, ts.shape[0] - 2)
    t0, t1 = ts[idx], ts[idx + 1]
    w = jnp.clip((t - t0) / jnp.maximum(t1 - t0, 1e-12), 0.0, 1.0)
    return ys[idx] * (1.0 - w) + ys[idx + 1] * w
