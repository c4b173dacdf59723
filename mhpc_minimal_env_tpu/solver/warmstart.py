"""Bounding PD warm-start controller (Controller/Heuristics/boundingPDControl.cpp).

Stance phases: virtual leg-spring force mapped through the foot Jacobian's
joint columns; flight phases: joint-space PD to a nominal pose.  Rolled out
through the true WB dynamics to produce the initial nominal trajectory.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..models import kinematics as K
from ..models import quadruped as Q
from ..ops import linalg as LA

_QJOINT_NOM = jnp.array([jnp.pi / 4, -jnp.pi * 7 / 12, jnp.pi / 4, -jnp.pi * 7 / 12])
_LEGEXT_NOM = 0.2462
_KSPRING = 2200.0
_KP = 5.0 * jnp.array([8.0, 1.0, 12.0, 10.0])
_KD = jnp.ones(4)
_STANCE_GAIN = {1: 3.0, 3: 2.2}  # hind-stance x3, front-stance x2.2


def _pd_control(x, mode: int):
    q, qd = x[:7], x[7:]
    if mode in (2, 4):  # flight: joint PD (boundingPDControl.cpp:40)
        kp = _KP.astype(x.dtype)
        kd = _KD.astype(x.dtype)
        return kp * (_QJOINT_NOM.astype(x.dtype) - q[3:7]) - kd * qd[3:7]
    leg = 1 if mode == 1 else 0  # mode 1 -> hind leg, mode 3 -> front leg
    foot_fn = K.hind_foot_position if leg == 1 else K.front_foot_position
    J = jax.jacfwd(foot_fn)(q)
    ext = K.leg_extension(q, leg)
    norm = jnp.linalg.norm(ext)
    F = -ext / norm * _KSPRING * (norm - _LEGEXT_NOM)
    # J.bottomRightCorner(2,4) = joint columns (boundingPDControl.cpp:30,36)
    return LA.mv(J[:, 3:7].T, F) * _STANCE_GAIN[mode]


def pd_control_masked(x, cf, ch, stance_gain):
    """Mode-unified bounding PD law: contact gates (cf, ch) pick the
    stance leg-spring term, `stance_gain` carries the per-mode gain
    (3.0 back-stance / 2.2 front-stance, _STANCE_GAIN), zero gates give
    the flight joint-PD bit-for-bit (the masked terms multiply by exact
    0.0/1.0).  Used by the fused engine's warm-start rollout so all WB
    modes share one compiled graph."""
    q, qd = x[:7], x[7:]
    kp = _KP.astype(x.dtype)
    kd = _KD.astype(x.dtype)
    u_flight = kp * (_QJOINT_NOM.astype(x.dtype) - q[3:7]) - kd * qd[3:7]

    def leg_term(foot_fn, leg):
        J = jax.jacfwd(foot_fn)(q)
        ext = K.leg_extension(q, leg)
        norm = jnp.linalg.norm(ext)
        F = -ext / norm * _KSPRING * (norm - _LEGEXT_NOM)
        return LA.mv(J[:, 3:7].T, F)

    u_stance = (cf * leg_term(K.front_foot_position, 0)
                + ch * leg_term(K.hind_foot_position, 1))
    st = cf + ch
    return (1.0 - st) * u_flight + stance_gain * u_stance


def rollout_pd_phase(x0, mode: int, n_steps: int, dt: float):
    """Simulate the PD controller for one phase; (xs (N,14), us (N,4)).

    Matches bounding_PDcontrol: controls computed for k < N-1; the terminal
    control row stays zero."""

    def step(x, _):
        u = _pd_control(x, mode)
        x_next, y = Q.wb_step(x, u, mode, dt)
        return x_next, (x, u, y)

    x_last, (xs, us, ys) = jax.lax.scan(step, x0, None, length=n_steps - 1)
    xs = jnp.concatenate([xs, x_last[None]], axis=0)
    us = jnp.concatenate([us, jnp.zeros((1, 4), dtype=us.dtype)], axis=0)
    ys = jnp.concatenate([ys, jnp.zeros((1, 4), dtype=ys.dtype)], axis=0)
    return xs, us, ys
