"""Path/terminal constraints and the Relaxed-Barrier (ReB) machinery.

All of the reference's path constraints are LINEAR in (x, u, y)
(MHPCConstraints.cpp:126-176), so each phase's constraint set is encoded as
constant matrices:  g = Cx x + Cu u + Cy y + b  >= 0.
The ReB penalty (SinglePhase.cpp:298-317, k=2 relaxation) then has exact
gradient/Hessian expressions with rank-structured Hessians
C^T diag(w) C (SinglePhase.cpp:219-249).

WB per-mode counts (MHPCConstraints.cpp:16-30): torque limits (8) + joint
limits (8) always; stance modes add 3 GRF constraints (unilateral + friction
cone, mu = 0.5).  Flight modes (2, 4) carry 1 terminal touchdown constraint.
FB phases are constraint-free (MHPCConstraints.cpp:5-11).
"""
from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax.numpy as jnp

PI = np.pi
TORQUE_LIMIT = 33.0
FRICTION_COEFF = 0.5


class LinearConstraints(NamedTuple):
    """g = Cx x + Cu u + Cy y + b >= 0 (all rows)."""

    Cx: np.ndarray
    Cu: np.ndarray
    Cy: np.ndarray
    b: np.ndarray


def wb_path_constraints(mode: int) -> LinearConstraints:
    nu, nx, ny = 4, 14, 4
    rows = []
    # torque limits: [-I; I] u + 33 >= 0  (MHPCConstraints.cpp:47-49,126-135)
    C_tor = np.vstack([-np.eye(nu), np.eye(nu)])
    b_tor = np.full(8, TORQUE_LIMIT)
    # joint limits on q[3:7]: [-I; I] qj + b >= 0 (MHPCConstraints.cpp:51-54)
    b_joint = np.array(
        [PI / 4, -0.1, 1.15 * PI, -0.1, PI, PI - 0.2, 0.1, PI - 0.2]
    )
    C_jnt = np.vstack([-np.eye(nu), np.eye(nu)])

    n = 16 + (3 if mode in (1, 3) else 0)
    Cx = np.zeros((n, nx))
    Cu = np.zeros((n, nu))
    Cy = np.zeros((n, ny))
    b = np.zeros(n)
    Cu[0:8] = C_tor
    b[0:8] = b_tor
    Cx[8:16, 3:7] = C_jnt
    b[8:16] = b_joint
    if mode == 1:  # back stance: hind GRF = y[2:4] (MHPCConstraints.cpp:145-150)
        Cy[16] = [0, 0, 0, 1]
        Cy[17] = [0, 0, -1, FRICTION_COEFF]
        Cy[18] = [0, 0, 1, FRICTION_COEFF]
    elif mode == 3:  # front stance: front GRF = y[0:2] (:151-156)
        Cy[16] = [0, 1, 0, 0]
        Cy[17] = [-1, FRICTION_COEFF, 0, 0]
        Cy[18] = [1, FRICTION_COEFF, 0, 0]
    return LinearConstraints(Cx, Cu, Cy, b)


def wb_num_tconstr(mode: int) -> int:
    return 1 if mode in (2, 4) else 0


def initial_al_reb(model: str, mode: int):
    """Initial AL/ReB parameters (MHPCConstraints.cpp:59-88).

    Returns dict of numpy arrays; eps_ReB is 0.01 for torque & GRF rows and
    0 for joint-limit rows (joint limits are present but weightless).
    """
    if model == "fb":
        return dict(
            sigma=np.float64(0.0),
            lam=np.zeros(0),
            delta=np.zeros(0),
            delta_min=np.zeros(0),
            eps_reb=np.zeros(0),
        )
    n_pc = 19 if mode in (1, 3) else 16
    eps = np.concatenate(
        [0.01 * np.ones(8), np.zeros(8), 0.01 * np.ones(n_pc - 16)]
    )
    return dict(
        sigma=np.float64(5.0 if mode in (2, 4) else 0.0),
        lam=np.zeros(wb_num_tconstr(mode)),
        delta=0.1 * np.ones(n_pc),
        delta_min=0.01 * np.ones(n_pc),
        eps_reb=eps,
    )


def reduced_barrier(g, delta):
    """Element-wise relaxed log barrier, order k=2 (SinglePhase.cpp:298-317).

    Returns (B, Bz, Bzz)."""
    safe_g = jnp.where(g > delta, g, 1.0)  # avoid log/div on relaxed branch
    B_log = -jnp.log(safe_g)
    Bz_log = -1.0 / safe_g
    Bzz_log = safe_g**-2
    z = (g - 2.0 * delta) / delta
    B_rel = 0.5 * (z * z - 1.0) - jnp.log(delta)
    Bz_rel = z / delta
    Bzz_rel = jnp.ones_like(g)  # ((g-2d)/d)^(k-2) with k=2
    on_log = g > delta
    return (
        jnp.where(on_log, B_log, B_rel),
        jnp.where(on_log, Bz_log, Bz_rel),
        jnp.where(on_log, Bzz_log, Bzz_rel),
    )
