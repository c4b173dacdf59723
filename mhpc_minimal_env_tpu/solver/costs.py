"""Quadratic tracking costs (CostBase + MHPCCost weight tables).

Running cost (CostBase.cpp:12-15, note NO 1/2 factor):
    l = [(x-xr)^T Q (x-xr) + (u-ur)^T R (u-ur) + (y-yr)^T S (y-yr)] * dt
Terminal cost (CostBase.cpp:45-46, WITH 1/2):
    Phi = 0.5 (x-xr)^T Qf (x-xr)

All weights are diagonal; tables indexed by mode-1 follow
Controller/MHPCLocomotion/MHPCCost.cpp:24-75.
"""
from __future__ import annotations

import numpy as np

from ..ops import linalg as LA

PI = np.pi

# ---------------------------------------------------------------- WB weights
_WB_Q_DIAG = 0.01 * np.array([0, 10, 5, 4, 4, 4, 4, 2, 1, 0.01, 6, 6, 6, 6])

_WB_QF_DIAG = 100.0 * np.array(
    [
        [0, 20, 8, 3, 3, 3, 3, 3, 2, 0.01, 5, 5, 0.01, 0.01],
        [0, 20, 8, 3, 3, 3, 3, 3, 2, 0.01, 5, 5, 5, 5],
        [0, 20, 8, 3, 3, 3, 3, 3, 2, 0.01, 0.01, 0.01, 5, 5],
        [0, 20, 8, 3, 3, 3, 3, 3, 2, 0.01, 5, 5, 5, 5],
    ]
)

_WB_R_DIAG = 0.5 * np.array(
    [[5, 5, 1, 1], [1, 1, 1, 1], [1, 1, 5, 5], [1, 1, 1, 1]], dtype=float
)

_WB_S_DIAG = np.array(
    [
        [0, 0, 0.3, 0.3],   # mode 1 (back stance): weight hind-foot GRF
        [0, 0, 0, 0],
        [0.15, 0.15, 0, 0],  # mode 3 (front stance): weight front-foot GRF
        [0, 0, 0, 0],
    ]
)

# ---------------------------------------------------------------- FB weights
_FB_Q_DIAG = 0.01 * np.array([0, 10, 5, 2, 1, 0.01])
_FB_QF_DIAG = 100.0 * np.array([1, 20, 8, 3, 1, 0.01])
_FB_R_DIAG = np.array(
    [[0, 0, 0.01, 0.01], [0, 0, 0, 0], [0.01, 0.01, 0, 0], [0, 0, 0, 0]]
)
_FB_S_DIAG = np.zeros(4)


def weights(model: str, mode: int):
    """(q, r, s, qf) diagonal weight vectors for a phase."""
    i = mode - 1
    if model == "wb":
        return _WB_Q_DIAG, _WB_R_DIAG[i], _WB_S_DIAG[i], _WB_QF_DIAG[i]
    return _FB_Q_DIAG, _FB_R_DIAG[i], _FB_S_DIAG, _FB_QF_DIAG


def running_cost(x, u, y, ref_x, ref_u, ref_y, q, r, s, dt):
    dx, du_, dy = x - ref_x, u - ref_u, y - ref_y
    return (LA.vdot(dx, q * dx) + LA.vdot(du_, r * du_) + LA.vdot(dy, s * dy)) * dt


def running_cost_grads(x, u, y, ref_x, ref_u, ref_y, q, r, s, dt):
    """(lx, lu, ly); the Hessians are the constant diagonals 2*dt*{q,r,s}."""
    return (
        2.0 * dt * q * (x - ref_x),
        2.0 * dt * r * (u - ref_u),
        2.0 * dt * s * (y - ref_y),
    )


def terminal_cost(x, ref_x, qf):
    dx = x - ref_x
    return 0.5 * LA.vdot(dx, qf * dx)


def terminal_cost_grads(x, ref_x, qf):
    """(Phix,); Phixx is the constant diagonal qf."""
    return qf * (x - ref_x)
