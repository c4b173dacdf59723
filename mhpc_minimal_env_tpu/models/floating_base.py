"""Planar single-rigid-body (floating-base) model.

State x = (px, pz, theta, vx, vz, omega) (6,), control u = (Fx_F, Fz_F, Fx_H,
Fz_H) ground-reaction forces (4,).  Mirrors the generated FBDynamics kernel
(/root/reference/CasadiGen/source/FBDynamics.c:52-105) and its analytic
partials (FBDynamics_par.c), with contact gating per mode
(Dynamics/source/PlanarFloatingBase.cpp:9-23):

    mode 1 (back stance):  contact = (0, 1)
    mode 2 (flight):       contact = (0, 0)
    mode 3 (front stance): contact = (1, 0)
    mode 4 (flight):       contact = (0, 0)

Constants from the kernel source: m = 8.252 kg, Iyy = 0.2321654976, g = 9.81.
Moment convention: tau = (rz * Fx - rx * Fz) / Iyy with r = foothold - com.
"""
from __future__ import annotations

import jax.numpy as jnp

MASS = 8.252
IYY = 0.2321654976
GRAVITY = 9.81

# contact state per mode (index mode-1)
CONTACT_TABLE = jnp.array([[0.0, 1.0], [0.0, 0.0], [1.0, 0.0], [0.0, 0.0]])


def fb_continuous_dynamics(x, u, foothold, contact):
    """xdot (6,) of the SRB model.

    foothold = (p_Fx, p_Fz, p_Hx, p_Hz); contact = (c_F, c_H) in {0,1}.
    """
    vx, vz, om = x[3], x[4], x[5]
    cF, cH = contact[0], contact[1]
    fx = (cF * u[0] + cH * u[2]) / MASS
    fz = (cF * u[1] + cH * u[3]) / MASS - GRAVITY
    tau = (
        cF * ((foothold[1] - x[1]) * u[0] - (foothold[0] - x[0]) * u[1])
        + cH * ((foothold[3] - x[1]) * u[2] - (foothold[2] - x[0]) * u[3])
    ) / IYY
    return jnp.stack([vx, vz, om, fx, fz, tau])


def fb_step(x, u, foothold, mode, dt):
    """Euler-discretized step (PlanarFloatingBase.cpp:31): x+ = x + xdot*dt."""
    contact = CONTACT_TABLE[mode - 1]
    xdot = fb_continuous_dynamics(x, u, foothold, contact)
    return x + xdot * dt
