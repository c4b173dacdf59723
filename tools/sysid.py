#!/usr/bin/env python3
"""System identification of the reference's whole-body dynamics.

The reference's continuous dynamics are CasADi-generated C with inertial
parameters baked into 116 kLoC of expressions.  Rigid-body dynamics are LINEAR
in the standard inertial parameters pi_link = (m, m*cx, m*cz, I_origin), so we
recover them exactly by linear least squares on the flight-dynamics kernel
probes (tests/golden/kernel_probes.npz):

    ID(q, qd, qdd; pi) = S^T u     with ID linear in pi  ->  Y(q,qd,qdd) pi = S^T u

Validates along the way:
  1. foot Jacobians vs Jacob_F / Jacob_B kernels (kinematic conventions)
  2. fitted params reproduce Dyn_FL xdot to ~1e-10
"""
import os
import sys

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")   # axon sitecustomize overrides env vars
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from mhpc_minimal_env_tpu.models import kinematics as K

G = 9.81
probes = np.load(os.path.join(os.path.dirname(__file__), "..", "tests", "golden", "kernel_probes.npz"))
X = probes["x"]          # (N,14)
U = probes["u"]          # (N,4)
N = X.shape[0]

# ---------------------------------------------------------------- step 1: jacobians
jacF = jax.vmap(K.front_foot_jacobian)(X[:, :7], X[:, 7:])
jacB = jax.vmap(K.hind_foot_jacobian)(X[:, :7], X[:, 7:])
for name, mine, key in [("Jacob_F", jacF, "jac_f"), ("Jacob_B", jacB, "jac_b")]:
    ref = probes[key]  # J(2x7) col-major, Jd(2x7) col-major
    refJ = ref[:, :14].reshape(N, 7, 2).transpose(0, 2, 1)
    refJd = ref[:, 14:].reshape(N, 7, 2).transpose(0, 2, 1)
    eJ = np.abs(np.asarray(mine[0]) - refJ).max()
    eJd = np.abs(np.asarray(mine[1]) - refJd).max()
    print(f"{name}: |J err|={eJ:.3e} |Jd err|={eJd:.3e}")

# ------------------------------------------------------- step 2: inertial param fit
# 5 links: body, F_hip, F_knee, H_hip, H_knee; pi = (m, m cx, m cz, I_o) each.
LINKS = [K.BODY, K.F_HIP, K.F_KNEE, K.H_HIP, K.H_KNEE]


def link_origin_angle(q):
    origins, angles = K.link_frames(q)
    return origins[:5], angles[:5]


def kinetic(q, qd, pi):
    """Total KE, linear in pi rows (m, mcx, mcz, Io)."""
    o_fn = lambda qq: link_origin_angle(qq)[0]
    a_fn = lambda qq: link_origin_angle(qq)[1]
    vo = jax.jacfwd(o_fn)(q) @ qd          # (5,2) origin velocities
    w = jax.jacfwd(a_fn)(q) @ qd           # (5,)  angular rates
    _, angles = link_origin_angle(q)
    ke = 0.0
    for i in range(5):
        m, mcx, mcz, Io = pi[i]
        c, s = jnp.cos(angles[i]), jnp.sin(angles[i])
        # d/dt [R(th) cvec] = w * dR/dth cvec ; dR/dth = [[-s, c], [-c, -s]]
        dRc = jnp.array([-s * mcx + c * mcz, -c * mcx - s * mcz])  # times m already
        ke = ke + 0.5 * m * vo[i] @ vo[i] + w[i] * (vo[i] @ dRc) + 0.5 * Io * w[i] ** 2
    return ke


def potential(q, pi):
    origins, angles = link_origin_angle(q)
    pe = 0.0
    for i in range(5):
        m, mcx, mcz, Io = pi[i]
        c, s = jnp.cos(angles[i]), jnp.sin(angles[i])
        zc = m * origins[i][1] + (-s * mcx + c * mcz)
        pe = pe + G * zc
    return pe


def inverse_dynamics(q, qd, qdd, pi):
    """M qdd + C qd + g  (generalized forces needed to realize qdd).

    d/dt(dKE/dqd) evaluated via a single jvp along (qd, qdd).
    """
    p_fn = lambda qq, qqd: jax.grad(kinetic, argnums=1)(qq, qqd, pi)
    dpdt = jax.jvp(p_fn, (q, qd), (qd, qdd))[1]
    dKEdq = jax.grad(kinetic, argnums=0)(q, qd, pi)
    dPEdq = jax.grad(potential, argnums=0)(q, pi)
    return dpdt - dKEdq + dPEdq


def regressor(q, qd, qdd):
    """Y with ID = Y @ theta; theta = [pi(20), rotor Ir(4), damping d(4)]."""
    f = lambda pflat: inverse_dynamics(q, qd, qdd, pflat.reshape(5, 4))
    Y_rb = jax.jacfwd(f)(jnp.zeros(20))                      # (7,20)
    # reflected rotor inertia: tau_j includes Ir_j * qdd_j (joint rows only)
    Y_rot = jnp.zeros((7, 4)).at[3:, :].set(jnp.diag(qdd[3:]))
    # viscous joint damping: d_j * qd_j
    Y_dmp = jnp.zeros((7, 4)).at[3:, :].set(jnp.diag(qd[3:]))
    return jnp.concatenate([Y_rb, Y_rot, Y_dmp], axis=1)     # (7,28)


# Flight dynamics probes: xdot = (qd, qdd); equation Y theta = S^T u
QDD = probes["dyn_fl"][:, 7:14]
Ys = jax.jit(jax.vmap(regressor))(X[:, :7], X[:, 7:], QDD)  # (N,7,28)
S_T_u = np.concatenate([np.zeros((N, 3)), U], axis=1)        # (N,7)

A = np.asarray(Ys).reshape(N * 7, 28)
b = S_T_u.reshape(N * 7)
theta, res, rank, sv = np.linalg.lstsq(A, b, rcond=None)
resid = A @ theta - b
print(f"\nlstsq rank={rank}/28, max residual={np.abs(resid).max():.3e}")
pi_hat = theta[:20]
print("rotor Ir:", theta[20:24])
print("damping d:", theta[24:28])
names = ["body", "F_hip", "F_knee", "H_hip", "H_knee"]
pi_mat = pi_hat.reshape(5, 4)
for i, nm in enumerate(names):
    m, mcx, mcz, Io = pi_mat[i]
    print(f"{nm:8s} m={m:.12f} mcx={mcx: .12e} mcz={mcz: .12e} Io={Io:.12e}")
print("total mass:", pi_mat[:, 0].sum())

# Derived: com offsets and inertia about CoM
for i, nm in enumerate(names):
    m, mcx, mcz, Io = pi_mat[i]
    cx, cz = mcx / m, mcz / m
    Icom = Io - (mcx**2 + mcz**2) / m
    print(f"{nm:8s} cx={cx: .10f} cz={cz: .10f} Icom={Icom:.12e}")

np.save("/tmp/pi_hat.npy", pi_mat)

# ------------------------------------------------------ step 3: forward validation
def forward_flight(x, u, pi):
    q, qd = x[:7], x[7:]
    p_fn = lambda qq, qqd: jax.grad(kinetic, argnums=1)(qq, qqd, pi)
    M = jax.jacfwd(p_fn, argnums=1)(q, qd)
    bias = jax.jacfwd(p_fn, argnums=0)(q, qd) @ qd - jax.grad(kinetic, argnums=0)(q, qd, pi) + jax.grad(potential, argnums=0)(q, pi)
    tau = jnp.concatenate([jnp.zeros(3), u])
    qdd = jnp.linalg.solve(M, tau - bias)
    return jnp.concatenate([qd, qdd])

xdot_mine = jax.vmap(lambda x, u: forward_flight(x, u, jnp.asarray(pi_mat)))(X, U)
err = np.abs(np.asarray(xdot_mine) - probes["dyn_fl"][:, :14]).max()
rel = err / np.abs(probes["dyn_fl"][:, :14]).max()
print(f"\nflight fwd-dyn max abs err = {err:.3e} (rel {rel:.3e})")
