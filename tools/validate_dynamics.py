#!/usr/bin/env python3
"""Validate canonical inertial params + contact/impact/terminal-constraint
formulations against the reference kernels (all modes), in float64 on CPU.
"""
import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from mhpc_minimal_env_tpu.models import kinematics as K

G = 9.81
# Canonical inertial params, read from the literal constants in the generated C
# (Dyn_FL.c): (m, m*cx, m*cz, I_origin) per link {body, F_hip, F_knee, H_hip, H_knee}
PI = jnp.asarray(np.load("/tmp/pi_hat.npy"))

probes = np.load("tests/golden/kernel_probes.npz")
X, U, N = probes["x"], probes["u"], probes["x"].shape[0]


def link_origin_angle(q):
    origins, angles = K.link_frames(q)
    return origins[:5], angles[:5]


def kinetic(q, qd, pi):
    o_fn = lambda qq: link_origin_angle(qq)[0]
    a_fn = lambda qq: link_origin_angle(qq)[1]
    vo = jax.jvp(o_fn, (q,), (qd,))[1]
    w = jax.jvp(a_fn, (q,), (qd,))[1]
    _, angles = link_origin_angle(q)
    c, s = jnp.cos(angles), jnp.sin(angles)
    m, mcx, mcz, Io = pi[:, 0], pi[:, 1], pi[:, 2], pi[:, 3]
    dRc = jnp.stack([-s * mcx + c * mcz, -c * mcx - s * mcz], axis=1)
    return jnp.sum(0.5 * m * jnp.sum(vo * vo, axis=1)
                   + w * jnp.sum(vo * dRc, axis=1) + 0.5 * Io * w ** 2)


def potential(q, pi):
    origins, angles = link_origin_angle(q)
    c, s = jnp.cos(angles), jnp.sin(angles)
    m, mcx, mcz = pi[:, 0], pi[:, 1], pi[:, 2]
    return G * jnp.sum(m * origins[:, 1] + (-s * mcx + c * mcz))


def mass_matrix(q):
    return jax.hessian(lambda qd: kinetic(q, qd, PI))(jnp.zeros(7))


def bias(q, qd):
    p_fn = lambda qq: jax.grad(kinetic, argnums=1)(qq, qd, PI)
    dpdq_qd = jax.jvp(p_fn, (q,), (qd,))[1]
    return dpdq_qd - jax.grad(kinetic, argnums=0)(q, qd, PI) + jax.grad(potential, argnums=0)(q, PI)


STau = lambda u: jnp.concatenate([jnp.zeros(3), u])


def flight_xdot(x, u):
    q, qd = x[:7], x[7:]
    qdd = jnp.linalg.solve(mass_matrix(q), STau(u) - bias(q, qd))
    return jnp.concatenate([qd, qdd]), jnp.zeros(4)


def stance_xdot(x, u, foot):  # foot: 0 front (FS), 1 hind (BS)
    q, qd = x[:7], x[7:]
    M = mass_matrix(q)
    foot_fn = K.front_foot_position if foot == 0 else K.hind_foot_position
    J = jax.jacfwd(foot_fn)(q)
    Jd = jax.jvp(lambda qq: jax.jacfwd(foot_fn)(qq), (q,), (qd,))[1]
    # KKT: [M -J^T; J 0] [qdd; F] = [S u - bias; -Jd qd]
    Z = jnp.zeros((2, 2))
    KKT = jnp.block([[M, -J.T], [J, Z]])
    rhs = jnp.concatenate([STau(u) - bias(q, qd), -Jd @ qd])
    sol = jnp.linalg.solve(KKT, rhs)
    qdd, F = sol[:7], sol[7:]
    y = jnp.where(foot == 0, jnp.concatenate([F, jnp.zeros(2)]),
                  jnp.concatenate([jnp.zeros(2), F]))
    return jnp.concatenate([qd, qdd]), y


def impact_map(x, foot):  # plastic impact at foot
    q, qd = x[:7], x[7:]
    M = mass_matrix(q)
    foot_fn = K.front_foot_position if foot == 0 else K.hind_foot_position
    J = jax.jacfwd(foot_fn)(q)
    MinvJT = jnp.linalg.solve(M, J.T)
    lam = jnp.linalg.solve(J @ MinvJT, J @ qd)   # impulse = -lam?
    qd_post = qd - MinvJT @ lam
    imp = -lam
    y = jnp.where(foot == 0, jnp.concatenate([imp, jnp.zeros(2)]),
                  jnp.concatenate([jnp.zeros(2), imp]))
    return jnp.concatenate([q, qd_post]), y


r = {}
fl = jax.jit(jax.vmap(flight_xdot))(X, U)
r["FL xdot"] = np.abs(np.asarray(fl[0]) - probes["dyn_fl"][:, :14]).max()
bs = jax.jit(jax.vmap(lambda x, u: stance_xdot(x, u, 1)))(X, U)
r["BS xdot"] = np.abs(np.asarray(bs[0]) - probes["dyn_bs"][:, :14]).max()
r["BS y"] = np.abs(np.asarray(bs[1]) - probes["dyn_bs"][:, 14:]).max()
fs = jax.jit(jax.vmap(lambda x, u: stance_xdot(x, u, 0)))(X, U)
r["FS xdot"] = np.abs(np.asarray(fs[0]) - probes["dyn_fs"][:, :14]).max()
r["FS y"] = np.abs(np.asarray(fs[1]) - probes["dyn_fs"][:, 14:]).max()
impF = jax.jit(jax.vmap(lambda x: impact_map(x, 0)))(X)
r["ImpF x"] = np.abs(np.asarray(impF[0]) - probes["imp_f"][:, :14]).max()
r["ImpF y"] = np.abs(np.asarray(impF[1]) - probes["imp_f"][:, 14:]).max()
impB = jax.jit(jax.vmap(lambda x: impact_map(x, 1)))(X)
r["ImpB x"] = np.abs(np.asarray(impB[0]) - probes["imp_b"][:, :14]).max()
r["ImpB y"] = np.abs(np.asarray(impB[1]) - probes["imp_b"][:, 14:]).max()

# dynamics partials (continuous-time A,B,C,D)
def stance_par(x, u, foot):
    f = lambda xx, uu: stance_xdot(xx, uu, foot)
    A = jax.jacfwd(lambda xx: f(xx, u)[0])(x)
    B = jax.jacfwd(lambda uu: f(x, uu)[0])(u)
    C = jax.jacfwd(lambda xx: f(xx, u)[1])(x)
    D = jax.jacfwd(lambda uu: f(x, uu)[1])(u)
    return A, B, C, D

Nsub = 50
par = jax.jit(jax.vmap(lambda x, u: stance_par(x, u, 1)))(X[:Nsub], U[:Nsub])
ref = probes["par_bs"][:Nsub]
refA = ref[:, :196].reshape(Nsub, 14, 14).transpose(0, 2, 1)
refB = ref[:, 196:252].reshape(Nsub, 4, 14).transpose(0, 2, 1)
refC = ref[:, 252:308].reshape(Nsub, 14, 4).transpose(0, 2, 1)
refD = ref[:, 308:324].reshape(Nsub, 4, 4).transpose(0, 2, 1)
r["BS A"] = np.abs(np.asarray(par[0]) - refA).max()
r["BS B"] = np.abs(np.asarray(par[1]) - refB).max()
r["BS C"] = np.abs(np.asarray(par[2]) - refC).max()
r["BS D"] = np.abs(np.asarray(par[3]) - refD).max()

# impact partials
impPar = jax.jit(jax.vmap(lambda x: jax.jacfwd(lambda xx: impact_map(xx, 0)[0])(x)))(X[:Nsub])
refPx = probes["imp_f_par"][:Nsub].reshape(Nsub, 14, 14).transpose(0, 2, 1)
r["ImpF Px"] = np.abs(np.asarray(impPar) - refPx).max()

# terminal constraints: h = z_foot - ground? check front foot (FL1 -> front impact next)
gH = -0.404
z_ffoot = jax.vmap(lambda x: K.front_foot_position(x[:7])[1])(X)
z_hfoot = jax.vmap(lambda x: K.hind_foot_position(x[:7])[1])(X)
h1 = probes["tc1"][:, 0]
h2 = probes["tc2"][:, 0]
print("tc1 h sample:", h1[:3], " z_ffoot-gH:", (np.asarray(z_ffoot)-gH)[:3])
print("tc2 h sample:", h2[:3], " z_hfoot-gH:", (np.asarray(z_hfoot)-gH)[:3])

for k, v in r.items():
    print(f"{k:8s} max|err| = {v:.3e}")
