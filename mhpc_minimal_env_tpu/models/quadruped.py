"""Whole-body planar quadruped dynamics — TPU-native replacement for the
reference's generated-C layer (CasadiGen/source/Dyn_*.c, Imp_*.c).

State x = (q, qd) with q = (x, z, pitch, q_Fhip, q_Fknee, q_Hhip, q_Hknee),
control u = 4 joint torques, output y = (Fx_F, Fz_F, Fx_H, Fz_H) ground
reaction forces (stance) or contact impulses (impact maps).

Formulation: Lagrangian rigid-body dynamics built from the identified
standard inertial parameters (params.py).  Contact modes
(1=back-stance, 2/4=flight, 3=front-stance; PlanarQuadruped.cpp:12-24) solve
the pinned-foot KKT system; impacts are plastic (PlanarQuadruped.cpp:58-78).
Validated against all reference kernels to <=1e-9 absolute
(tests/test_dynamics.py).

Derivatives come from `jax.jacfwd` over these functions: the reference's
analytic Dyn_*_par / Imp_*_par kernels are reproduced to the same tolerance.
Everything is jit/vmap/scan-friendly: fixed shapes, no data-dependent Python
control flow (the contact mode is a static per-phase attribute).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from . import kinematics as K
from .params import GRAVITY, PI_STANDARD
from ..ops import linalg as LA

# contact mode ids (Gait.h:23: BOUND mode cycle 1->2->3->4)
BACK_STANCE, FLIGHT1, FRONT_STANCE, FLIGHT2 = 1, 2, 3, 4

_PI = jnp.asarray(PI_STANDARD)


def _link_origin_angle(q):
    origins, angles = K.link_frames(q)
    return origins[:5], angles[:5]


def _dRc(angles):
    """Per-link d/dtheta [R(theta) c] scaled by mass: columns (m cx, m cz)."""
    c, s = jnp.cos(angles), jnp.sin(angles)
    P = _PI.astype(angles.dtype)
    mcx, mcz = P[:, 1], P[:, 2]
    return jnp.stack([-s * mcx + c * mcz, -c * mcx - s * mcz], axis=1)  # (5,2)


def mass_matrix(q):
    """M(q) (7,7), symmetric positive definite.

    Closed-form assembly from link Jacobians (one jacfwd over the kinematics
    instead of a nested KE hessian — keeps the XLA graph small):
        M = sum_i m_i Jo_i^T Jo_i + Jo_i^T dRc_i Jw_i + (.)^T + Io_i Jw_i^T Jw_i
    """
    Jo, Jw = jax.jacfwd(_link_origin_angle)(q)  # (5,2,7), (5,7)
    _, angles = _link_origin_angle(q)
    P = _PI.astype(q.dtype)
    m, io = P[:, 0], P[:, 3]
    dRc = _dRc(angles)
    # contractions spelled as broadcast-multiply-reduce, NOT einsum/dot:
    # f64 dot_general emulation on TPU has pathological compile times
    # (ops/linalg.py has the measurements)
    M = (Jo[:, :, :, None] * Jo[:, :, None, :]
         * m[:, None, None, None]).sum((0, 1))
    X = (Jo[:, :, :, None] * dRc[:, :, None, None]
         * Jw[:, None, None, :]).sum((0, 1))
    M = M + X + X.T + (Jw[:, :, None] * Jw[:, None, :]
                       * io[:, None, None]).sum(0)
    return M


def kinetic_energy(q, qd):
    """Total KE = 1/2 qd^T M(q) qd."""
    return 0.5 * LA.quad_form(qd, mass_matrix(q), qd)


def potential_energy(q):
    origins, ang = _link_origin_angle(q)
    c, s = jnp.cos(ang), jnp.sin(ang)
    P = _PI.astype(q.dtype)
    m, mcx, mcz = P[:, 0], P[:, 1], P[:, 2]
    return GRAVITY * jnp.sum(m * origins[:, 1] + (-s * mcx + c * mcz))


def bias_forces(q, qd):
    """C(q,qd) qd + g(q) via the Lagrangian identity
    c = Mdot qd - 1/2 d/dq (qd^T M qd):  small-graph alternative to
    differentiating the kinetic energy twice."""
    Mdot = jax.jvp(mass_matrix, (q,), (qd,))[1]
    quad = lambda qq: LA.quad_form(qd, mass_matrix(qq), qd)
    return (
        LA.mv(Mdot, qd)
        - 0.5 * jax.grad(quad)(q)
        + jax.grad(potential_energy)(q)
    )


def _actuation(u):
    """Joint torques act on q[3:7] (S^T u)."""
    return jnp.concatenate([jnp.zeros(3, dtype=u.dtype), u])


def _foot_fn(foot):
    return K.front_foot_position if foot == 0 else K.hind_foot_position


def _foot_J_Jd(q, qd, foot):
    fn = _foot_fn(foot)
    J = jax.jacfwd(fn)(q)
    Jd = jax.jvp(lambda qq: jax.jacfwd(fn)(qq), (q,), (qd,))[1]
    return J, Jd


def _grf_vector(F, foot):
    """Scatter a single foot's force into y = (Fx_F, Fz_F, Fx_H, Fz_H)."""
    z = jnp.zeros(2, dtype=F.dtype)
    return jnp.concatenate([F, z]) if foot == 0 else jnp.concatenate([z, F])


def flight_xdot(x, u):
    """Continuous dynamics, flight (Dyn_FL.c): y = 0."""
    q, qd = x[:7], x[7:]
    qdd = LA.spd_solve(mass_matrix(q), _actuation(u) - bias_forces(q, qd))
    return jnp.concatenate([qd, qdd]), jnp.zeros(4, dtype=x.dtype)


def _both_feet_J_Jd(q, qd):
    """Stacked (4,7) Jacobian / Jacobian-dot of (front, hind) feet."""
    Jf, Jdf = _foot_J_Jd(q, qd, 0)
    Jh, Jdh = _foot_J_Jd(q, qd, 1)
    return (jnp.concatenate([Jf, Jh], axis=0),
            jnp.concatenate([Jdf, Jdh], axis=0))


def _masked_kkt(S, r, c):
    """Solve the contact force system with per-row gates c in {0,1}:
    inactive rows/columns are replaced by identity / zero rhs, which makes
    the active sub-block's arithmetic IDENTICAL (bitwise) to solving it
    alone — the unrolled Cholesky pivots of a block-diagonal
    [I, S_active] touch the active entries with the same operations."""
    Sm = S * c[:, None] * c[None, :] + jnp.diag(1.0 - c)
    F = LA.spd_solve(Sm, r * c)
    return F * c


def _wb_assemble_masked(qd, u, cf, ch, M, cb, J, Jd, dtype):
    """Masked-KKT assembly shared by the AD- and symbolic-terms paths."""
    rhs = _actuation(u) - cb
    sol = LA.spd_solve(M, jnp.concatenate([rhs[:, None], J.T], axis=1))
    x_free, W = sol[:, 0], sol[:, 1:]          # (7,), (7,4)
    S = LA.mm(J, W)                            # (4,4)
    c = jnp.stack([cf, cf, ch, ch]).astype(dtype)
    F = -_masked_kkt(S, LA.mv(Jd, qd) + LA.mv(J, x_free), c)
    qdd = x_free + LA.mv(W, F)
    return jnp.concatenate([qd, qdd]), F


def wb_xdot_masked(x, u, cf, ch):
    """Mode-unified continuous WB dynamics with contact gates
    (cf, ch) in {0,1} for (front, hind) feet.

    Reproduces Dyn_BS ((0,1)), Dyn_FS ((1,0)) and Dyn_FL ((0,0))
    bit-for-bit (see _masked_kkt): ONE graph for all three contact modes,
    which roughly halves the XLA graph of the fused rollout/linearize
    scan bodies vs a 3-branch lax.switch of separate stance/flight
    dynamics.  y = (Fx_F, Fz_F, Fx_H, Fz_H) ground-reaction forces.
    """
    q, qd = x[:7], x[7:]
    M = mass_matrix(q)
    J, Jd = _both_feet_J_Jd(q, qd)
    return _wb_assemble_masked(qd, u, cf, ch, M, bias_forces(q, qd), J, Jd,
                               x.dtype)


def wb_xdot_masked_sym(x, u, cf, ch):
    """wb_xdot_masked with the model terms (M, bias, J, Jd) evaluated as
    GENERATED closed-form trig polynomials (models/sym_dynamics.py, the
    Dyn_*.c analog) instead of per-step AD over the kinematics — several
    times fewer ops in the rollout scan body.  Same KKT assembly, same
    semantics; equivalence asserted by tests/test_dynamics.py."""
    from . import sym_dynamics as SD

    q, qd = x[:7], x[7:]
    M, cb, J, Jd = SD.model_terms(q, qd)
    return _wb_assemble_masked(qd, u, cf, ch, M, cb, J, Jd, x.dtype)


# contact gates per WB mode (PlanarQuadruped.cpp:12-24): (front, hind)
WB_CONTACT = {BACK_STANCE: (0.0, 1.0), FLIGHT1: (0.0, 0.0),
              FRONT_STANCE: (1.0, 0.0), FLIGHT2: (0.0, 0.0)}


# --------------------------------------------------------------------------
# analytic linearization of the masked-KKT dynamics
# --------------------------------------------------------------------------

def _both_feet_pos(q):
    """Stacked (4,) world positions of (front, hind) feet."""
    o, _ = K.link_frames(q)
    return jnp.concatenate([o[K.F_FOOT], o[K.H_FOOT]])


def _both_feet_J(q):
    """(4,7) stacked foot Jacobian (= jacfwd of the positions)."""
    return jax.jacfwd(_both_feet_pos)(q)


def wb_jac_masked(x, u, cf, ch):
    """Closed-form continuous-time Jacobians of `wb_xdot_masked`:
    (dxdot_dx (14,14), dxdot_du (14,4), dF_dx (4,14), dF_du (4,4)).

    This is the TPU-native analog of the reference's analytic partial
    kernels (CasadiGen/source/Dyn_BS_par.c etc.): instead of pushing 18
    forward tangents through the full contact-KKT dynamics (jacfwd of
    `wb_xdot_masked`, measured 55% of solve time in round 3), the chain
    rule is assembled by hand so that

      - the mass-matrix / bias / Jacobian q-derivative tensors come from
        7-tangent AD over only the CHEAP model functions (mass_matrix,
        foot kinematics, bias_forces) — never through the KKT solves;
      - the qd-derivatives are exact tensor contractions of dM/dq
        (dc/dqd = Mdot + G - G^T with G = dM contracted with qd) and of
        the foot Hessian (d(Jd qd)/dqd = 2 Jd) — zero extra AD;
      - every KKT-solution derivative reuses the TWO primal Cholesky
        factorizations (M and the gated contact Schur complement) as
        multi-RHS triangular solves: one 46-column M-solve and one
        18-column S-solve replace 18 re-factorizing tangent sweeps.

    Exact calculus on the same formulas, so it matches jacfwd of
    `wb_xdot_masked` to roundoff (tests/test_dynamics.py).
    """
    q, qd = x[:7], x[7:]
    dt_ = x.dtype

    # ---- model derivative tensors (restricted AD + contractions)
    M = mass_matrix(q)
    J = _both_feet_J(q)                                  # (4,7)
    dJ = jax.jacfwd(_both_feet_J)(q)                     # (4,7,7) [a,j,k]
    Jd = (dJ * qd[None, None, :]).sum(-1)                # (4,7)
    cb = bias_forces(q, qd)
    dM = jax.jacfwd(mass_matrix)(q)                      # (7,7,7) [i,j,k]
    dcq = jax.jacfwd(lambda qq: bias_forces(qq, qd))(q)  # (7,7)
    # dc/dqd analytically from dM/dq:
    #   c = Mdot qd - 1/2 d/dq(qd^T M qd) + g(q)
    #   => dc/dqd = Mdot + G - G^T,  G[a,l] = sum_j dM[a,j,l] qd_j
    Mdot = (dM * qd[None, None, :]).sum(-1)              # (7,7)
    G = (dM * qd[None, :, None]).sum(1)                  # (7,7)
    dcqd = Mdot + G - G.T
    # gamma = Jd qd = qd^T Hess(p) qd; d(gamma)/dq via one directional
    # second derivative chain (kinematics only)
    dd_feet = lambda qq: jax.jvp(
        lambda z: jax.jvp(_both_feet_pos, (z,), (qd,))[1], (qq,), (qd,))[1]
    dgq = jax.jacfwd(dd_feet)(q)                         # (4,7)
    return _wb_jac_assemble(qd, u, cf, ch, M, cb, J, Jd, dM, dcq, dcqd,
                            dJ, dgq, dt_)


def wb_jac_masked_sym(x, u, cf, ch):
    """wb_jac_masked with ALL model derivative tensors (dM/dq, dc/dq,
    dc/dqd, dJ/dq, d(Jd qd)/dq) evaluated as generated closed-form code
    (models/sym_dynamics.py, the Dyn_*_par.c analog) — zero AD in the
    linearizer hot path.  Same multi-RHS KKT assembly."""
    from . import sym_dynamics as SD

    q, qd = x[:7], x[7:]
    M, cb, J, Jd, dM, dcq, dcqd, dJ, dgq = SD.model_terms_lin(q, qd)
    return _wb_jac_assemble(qd, u, cf, ch, M, cb, J, Jd, dM, dcq, dcqd,
                            dJ, dgq, x.dtype)


def _wb_jac_assemble(qd, u, cf, ch, M, cb, J, Jd, dM, dcq, dcqd, dJ, dgq,
                     dt_):
    c4 = jnp.stack([cf, cf, ch, ch]).astype(dt_)

    # ---- primal quantities with both factorizations kept
    LM = LA.cholesky_unrolled(M)
    rhs = _actuation(u) - cb
    sol = LA.cho_solve(LM, jnp.concatenate([rhs[:, None], J.T], axis=1))
    x_free, W = sol[:, 0], sol[:, 1:]                    # (7,), (7,4)
    Smat = LA.mm(J, W)
    Sm = Smat * c4[:, None] * c4[None, :] + jnp.diag(1.0 - c4)
    LS = LA.cholesky_unrolled(Sm)
    b = (LA.mv(Jd, qd) + LA.mv(J, x_free)) * c4
    Fm = LA.cho_solve(LS, b)                             # ungated solution
    F = -Fm * c4
    # (qdd itself is not needed — only its derivatives)

    # ---- one multi-RHS solve on the M factorization for all directions
    dMx = (dM * x_free[None, :, None]).sum(1)            # (7,7)  dM_k x_free
    R_q = -dcq - dMx                                     # q-dirs: d x_free
    dMW = (dM[:, :, None, :] * W[None, :, :, None]).sum(1)  # (7,4,7)
    R_W = jnp.transpose(dJ, (1, 0, 2)) - dMW             # q-dirs: d W
    Su = jnp.concatenate(
        [jnp.zeros((3, 4), dt_), jnp.eye(4, dtype=dt_)], axis=0)  # (7,4)
    RHS = jnp.concatenate(
        [R_q, R_W.reshape(7, 28), -dcqd, Su], axis=1)    # (7, 46)
    SOLVED = LA.cho_solve(LM, RHS)
    dxf_q = SOLVED[:, :7]                                # (7,7)
    dW_q = SOLVED[:, 7:35].reshape(7, 4, 7)              # (7,4,7)
    dxf_qd = SOLVED[:, 35:42]                            # (7,7)
    dxf_u = SOLVED[:, 42:46]                             # (7,4)

    # ---- contact-force derivatives: one multi-RHS solve on the Sm factor
    dS_q = ((dJ[:, :, None, :] * W[None, :, :, None]).sum(1)
            + (J[:, :, None, None] * dW_q[None, :, :, :]).sum(1))  # (4,4,7)
    dS_q = dS_q * c4[:, None, None] * c4[None, :, None]
    dJxf = (dJ * x_free[None, :, None]).sum(1)           # (4,7)
    Jdxf_q = (J[:, :, None] * dxf_q[None, :, :]).sum(1)  # (4,7)
    db_q = (dgq + dJxf + Jdxf_q) * c4[:, None] \
        - (dS_q * Fm[None, :, None]).sum(1)
    db_qd = (2.0 * Jd + (J[:, :, None] * dxf_qd[None, :, :]).sum(1)) \
        * c4[:, None]
    db_u = (J[:, :, None] * dxf_u[None, :, :]).sum(1) * c4[:, None]
    dFm = LA.cho_solve(LS, jnp.concatenate([db_q, db_qd, db_u], axis=1))
    dF_q = -dFm[:, :7] * c4[:, None]                     # (4,7)
    dF_qd = -dFm[:, 7:14] * c4[:, None]
    dF_u = -dFm[:, 14:18] * c4[:, None]

    # ---- qdd derivatives and block assembly
    dqdd_q = (dxf_q + (dW_q * F[None, :, None]).sum(1)
              + (W[:, :, None] * dF_q[None, :, :]).sum(1))
    dqdd_qd = dxf_qd + (W[:, :, None] * dF_qd[None, :, :]).sum(1)
    dqdd_u = dxf_u + (W[:, :, None] * dF_u[None, :, :]).sum(1)

    z77 = jnp.zeros((7, 7), dt_)
    top = jnp.concatenate([z77, jnp.eye(7, dtype=dt_)], axis=1)
    bot = jnp.concatenate([dqdd_q, dqdd_qd], axis=1)
    dxdot_dx = jnp.concatenate([top, bot], axis=0)       # (14,14)
    dxdot_du = jnp.concatenate([jnp.zeros((7, 4), dt_), dqdd_u], axis=0)
    dF_dx = jnp.concatenate([dF_q, dF_qd], axis=1)       # (4,14)
    return dxdot_dx, dxdot_du, dF_dx, dF_u


def impact_map_masked(x, cf, ch):
    """Foot-gated plastic impact: qd+ = qd - M^-1 J^T lam,
    lam = (J M^-1 J^T)^-1 J qd restricted to the gated foot rows.

    (cf, ch) = (1, 0) reproduces Imp_F, (0, 1) reproduces Imp_B, and
    (0, 0) is EXACTLY the identity map (lam = 0) — so phase seams with no
    impact need no separate branch.  y = contact impulse.
    """
    q, qd = x[:7], x[7:]
    M = mass_matrix(q)
    J, _ = _both_feet_J_Jd(q, qd)
    MinvJT = LA.spd_solve(M, J.T)              # (7,4)
    S = LA.mm(J, MinvJT)                       # (4,4)
    c = jnp.stack([cf, cf, ch, ch]).astype(x.dtype)
    lam = _masked_kkt(S, LA.mv(J, qd), c)
    qd_post = qd - LA.mv(MinvJT, lam)
    return jnp.concatenate([q, qd_post]), -lam


def stance_xdot(x, u, foot):
    """Continuous dynamics with one foot pinned (Dyn_BS.c foot=1 /
    Dyn_FS.c foot=0); y = ground-reaction force of the stance foot.

    KKT system  [M  -J^T; J  0] [qdd; F] = [S^T u - bias; -Jd qd], solved by
    the Schur complement on the (SPD) mass matrix so everything lowers to
    Cholesky + triangular solves (TPU-safe in f64, see ops/linalg.py):
        S F = -(Jd qd + J M^-1 rhs),  S = J M^-1 J^T
        qdd = M^-1 (rhs + J^T F)
    """
    q, qd = x[:7], x[7:]
    M = mass_matrix(q)
    J, Jd = _foot_J_Jd(q, qd, foot)
    rhs = _actuation(u) - bias_forces(q, qd)
    # one factorization for both solves (spd_solve has a custom JVP that
    # reuses it, so jacfwd-based linearization stays cheap)
    sol = LA.spd_solve(M, jnp.concatenate([rhs[:, None], J.T], axis=1))
    x_free, W = sol[:, 0], sol[:, 1:]
    S = LA.mm(J, W)                         # 2x2 SPD
    F = -LA.spd_solve(S, LA.mv(Jd, qd) + LA.mv(J, x_free))
    qdd = x_free + LA.mv(W, F)
    return jnp.concatenate([qd, qdd]), _grf_vector(F, foot)


def wb_xdot(x, u, mode):
    """Mode-switched continuous dynamics. `mode` is a static Python int."""
    if mode == BACK_STANCE:
        return stance_xdot(x, u, 1)
    if mode == FRONT_STANCE:
        return stance_xdot(x, u, 0)
    return flight_xdot(x, u)


def wb_step(x, u, mode, dt):
    """Explicit-Euler discrete step (PlanarQuadruped.cpp:26): x+ = x + xdot dt."""
    xdot, y = wb_xdot(x, u, mode)
    return x + xdot * dt, y


def wb_step_jac(x, u, mode, dt):
    """Discrete-time derivatives matching PlanarQuadruped::dynamics_par
    (.cpp:50-52): A = I + Ac dt, B = Bc dt; C = dy/dx, D = dy/du."""
    fx = lambda xx: wb_xdot(xx, u, mode)
    fu = lambda uu: wb_xdot(x, uu, mode)
    (Ac, C) = jax.jacfwd(fx)(x)
    (Bc, D) = jax.jacfwd(fu)(u)
    n = x.shape[0]
    A = jnp.eye(n, dtype=x.dtype) + Ac * dt
    B = Bc * dt
    return A, B, C, D


def impact_map(x, foot):
    """Plastic impact (Imp_F.c foot=0 / Imp_B.c foot=1):
    qd+ = qd - M^-1 J^T (J M^-1 J^T)^-1 J qd; y = contact impulse."""
    q, qd = x[:7], x[7:]
    M = mass_matrix(q)
    J = jax.jacfwd(_foot_fn(foot))(q)
    MinvJT = LA.spd_solve(M, J.T)
    lam = LA.spd_solve(LA.mm(J, MinvJT), LA.mv(J, qd))
    qd_post = qd - LA.mv(MinvJT, lam)
    return jnp.concatenate([q, qd_post]), _grf_vector(-lam, foot)


def resetmap(x, mode):
    """Reset map at end-of-phase (PlanarQuadruped::resetmap, .cpp:58-78):
    identity for stance modes (1, 3); impact for flight modes
    (mode 2 -> front impact, mode 4 -> back impact)."""
    if mode in (BACK_STANCE, FRONT_STANCE):
        return x, jnp.zeros(4, dtype=x.dtype)
    return impact_map(x, 0 if mode == FLIGHT1 else 1)


def resetmap_jac(x, mode):
    """Px = d resetmap / dx (Imp_*_par kernels; identity for stance)."""
    if mode in (BACK_STANCE, FRONT_STANCE):
        return jnp.eye(x.shape[0], dtype=x.dtype)
    return jax.jacfwd(lambda xx: resetmap(xx, mode)[0])(x)


def touchdown_constraint(x, mode, ground_height):
    """Switching-surface terminal constraint for flight phases
    (WB_FL1/2_terminal_constr.c): h = z_foot(q) - ground_height."""
    foot = 0 if mode == FLIGHT1 else 1
    q = x[:7]
    return _foot_fn(foot)(q)[1] - ground_height


def touchdown_constraint_jac(x, mode, ground_height):
    """(h, hx, hxx) matching the reference kernels' dense outputs."""
    f = lambda xx: touchdown_constraint(xx, mode, ground_height)
    h = f(x)
    hx = jax.grad(f)(x)
    hxx = jax.hessian(f)(x)
    return h, hx, hxx
