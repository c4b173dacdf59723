"""Planar quadruped kinematics (x-z sagittal plane).

Generalized configuration q (7):
    q = (x, z, pitch, q_Fhip, q_Fknee, q_Hhip, q_Hknee)
matching the reference model (/root/reference/Dynamics/header/PlanarQuadruped.h:12-16,
get_homoTransformation at Dynamics/source/PlanarQuadruped.cpp:142-175).

Rotation convention: the reference composes Featherstone-style coordinate
rotations `coordinateRotation(Y, -q)` (orientation_tools.h:59) as body->world
transforms.  In the x-z plane this reduces to

    p_world = R(theta) @ p_link + t,   R(theta) = [[cos t,  sin t],
                                                   [-sin t, cos t]]

with theta the *sum* of the pitch and joint angles along the chain.  All
functions below are pure JAX and autodiff-friendly; derivatives of foot
positions reproduce the generated Jacob_F / Jacob_B kernels
(CasadiGen/source/Jacob_F.c) to machine precision (tests/test_kinematics.py).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

# Link geometry (PlanarQuadruped.cpp:120-138). These are kinematic constants;
# inertial parameters live in params.py (identified from the reference kernels).
BODY_LENGTH = 0.38
HIP_LINK_LENGTH = 0.209
KNEE_LINK_LENGTH = 0.195
HIP_LOC_X = BODY_LENGTH / 2.0  # hip joints at +/- bodyLength/2 along body x

# Link indices (linkID2D, PlanarQuadruped.h:18-27)
BODY, F_HIP, F_KNEE, H_HIP, H_KNEE, F_FOOT, H_FOOT = range(7)


def rot2(theta):
    """Planar body->world rotation for the reference's convention."""
    c, s = jnp.cos(theta), jnp.sin(theta)
    return jnp.array([[c, s], [-s, c]])


def rotv(theta, v):
    """rot2(theta) @ v spelled without a dot_general (f64 dots trigger an
    XLA-TPU compile-time pathology; see ops/linalg.py)."""
    c, s = jnp.cos(theta), jnp.sin(theta)
    return jnp.stack([c * v[0] + s * v[1], -s * v[0] + c * v[1]])


def link_frames(q):
    """Origins (7,2) and absolute angles (7,) of every link frame.

    Rows ordered per linkID2D: body, F_hip, F_knee, H_hip, H_knee, F_foot,
    H_foot (the last two share the knee angle; feet are points).
    """
    x, z, pitch = q[0], q[1], q[2]
    dt_ = q.dtype
    th_b = pitch
    th_fh = pitch + q[3]
    th_fk = th_fh + q[4]
    th_hh = pitch + q[5]
    th_hk = th_hh + q[6]

    p_body = jnp.stack([x, z])
    p_fhip = p_body + rotv(th_b, jnp.array([HIP_LOC_X, 0.0], dt_))
    p_hhip = p_body + rotv(th_b, jnp.array([-HIP_LOC_X, 0.0], dt_))
    p_fknee = p_fhip + rotv(th_fh, jnp.array([0.0, -HIP_LINK_LENGTH], dt_))
    p_hknee = p_hhip + rotv(th_hh, jnp.array([0.0, -HIP_LINK_LENGTH], dt_))
    p_ffoot = p_fknee + rotv(th_fk, jnp.array([0.0, -KNEE_LINK_LENGTH], dt_))
    p_hfoot = p_hknee + rotv(th_hk, jnp.array([0.0, -KNEE_LINK_LENGTH], dt_))

    origins = jnp.stack([p_body, p_fhip, p_fknee, p_hhip, p_hknee, p_ffoot, p_hfoot])
    angles = jnp.stack([th_b, th_fh, th_fk, th_hh, th_hk, th_fk, th_hk])
    return origins, angles


def foot_position(q, foot):
    """World position (2,) of a foot. foot: 0 = front (FLEG), 1 = hind (HLEG)."""
    origins, _ = link_frames(q)
    return jnp.where(foot == 0, origins[F_FOOT], origins[H_FOOT])


def front_foot_position(q):
    return link_frames(q)[0][F_FOOT]


def hind_foot_position(q):
    return link_frames(q)[0][H_FOOT]


def foot_jacobian(q, qd, foot_fn):
    """(J, Jd): J = d p_foot / d q (2,7) and its time derivative.

    Reproduces the Jacob_F / Jacob_B generated kernels.
    """
    J = jax.jacfwd(foot_fn)(q)
    # Jd = sum_j dJ/dq_j * qd_j  == directional derivative of J along qd
    Jd = jax.jvp(lambda qq: jax.jacfwd(foot_fn)(qq), (q,), (qd,))[1]
    return J, Jd


def front_foot_jacobian(q, qd):
    return foot_jacobian(q, qd, front_foot_position)


def hind_foot_jacobian(q, qd):
    return foot_jacobian(q, qd, hind_foot_position)


def homo_transforms(q):
    """(7,4,4) world-frame homogeneous transforms of every link frame.

    3-D embedding of the planar chain, matching the reference's
    `get_homoTransformation` (PlanarQuadruped.cpp:140-174): each link frame
    is a rotation about Y by −(accumulated angle) with translation
    (x, 0, z).  Row order = linkID2D (body, F_hip, F_knee, H_hip, H_knee,
    F_foot, H_foot).
    """
    from ..utils import orientation as ORI

    origins, angles = link_frames(q)

    def one(p, th):
        # the reference's own call path (PlanarQuadruped.cpp:142-175):
        # ori::coordinateRotation(Y, -th) composed into homoTransformation.
        R = ORI.coordinate_rotation(ORI.AXIS_Y, -th)
        zero = jnp.zeros((), dtype=q.dtype)
        return ORI.homo_transformation(R, jnp.stack([p[0], zero, p[1]]))

    return jax.vmap(one)(origins, angles)


def contact_position(q, link, loc):
    """World (x,z) of a point `loc=(x_link, z_link)` on link `link`.

    PlanarQuadruped::get_contact_position (PlanarQuadruped.cpp:177-186);
    `link` may be traced (gathers over the stacked frames).
    """
    origins, angles = link_frames(q)
    p = jnp.take(origins, link, axis=0)
    th = jnp.take(angles, link)
    return p + rotv(th, jnp.asarray(loc, dtype=q.dtype))


def link_jacobian(q, qd, link, loc):
    """(J, Jd) of a link-fixed contact point: J = ∂p/∂q (2,7), Jd = J̇.

    The capability of the generated Link0..4Jacobian kernels
    (CasadiGen/source/Link0Jacobian.c etc.), which the reference compiles
    but never calls (`PlanarQuadruped::linkJacobian` is an empty stub,
    PlanarQuadruped.h:72).  Here it is one autodiff of `contact_position`.
    """
    fn = lambda qq: contact_position(qq, link, loc)
    J = jax.jacfwd(fn)(q)
    Jd = jax.jvp(lambda qq: jax.jacfwd(fn)(qq), (q,), (qd,))[1]
    return J, Jd


def hip_position(q, leg):
    """World position of the hip joint origin. leg: 0 = front, 1 = hind."""
    origins, _ = link_frames(q)
    return jnp.where(leg == 0, origins[F_HIP], origins[H_HIP])


def leg_extension(q, leg):
    """Vector hip -> foot (PlanarQuadruped::get_leg_ext_vec, .cpp:195-205)."""
    origins, _ = link_frames(q)
    front = origins[F_FOOT] - origins[F_HIP]
    hind = origins[H_FOOT] - origins[H_HIP]
    return jnp.where(leg == 0, front, hind)
