"""3-D rotation utilities, Featherstone coordinate-transform convention.

JAX-native counterpart of the reference's `ori::` namespace
(Common/header/orientation_tools.h:28-392): rotation matrices transform
FROM world INTO body coordinates (the transpose of the displacement
rotation), matching Roy Featherstone's spatial_v2 convention used by the
reference's planar kinematics (`coordinateRotation(Y, -q)` chains,
Dynamics/source/PlanarQuadruped.cpp:142-175).

Every function is pure, jittable, vmappable, and branch-free (selects via
`jnp.where` replace the reference's if/else ladders, e.g. the 4-case
rotation-matrix→quaternion extraction at orientation_tools.h:129-167), so
they can sit inside `lax.scan` solver bodies without retracing.

Quaternion layout: (w, x, y, z) scalar-first, as in the reference.
"""
from __future__ import annotations

import jax.numpy as jnp

# orientation_tools.h:28 — drift-correction gain for quat integration.
QUAT_DERIVATIVE_STABILIZATION = 0.1

AXIS_X, AXIS_Y, AXIS_Z = 0, 1, 2


def rad2deg(rad):
    """orientation_tools.h:36."""
    return rad * (180.0 / jnp.pi)


def deg2rad(deg):
    """orientation_tools.h:46."""
    return deg * (jnp.pi / 180.0)


def coordinate_rotation(axis: int, theta):
    """World→body coordinate rotation about a principal axis.

    orientation_tools.h:59-76: `coordinateRotation(X, .1) @ v` expresses v
    in a frame rotated by +0.1 rad (i.e. rotates v by −0.1).  `axis` is a
    static int (0=X, 1=Y, 2=Z) so the branch resolves at trace time.
    """
    theta = jnp.asarray(theta)
    s, c = jnp.sin(theta), jnp.cos(theta)
    one, zero = jnp.ones_like(theta), jnp.zeros_like(theta)
    if axis == AXIS_X:
        rows = [one, zero, zero, zero, c, s, zero, -s, c]
    elif axis == AXIS_Y:
        rows = [c, zero, -s, zero, one, zero, s, zero, c]
    elif axis == AXIS_Z:
        rows = [c, s, zero, -s, c, zero, zero, zero, one]
    else:
        raise ValueError(f"axis must be 0/1/2, got {axis}")
    return jnp.stack(rows).reshape(3, 3)


def cross_matrix(v):
    """Skew-symmetric matrix S(v) with S(v) @ w = v × w (orientation_tools.h:79)."""
    v = jnp.asarray(v)
    zero = jnp.zeros_like(v[0])
    return jnp.stack([
        zero, -v[2], v[1],
        v[2], zero, -v[0],
        -v[1], v[0], zero,
    ]).reshape(3, 3)


# orientation_tools.h:106 — same operator, kept under the reference's alias.
vector_to_skew_mat = cross_matrix


def mat_to_skew_vec(m):
    """Inverse of cross_matrix via antisymmetrization (orientation_tools.h:118)."""
    m = jnp.asarray(m)
    a = 0.5 * (m - m.T)
    return jnp.stack([a[2, 1], a[0, 2], a[1, 0]])


def rpy_to_rot_mat(rpy):
    """World→body rotation from (roll, pitch, yaw) (orientation_tools.h:93-100):
    R = Rx(roll) @ Ry(pitch) @ Rz(yaw)."""
    return (
        coordinate_rotation(AXIS_X, rpy[0])
        @ coordinate_rotation(AXIS_Y, rpy[1])
        @ coordinate_rotation(AXIS_Z, rpy[2])
    )


def rotation_matrix_to_quaternion(r1):
    """(w,x,y,z) from a world→body rotation matrix.

    orientation_tools.h:129-167 — Shepperd's 4-case extraction, computed
    branch-free: all four candidates are evaluated and the numerically
    dominant one (largest pivot) is selected with `where` masks, so the
    function is safely vmappable.
    """
    r = jnp.asarray(r1).T  # the reference transposes before extraction
    tr = jnp.trace(r)

    # case 0: tr > 0
    s0 = jnp.sqrt(jnp.maximum(tr + 1.0, 1e-30)) * 2.0
    q0 = jnp.stack([
        0.25 * s0,
        (r[2, 1] - r[1, 2]) / s0,
        (r[0, 2] - r[2, 0]) / s0,
        (r[1, 0] - r[0, 1]) / s0,
    ])
    # case 1: r00 dominant
    s1 = jnp.sqrt(jnp.maximum(1.0 + r[0, 0] - r[1, 1] - r[2, 2], 1e-30)) * 2.0
    q1 = jnp.stack([
        (r[2, 1] - r[1, 2]) / s1,
        0.25 * s1,
        (r[0, 1] + r[1, 0]) / s1,
        (r[0, 2] + r[2, 0]) / s1,
    ])
    # case 2: r11 dominant
    s2 = jnp.sqrt(jnp.maximum(1.0 + r[1, 1] - r[0, 0] - r[2, 2], 1e-30)) * 2.0
    q2 = jnp.stack([
        (r[0, 2] - r[2, 0]) / s2,
        (r[0, 1] + r[1, 0]) / s2,
        0.25 * s2,
        (r[1, 2] + r[2, 1]) / s2,
    ])
    # case 3: r22 dominant
    s3 = jnp.sqrt(jnp.maximum(1.0 + r[2, 2] - r[0, 0] - r[1, 1], 1e-30)) * 2.0
    q3 = jnp.stack([
        (r[1, 0] - r[0, 1]) / s3,
        (r[0, 2] + r[2, 0]) / s3,
        (r[1, 2] + r[2, 1]) / s3,
        0.25 * s3,
    ])

    use0 = tr > 0.0
    use1 = (~use0) & (r[0, 0] > r[1, 1]) & (r[0, 0] > r[2, 2])
    use2 = (~use0) & (~use1) & (r[1, 1] > r[2, 2])
    q = jnp.where(use0, q0, jnp.where(use1, q1, jnp.where(use2, q2, q3)))
    return q


def quaternion_to_rotation_matrix(q):
    """orientation_tools.h:170-191 (note: returns the transpose of the
    direct DCM, matching the reference's coordinate-transform convention)."""
    e0, e1, e2, e3 = q[0], q[1], q[2], q[3]
    R = jnp.stack([
        1 - 2 * (e2 * e2 + e3 * e3),
        2 * (e1 * e2 - e0 * e3),
        2 * (e1 * e3 + e0 * e2),
        2 * (e1 * e2 + e0 * e3),
        1 - 2 * (e1 * e1 + e3 * e3),
        2 * (e2 * e3 - e0 * e1),
        2 * (e1 * e3 - e0 * e2),
        2 * (e2 * e3 + e0 * e1),
        1 - 2 * (e1 * e1 + e2 * e2),
    ]).reshape(3, 3)
    return R.T


def quat_to_rpy(q):
    """(roll, pitch, yaw) ZYX-Tait-Bryan from quaternion (orientation_tools.h:195-208)."""
    w, x, y, z = q[0], q[1], q[2], q[3]
    as_ = jnp.clip(2.0 * (x * z - w * y), -1.0, 1.0)
    roll = jnp.arctan2(2.0 * (x * w + y * z), 1 - 2 * (x * x + y * y))
    pitch = jnp.arcsin(-as_)  # note the reference's sign convention
    yaw = jnp.arctan2(2.0 * (z * w + x * y), 1 - 2 * (y * y + z * z))
    return jnp.stack([roll, pitch, yaw])


def rpy_to_quat(rpy):
    """orientation_tools.h:211-217."""
    return rotation_matrix_to_quaternion(rpy_to_rot_mat(rpy))


def rotation_matrix_to_rpy(R):
    """orientation_tools.h:235-241."""
    return quat_to_rpy(rotation_matrix_to_quaternion(R))


def quat_to_so3(q):
    """Quaternion → exponential coordinates (orientation_tools.h:223-232)."""
    w = q[0]
    v = q[1:4]
    theta = 2.0 * jnp.arccos(jnp.clip(w, -1.0, 1.0))
    sin_half = jnp.sqrt(jnp.maximum(1.0 - w * w, 0.0))
    scale = jnp.where(sin_half < 1e-7, 2.0, theta / jnp.maximum(sin_half, 1e-30))
    return v * scale


def quaternion_to_so3(q):
    """orientation_tools.h:349-364 — same map via asin(|v|), kept for parity."""
    v = q[1:4]
    n = jnp.linalg.norm(v)
    theta = 2.0 * jnp.arcsin(jnp.clip(n, -1.0, 1.0))
    scale = jnp.where(jnp.abs(theta) < 1e-7, 0.0,
                      theta / jnp.sin(theta / 2.0 + 1e-300))
    return v * scale


def so3_to_quat(so3):
    """Exponential coordinates → quaternion (orientation_tools.h:365-381)."""
    theta = jnp.linalg.norm(so3)
    small = theta < 1e-6
    safe = jnp.maximum(theta, 1e-30)
    w = jnp.cos(theta / 2.0)
    xyz = so3 / safe * jnp.sin(theta / 2.0)
    q = jnp.concatenate([w[None], xyz])
    qid = jnp.array([1.0, 0.0, 0.0, 0.0], dtype=q.dtype)
    return jnp.where(small, qid, q)


def quat_product(q1, q2):
    """Hamilton product (orientation_tools.h:272-283)."""
    r1, v1 = q1[0], q1[1:4]
    r2, v2 = q2[0], q2[1:4]
    r = r1 * r2 - jnp.dot(v1, v2)
    v = r1 * v2 + r2 * v1 + jnp.cross(v1, v2)
    return jnp.concatenate([r[None], v])


def quat_derivative(q, omega):
    """q̇ from body angular velocity, with the reference's drift-correction
    term (orientation_tools.h:250-267): q̇ = ½ Q(ω) q − k·err·q."""
    k = QUAT_DERIVATIVE_STABILIZATION
    quat_err = k * (1.0 - jnp.sum(q * q))
    w = jnp.concatenate([jnp.zeros_like(omega[:1]), omega])
    dq = 0.5 * quat_product(q, w)
    return dq + quat_err * q


def integrate_quat(quat, omega, dt):
    """Integrate dt of INERTIAL-frame angular velocity (orientation_tools.h:293-315):
    q ← normalize( exp(ω dt) ⊗ q )."""
    ang = jnp.linalg.norm(omega)
    axis = jnp.where(ang > 0, omega / jnp.maximum(ang, 1e-30),
                     jnp.array([1.0, 0.0, 0.0], dtype=quat.dtype))
    half = ang * dt / 2.0
    quat_d = jnp.concatenate([jnp.cos(half)[None], jnp.sin(half) * axis])
    q_new = quat_product(quat_d, quat)
    return q_new / jnp.linalg.norm(q_new)


def integrate_quat_implicit(quat, omega, dt):
    """Body-frame variant: q ← normalize( q ⊗ exp(ω dt) )
    (orientation_tools.h:324-347)."""
    ang = jnp.linalg.norm(omega)
    axis = jnp.where(ang > 0, omega / jnp.maximum(ang, 1e-30),
                     jnp.array([1.0, 0.0, 0.0], dtype=quat.dtype))
    half = ang * dt / 2.0
    quat_d = jnp.concatenate([jnp.cos(half)[None], jnp.sin(half) * axis])
    q_new = quat_product(quat, quat_d)
    return q_new / jnp.linalg.norm(q_new)


def homo_transformation(R, v):
    """4×4 homogeneous transform from (R, p) (orientation_tools.h:384-392)."""
    R = jnp.asarray(R)
    v = jnp.asarray(v).reshape(3)
    H = jnp.zeros((4, 4), dtype=R.dtype)
    H = H.at[:3, :3].set(R)
    H = H.at[:3, 3].set(v)
    H = H.at[3, 3].set(1.0)
    return H
