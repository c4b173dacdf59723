"""Rotation-utility tests (reference capability: orientation_tools.h).

Checks algebraic identities, round-trips, and cross-consistency between the
quaternion / RPY / rotation-matrix / so3 representations, plus vmap safety
(the reference's 4-case quaternion extraction is an if/else ladder; ours
must give identical results under vmap).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mhpc_minimal_env_tpu.utils import orientation as ori
from mhpc_minimal_env_tpu.utils.math import almost_equal, square


def random_rpys(n=64, seed=0):
    rng = np.random.default_rng(seed)
    rpy = rng.uniform(-np.pi, np.pi, size=(n, 3))
    rpy[:, 1] = rng.uniform(-np.pi / 2 + 0.05, np.pi / 2 - 0.05, size=n)
    return jnp.asarray(rpy)


def test_coordinate_rotation_orthonormal():
    for axis in (0, 1, 2):
        R = ori.coordinate_rotation(axis, 0.37)
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-14)
        np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-14)


def test_coordinate_rotation_convention():
    # orientation_tools.h:54-57: coordinateRotation(X, .1) @ v expresses v
    # in a frame rotated by +.1 — i.e. rotates v by -.1.
    v = jnp.array([0.0, 1.0, 0.0])
    w = ori.coordinate_rotation(ori.AXIS_X, jnp.pi / 2) @ v
    np.testing.assert_allclose(w, [0.0, 0.0, -1.0], atol=1e-15)


def test_cross_matrix_roundtrip():
    v = jnp.array([0.3, -1.2, 2.5])
    S = ori.cross_matrix(v)
    w = jnp.array([1.0, 0.5, -0.25])
    np.testing.assert_allclose(S @ w, np.cross(v, w), atol=1e-15)
    np.testing.assert_allclose(ori.mat_to_skew_vec(S), v, atol=1e-15)
    assert ori.vector_to_skew_mat is ori.cross_matrix


def test_rpy_quat_rotmat_roundtrips():
    for rpy in random_rpys():
        R = ori.rpy_to_rot_mat(rpy)
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-12)
        q = ori.rotation_matrix_to_quaternion(R)
        np.testing.assert_allclose(np.linalg.norm(q), 1.0, atol=1e-12)
        R2 = ori.quaternion_to_rotation_matrix(q)
        np.testing.assert_allclose(R2, R, atol=1e-10)
        rpy2 = ori.quat_to_rpy(q)
        np.testing.assert_allclose(rpy2, rpy, atol=1e-9)
        q2 = ori.rpy_to_quat(rpy)
        np.testing.assert_allclose(
            np.abs(np.dot(q, q2)), 1.0, atol=1e-12
        )  # same rotation up to sign
        np.testing.assert_allclose(ori.rotation_matrix_to_rpy(R), rpy, atol=1e-9)


def test_quaternion_extraction_all_four_cases():
    # Large-angle rotations drive each Shepperd pivot case.
    for axis, ang in [(0, 3.1), (1, 3.1), (2, 3.1), (0, 0.1)]:
        R = ori.coordinate_rotation(axis, ang)
        q = ori.rotation_matrix_to_quaternion(R)
        np.testing.assert_allclose(
            ori.quaternion_to_rotation_matrix(q), R, atol=1e-10
        )


def test_quaternion_extraction_vmappable():
    rpys = random_rpys(32, seed=1)
    Rs = jax.vmap(ori.rpy_to_rot_mat)(rpys)
    qs_vmap = jax.vmap(ori.rotation_matrix_to_quaternion)(Rs)
    qs_loop = jnp.stack([ori.rotation_matrix_to_quaternion(R) for R in Rs])
    np.testing.assert_allclose(qs_vmap, qs_loop, atol=1e-14)


def test_so3_roundtrip():
    for rpy in random_rpys(16, seed=2):
        q = ori.rpy_to_quat(rpy)
        q = jnp.where(q[0] < 0, -q, q)  # canonical hemisphere
        so3 = ori.quat_to_so3(q)
        q2 = ori.so3_to_quat(so3)
        np.testing.assert_allclose(q2, q, atol=1e-9)
    # small-angle limit
    np.testing.assert_allclose(
        ori.so3_to_quat(jnp.zeros(3)), [1.0, 0.0, 0.0, 0.0], atol=1e-15
    )
    np.testing.assert_allclose(
        ori.quat_to_so3(jnp.array([1.0, 0.0, 0.0, 0.0])), np.zeros(3), atol=1e-12
    )


def test_quat_product_matches_rotation_composition():
    rpys = random_rpys(8, seed=3)
    for i in range(0, 8, 2):
        q1, q2 = ori.rpy_to_quat(rpys[i]), ori.rpy_to_quat(rpys[i + 1])
        q12 = ori.quat_product(q1, q2)
        R12 = ori.quaternion_to_rotation_matrix(q12)
        # coordinate-transform convention: R(q) = DCM(q)^T, so the
        # Hamilton product composes as R(q1 (x) q2) = R(q2) @ R(q1).
        R_ref = ori.quaternion_to_rotation_matrix(q2) @ ori.quaternion_to_rotation_matrix(q1)
        np.testing.assert_allclose(R12, R_ref, atol=1e-10)


def test_quat_derivative_and_integration():
    q = ori.rpy_to_quat(jnp.array([0.1, -0.2, 0.3]))
    omega = jnp.array([0.4, -0.1, 0.2])
    dq = ori.quat_derivative(q, omega)
    # unit quaternion: stabilization term vanishes; d|q|^2/dt = 2 q.dq = 0
    np.testing.assert_allclose(jnp.dot(q, dq), 0.0, atol=1e-12)

    # integrating inertial omega about Z by Euler-exact map = yaw increment
    qz = jnp.array([1.0, 0.0, 0.0, 0.0])
    out = ori.integrate_quat(qz, jnp.array([0.0, 0.0, 1.0]), 0.5)
    np.testing.assert_allclose(ori.quat_to_rpy(out)[2], 0.5, atol=1e-12)
    out_i = ori.integrate_quat_implicit(qz, jnp.array([0.0, 0.0, 1.0]), 0.5)
    np.testing.assert_allclose(out_i, out, atol=1e-12)  # same at identity

    # zero angular velocity is a fixed point
    np.testing.assert_allclose(ori.integrate_quat(q, jnp.zeros(3), 0.1), q, atol=1e-12)


def test_homo_transformation():
    R = ori.coordinate_rotation(1, 0.3)
    v = jnp.array([1.0, 2.0, 3.0])
    H = ori.homo_transformation(R, v)
    assert H.shape == (4, 4)
    np.testing.assert_allclose(H[:3, :3], R, atol=1e-15)
    np.testing.assert_allclose(H[:3, 3], v, atol=1e-15)
    np.testing.assert_allclose(H[3], [0, 0, 0, 1], atol=1e-15)


def test_math_utils():
    assert float(square(jnp.asarray(3.0))) == 9.0
    a = jnp.arange(6.0).reshape(2, 3)
    assert bool(almost_equal(a, a + 1e-9, 1e-6))
    assert not bool(almost_equal(a, a + 1e-3, 1e-6))


def test_rad_deg():
    np.testing.assert_allclose(ori.rad2deg(jnp.pi), 180.0, atol=1e-12)
    np.testing.assert_allclose(ori.deg2rad(jnp.asarray(180.0)), np.pi, atol=1e-12)
