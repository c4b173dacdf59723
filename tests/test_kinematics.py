"""Kinematics-layer tests.

Foot positions/Jacobians are already validated against the reference's
generated kernels in test_dynamics.py (Jacob_F/Jacob_B probes); here we
cover the link-level API added for full parity: homogeneous transforms
(PlanarQuadruped::get_homoTransformation, PlanarQuadruped.cpp:140-174),
contact positions (get_contact_position, :177-186), and per-link
contact-point Jacobians (the Link0..4Jacobian kernel capability that the
reference compiles but stubs out, PlanarQuadruped.h:72).
"""
import jax
import jax.numpy as jnp
import numpy as np

from mhpc_minimal_env_tpu.models import kinematics as K


def random_q(n=16, seed=0):
    rng = np.random.default_rng(seed)
    q = rng.uniform(-1.0, 1.0, size=(n, 7))
    q[:, 0] *= 2.0
    return jnp.asarray(q)


def test_homo_transforms_match_link_frames():
    for q in random_q():
        Hs = K.homo_transforms(q)
        origins, angles = K.link_frames(q)
        assert Hs.shape == (7, 4, 4)
        for i in range(7):
            # translation embeds (x, 0, z)
            np.testing.assert_allclose(Hs[i, 0, 3], origins[i, 0], atol=1e-14)
            np.testing.assert_allclose(Hs[i, 1, 3], 0.0, atol=1e-14)
            np.testing.assert_allclose(Hs[i, 2, 3], origins[i, 1], atol=1e-14)
            # rotation block is coordinateRotation(Y, -angle)
            c, s = np.cos(angles[i]), np.sin(angles[i])
            np.testing.assert_allclose(
                Hs[i, :3, :3], [[c, 0, s], [0, 1, 0], [-s, 0, c]], atol=1e-14
            )
            np.testing.assert_allclose(Hs[i, 3], [0, 0, 0, 1], atol=1e-15)


def test_contact_position_zero_loc_is_frame_origin():
    q = random_q(1)[0]
    origins, _ = K.link_frames(q)
    for link in range(7):
        p = K.contact_position(q, link, jnp.zeros(2))
        np.testing.assert_allclose(p, origins[link], atol=1e-14)


def test_contact_position_knee_tip_is_foot():
    # A point (0, -kneeLinkLength) on the knee link is the foot.
    for q in random_q(4, seed=1):
        tip = jnp.array([0.0, -K.KNEE_LINK_LENGTH])
        np.testing.assert_allclose(
            K.contact_position(q, K.F_KNEE, tip), K.front_foot_position(q),
            atol=1e-13,
        )
        np.testing.assert_allclose(
            K.contact_position(q, K.H_KNEE, tip), K.hind_foot_position(q),
            atol=1e-13,
        )


def test_contact_position_via_homo_transform():
    # get_contact_position semantics: p = (H @ (lx, 0, lz, 1))[(0, 2)]
    q = random_q(1, seed=2)[0]
    loc = jnp.array([0.07, -0.12])
    for link in range(7):
        H = K.homo_transforms(q)[link]
        p4 = H @ jnp.array([loc[0], 0.0, loc[1], 1.0])
        np.testing.assert_allclose(
            K.contact_position(q, link, loc), p4[jnp.array([0, 2])], atol=1e-13
        )


def test_link_jacobian_matches_foot_jacobian():
    rng = np.random.default_rng(3)
    for q in random_q(4, seed=3):
        qd = jnp.asarray(rng.normal(size=7))
        tip = jnp.array([0.0, -K.KNEE_LINK_LENGTH])
        Jf, Jdf = K.link_jacobian(q, qd, K.F_KNEE, tip)
        Jf_ref, Jdf_ref = K.front_foot_jacobian(q, qd)
        np.testing.assert_allclose(Jf, Jf_ref, atol=1e-12)
        np.testing.assert_allclose(Jdf, Jdf_ref, atol=1e-12)


def test_link_jacobian_finite_difference():
    rng = np.random.default_rng(4)
    q = jnp.asarray(rng.normal(size=7) * 0.5)
    qd = jnp.asarray(rng.normal(size=7))
    loc = jnp.array([0.05, -0.1])
    for link in (K.BODY, K.F_HIP, K.F_KNEE, K.H_HIP, K.H_KNEE):
        J, Jd = K.link_jacobian(q, qd, link, loc)
        eps = 1e-6
        J_fd = np.zeros((2, 7))
        for j in range(7):
            dq = np.zeros(7)
            dq[j] = eps
            J_fd[:, j] = (
                K.contact_position(q + dq, link, loc)
                - K.contact_position(q - dq, link, loc)
            ) / (2 * eps)
        np.testing.assert_allclose(J, J_fd, atol=1e-8)
        # Jd: d/dt J(q(t)) along qd
        Jp, _ = K.link_jacobian(q + eps * qd, qd, link, loc)
        Jm, _ = K.link_jacobian(q - eps * qd, qd, link, loc)
        np.testing.assert_allclose(Jd, (Jp - Jm) / (2 * eps), atol=1e-7)


def test_link_jacobian_traced_link_index():
    # link index may be a traced value (gather-based implementation)
    q = random_q(1, seed=5)[0]
    qd = jnp.ones(7)
    loc = jnp.zeros(2)
    f = jax.jit(lambda l: K.link_jacobian(q, qd, l, loc)[0])
    for link in range(5):
        np.testing.assert_allclose(
            f(jnp.asarray(link)), K.link_jacobian(q, qd, link, loc)[0], atol=1e-13
        )
