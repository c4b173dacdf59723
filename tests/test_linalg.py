"""Unit tests for the unrolled small-matrix linear algebra (ops/linalg.py)."""
import numpy as np
import jax
import jax.numpy as jnp

from mhpc_minimal_env_tpu.ops import linalg as LA


def _spd(n, rng, batch=()):
    A = rng.normal(size=batch + (n, n))
    return A @ np.swapaxes(A, -1, -2) + n * np.eye(n)


def test_cholesky_and_solve():
    rng = np.random.default_rng(0)
    for n in (2, 4, 7, 9):
        A = _spd(n, rng)
        L = np.asarray(LA.cholesky_unrolled(jnp.asarray(A)))
        assert np.abs(L @ L.T - A).max() < 1e-10
        b = rng.normal(size=n)
        x = np.asarray(LA.spd_solve(jnp.asarray(A), jnp.asarray(b)))
        assert np.abs(A @ x - b).max() < 1e-9
        B = rng.normal(size=(n, 3))
        X = np.asarray(LA.cho_solve(jnp.asarray(L), jnp.asarray(B)))
        assert np.abs(A @ X - B).max() < 1e-9


def test_cholesky_batched_vmap():
    rng = np.random.default_rng(1)
    A = _spd(7, rng, batch=(16,))
    L = np.asarray(jax.vmap(LA.cholesky_unrolled)(jnp.asarray(A)))
    assert np.abs(L @ np.swapaxes(L, -1, -2) - A).max() < 1e-10


def test_inv4_matches_numpy():
    rng = np.random.default_rng(2)
    A = rng.normal(size=(50, 4, 4)) + 4 * np.eye(4)
    inv = np.asarray(jax.vmap(LA.inv4)(jnp.asarray(A)))
    assert np.abs(inv @ A - np.eye(4)).max() < 1e-9


def test_is_pd_chol():
    A = jnp.eye(4) * 2.0
    assert bool(LA.is_pd_chol(A))
    B = jnp.diag(jnp.array([1.0, -0.5, 2.0, 3.0]))
    assert not bool(LA.is_pd_chol(B))
    # the reference's -1e-9 shift: zero matrix must fail
    assert not bool(LA.is_pd_chol(jnp.zeros((4, 4)), shift=1e-9))


# ---------------------------------------------------------------------------
# channel-last variants: (rows, cols, B) with batch minor must match the
# batch-major forms bit-for-bit in f64 (same multiply pairing / reduce axes
# — see ops/linalg.py channel-last section)
# ---------------------------------------------------------------------------

def _cl(a):  # (B, r, c) -> (r, c, B)
    return jnp.moveaxis(jnp.asarray(a), 0, -1)


def test_channel_last_matmuls_match_batch_major():
    rng = np.random.default_rng(3)
    B = 9
    X = rng.normal(size=(B, 14, 14))
    Y = rng.normal(size=(B, 14, 4))
    v = rng.normal(size=(B, 14))
    mm = np.asarray(LA.mm(jnp.asarray(X), jnp.asarray(Y)))
    np.testing.assert_array_equal(
        np.moveaxis(np.asarray(LA.mm_cl(_cl(X), _cl(Y))), -1, 0), mm)
    mtm = np.asarray(LA.mm(jnp.swapaxes(jnp.asarray(Y), -1, -2),
                           jnp.asarray(X)))
    np.testing.assert_allclose(
        np.moveaxis(np.asarray(LA.mtm_cl(_cl(Y), _cl(X))), -1, 0), mtm,
        rtol=0, atol=1e-13)
    mv = np.asarray(LA.mv(jnp.asarray(X), jnp.asarray(v)))
    np.testing.assert_array_equal(
        np.moveaxis(np.asarray(LA.mv_cl(_cl(X), jnp.asarray(v).T)), -1, 0),
        mv)
    mtv = np.asarray(LA.mv(jnp.swapaxes(jnp.asarray(X), -1, -2),
                           jnp.asarray(v)))
    np.testing.assert_allclose(
        np.moveaxis(np.asarray(LA.mtv_cl(_cl(X), jnp.asarray(v).T)), -1, 0),
        mtv, rtol=0, atol=1e-13)


def test_inv4_cl_matches_inv4():
    rng = np.random.default_rng(4)
    A = rng.normal(size=(40, 4, 4)) + 4 * np.eye(4)
    ref = np.asarray(jax.vmap(LA.inv4)(jnp.asarray(A)))
    cl = np.moveaxis(np.asarray(LA.inv4_cl(_cl(A))), -1, 0)
    np.testing.assert_array_equal(cl, ref)


def test_is_pd_chol_cl_matches():
    rng = np.random.default_rng(5)
    A = rng.normal(size=(30, 4, 4))
    A = A @ np.swapaxes(A, -1, -2) + 0.05 * np.eye(4)
    A[::3] -= 0.5 * np.eye(4)  # make some indefinite
    ref = np.asarray(jax.vmap(lambda a: LA.is_pd_chol(a, shift=1e-9))(
        jnp.asarray(A)))
    cl = np.asarray(LA.is_pd_chol_cl(_cl(A), shift=1e-9))
    np.testing.assert_array_equal(cl, ref)
