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
