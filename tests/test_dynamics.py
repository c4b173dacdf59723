"""Golden tests: JAX dynamics vs the reference's generated CasADi kernels.

Probes in tests/golden/kernel_probes.npz were captured by evaluating every
generated kernel (Dyn_*, Imp_*, Jacob_*, WB_FL*_terminal_constr, FBDynamics)
at 400 random states through the reference's own casadi_interface scatter
(see tools/pack_golden.py).  These are the reference's ground truth; our
model must reproduce them to float64 round-off (the kernels accumulate
~1e-9 absolute error at |qdd| ~ 1e3, i.e. ~1e-12 relative).
"""
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mhpc_minimal_env_tpu.models import kinematics as K
from mhpc_minimal_env_tpu.models import quadruped as Q
from mhpc_minimal_env_tpu.models import floating_base as FB

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "kernel_probes.npz")


@pytest.fixture(scope="module")
def probes():
    return np.load(GOLDEN)


def colmajor(a, n, r, c):
    return a.reshape(n, c, r).transpose(0, 2, 1)


def test_foot_jacobians(probes):
    X = probes["x"]
    n = X.shape[0]
    for key, fn in [("jac_f", K.front_foot_jacobian), ("jac_b", K.hind_foot_jacobian)]:
        J, Jd = jax.jit(jax.vmap(fn))(X[:, :7], X[:, 7:])
        ref = probes[key]
        assert np.abs(np.asarray(J) - colmajor(ref[:, :14], n, 2, 7)).max() < 1e-12
        assert np.abs(np.asarray(Jd) - colmajor(ref[:, 14:], n, 2, 7)).max() < 1e-12


@pytest.mark.parametrize(
    "key,mode", [("dyn_fl", 2), ("dyn_bs", 1), ("dyn_fs", 3)]
)
def test_wb_continuous_dynamics(probes, key, mode):
    X, U = probes["x"], probes["u"]
    xdot, y = jax.jit(jax.vmap(lambda x, u: Q.wb_xdot(x, u, mode)))(X, U)
    ref = probes[key]
    assert np.abs(np.asarray(xdot) - ref[:, :14]).max() < 1e-7
    assert np.abs(np.asarray(y) - ref[:, 14:]).max() < 1e-8


@pytest.mark.parametrize("key,mode", [("par_fl", 2), ("par_bs", 1), ("par_fs", 3)])
def test_wb_dynamics_partials(probes, key, mode):
    n = 60
    X, U = probes["x"][:n], probes["u"][:n]
    dt = 1e-3

    def jac(x, u):
        return Q.wb_step_jac(x, u, mode, dt)

    A, B, C, D = jax.jit(jax.vmap(jac))(X, U)
    ref = probes[key][:n]
    refAc = colmajor(ref[:, :196], n, 14, 14)
    refBc = colmajor(ref[:, 196:252], n, 14, 4)
    refC = colmajor(ref[:, 252:308], n, 4, 14)
    refD = colmajor(ref[:, 308:324], n, 4, 4)
    eye = np.eye(14)
    assert np.abs(np.asarray(A) - (eye + refAc * dt)).max() < 1e-9
    assert np.abs(np.asarray(B) - refBc * dt).max() < 1e-9
    assert np.abs(np.asarray(C) - refC).max() < 1e-7
    assert np.abs(np.asarray(D) - refD).max() < 1e-9


@pytest.mark.parametrize("key,mode", [("imp_f", 2), ("imp_b", 4)])
def test_impact_maps(probes, key, mode):
    X = probes["x"]
    xn, y = jax.jit(jax.vmap(lambda x: Q.resetmap(x, mode)))(X)
    ref = probes[key]
    assert np.abs(np.asarray(xn) - ref[:, :14]).max() < 1e-8
    assert np.abs(np.asarray(y) - ref[:, 14:]).max() < 1e-9


@pytest.mark.parametrize("key,mode", [("imp_f_par", 2), ("imp_b_par", 4)])
def test_impact_jacobians(probes, key, mode):
    n = 60
    X = probes["x"][:n]
    Px = jax.jit(jax.vmap(lambda x: Q.resetmap_jac(x, mode)))(X)
    refPx = colmajor(probes[key][:n], n, 14, 14)
    assert np.abs(np.asarray(Px) - refPx).max() < 1e-8


@pytest.mark.parametrize("key,mode", [("tc1", 2), ("tc2", 4)])
def test_touchdown_constraints(probes, key, mode):
    X = probes["x"]
    n = X.shape[0]

    def f(x):
        return Q.touchdown_constraint_jac(x, mode, -0.404)

    h, hx, hxx = jax.jit(jax.vmap(f))(X)
    ref = probes[key]
    assert np.abs(np.asarray(h) - ref[:, 0]).max() < 1e-12
    assert np.abs(np.asarray(hx) - ref[:, 1:15]).max() < 1e-12
    assert np.abs(np.asarray(hxx) - colmajor(ref[:, 15:], n, 14, 14)).max() < 1e-12


def test_fb_dynamics_matches_kernel_formula(probes):
    # FBDynamics.c is short enough to transcribe: validate against a direct
    # reimplementation of its arithmetic at random points.
    rng = np.random.default_rng(0)
    x = rng.normal(size=(100, 6))
    u = rng.normal(size=(100, 4)) * 50
    ph = rng.normal(size=(100, 4))
    for mode in (1, 2, 3, 4):
        contact = np.asarray(FB.CONTACT_TABLE)[mode - 1]
        xdot = jax.jit(jax.vmap(lambda a, b, c: FB.fb_continuous_dynamics(a, b, c, jnp.asarray(contact))))(x, u, ph)
        cF, cH = contact
        fx = (cF * u[:, 0] + cH * u[:, 2]) / FB.MASS
        fz = (cF * u[:, 1] + cH * u[:, 3]) / FB.MASS - FB.GRAVITY
        tau = (
            cF * ((ph[:, 1] - x[:, 1]) * u[:, 0] - (ph[:, 0] - x[:, 0]) * u[:, 1])
            + cH * ((ph[:, 3] - x[:, 1]) * u[:, 2] - (ph[:, 2] - x[:, 0]) * u[:, 3])
        ) / FB.IYY
        expect = np.stack([x[:, 3], x[:, 4], x[:, 5], fx, fz, tau], axis=1)
        assert np.abs(np.asarray(xdot) - expect).max() < 1e-12


def test_vmap_of_one_equals_unbatched(probes):
    x, u = probes["x"][0], probes["u"][0]
    a = Q.wb_xdot(jnp.asarray(x), jnp.asarray(u), 1)[0]
    b = jax.vmap(lambda xx, uu: Q.wb_xdot(xx, uu, 1)[0])(x[None], u[None])[0]
    # batching may reassociate reductions; demand agreement at round-off level
    assert np.abs(np.asarray(a) - np.asarray(b)).max() < 1e-10


def test_masked_dynamics_bitwise_equals_mode_branches():
    """The mode-unified masked-KKT dynamics (wb_xdot_masked) must equal the
    per-mode stance/flight dynamics BITWISE: the inactive contact rows
    reduce the 4x4 KKT solve to the same arithmetic as the per-foot 2x2
    solve (see _masked_kkt docstring)."""
    import jax
    import jax.numpy as jnp
    from mhpc_minimal_env_tpu.models import quadruped as Q

    rng = np.random.default_rng(7)
    xs = jnp.asarray(rng.normal(size=(20, 14)) * 0.6)
    us = jnp.asarray(rng.normal(size=(20, 4)) * 5.0)
    for mode in (1, 2, 3, 4):
        cf, ch = Q.WB_CONTACT[mode]
        ref = jax.jit(jax.vmap(lambda x, u: Q.wb_xdot(x, u, mode)))(xs, us)
        msk = jax.jit(jax.vmap(
            lambda x, u: Q.wb_xdot_masked(
                x, u, jnp.asarray(cf, x.dtype), jnp.asarray(ch, x.dtype))
        ))(xs, us)
        # eager evaluation is bit-identical (inactive-gate arithmetic is
        # exact); under jit XLA may reassociate/fuse the two graphs
        # differently, so allow ~1-ulp relative drift.
        np.testing.assert_allclose(np.asarray(ref[0]), np.asarray(msk[0]),
                                   rtol=1e-13, atol=1e-11)
        np.testing.assert_allclose(np.asarray(ref[1]) + 0.0,
                                   np.asarray(msk[1]) + 0.0,
                                   rtol=1e-13, atol=1e-11)


def test_masked_impact_bitwise_equals_resetmap():
    import jax
    import jax.numpy as jnp
    from mhpc_minimal_env_tpu.models import quadruped as Q

    rng = np.random.default_rng(8)
    xs = jnp.asarray(rng.normal(size=(20, 14)) * 0.6)
    for mode, (cf, ch) in ((2, (1.0, 0.0)), (4, (0.0, 1.0)),
                           (None, (0.0, 0.0))):
        msk = jax.jit(jax.vmap(
            lambda x: Q.impact_map_masked(
                x, jnp.asarray(cf, x.dtype), jnp.asarray(ch, x.dtype))
        ))(xs)
        if mode is None:  # zero gates: exact identity
            assert np.array_equal(np.asarray(xs), np.asarray(msk[0]))
            assert np.all(np.asarray(msk[1]) + 0.0 == 0.0)
        else:
            ref = jax.jit(jax.vmap(lambda x: Q.resetmap(x, mode)))(xs)
            np.testing.assert_allclose(np.asarray(ref[0]),
                                       np.asarray(msk[0]),
                                       rtol=1e-13, atol=1e-11)
            np.testing.assert_allclose(np.asarray(ref[1]) + 0.0,
                                       np.asarray(msk[1]) + 0.0,
                                       rtol=1e-13, atol=1e-11)


def test_analytic_wb_jacobians_match_jacfwd():
    """wb_jac_masked (the closed-form Dyn_*_par analog used by the
    production linearizer) == jacfwd of wb_xdot_masked to roundoff, for
    all three contact gate patterns."""
    import jax
    import jax.numpy as jnp
    from mhpc_minimal_env_tpu.models import quadruped as Q

    def ref(x, u, cf, ch):
        A, C = jax.jacfwd(lambda xx: Q.wb_xdot_masked(xx, u, cf, ch))(x)
        B, D = jax.jacfwd(lambda uu: Q.wb_xdot_masked(x, uu, cf, ch))(u)
        return A, B, C, D

    refs = jax.jit(jax.vmap(ref, in_axes=(0, 0, None, None)))
    ana = jax.jit(jax.vmap(Q.wb_jac_masked, in_axes=(0, 0, None, None)))
    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.normal(size=(50, 14)) * 0.5)
    u = jnp.asarray(rng.normal(size=(50, 4)) * 5.0)
    for cf, ch in [(0.0, 0.0), (1.0, 0.0), (0.0, 1.0)]:
        for name, r, a in zip("ABCD", refs(x, u, cf, ch), ana(x, u, cf, ch)):
            scale = max(1.0, float(np.abs(np.asarray(r)).max()))
            err = float(np.abs(np.asarray(r) - np.asarray(a)).max()) / scale
            assert err < 1e-12, (cf, ch, name, err)


def test_sym_dynamics_match_ad():
    """Generated closed-form model terms (models/sym_dynamics.py) ==
    the AD-over-kinematics path, for the full dynamics and the full
    Jacobian assembly, all contact gate patterns."""
    import jax
    import jax.numpy as jnp
    from mhpc_minimal_env_tpu.models import quadruped as Q

    rng = np.random.default_rng(12)
    x = jnp.asarray(rng.normal(size=(50, 14)) * 0.5)
    u = jnp.asarray(rng.normal(size=(50, 4)) * 5.0)
    for cf, ch in [(0.0, 0.0), (1.0, 0.0), (0.0, 1.0)]:
        ad = jax.jit(jax.vmap(
            Q.wb_xdot_masked, in_axes=(0, 0, None, None)))(x, u, cf, ch)
        sym = jax.jit(jax.vmap(
            Q.wb_xdot_masked_sym, in_axes=(0, 0, None, None)))(x, u, cf, ch)
        for a, s in zip(ad, sym):
            sc = max(1.0, float(np.abs(np.asarray(a)).max()))
            assert float(np.abs(np.asarray(a - s)).max()) / sc < 1e-12
        adj = jax.jit(jax.vmap(
            Q.wb_jac_masked, in_axes=(0, 0, None, None)))(x, u, cf, ch)
        symj = jax.jit(jax.vmap(
            Q.wb_jac_masked_sym, in_axes=(0, 0, None, None)))(x, u, cf, ch)
        for a, s in zip(adj, symj):
            sc = max(1.0, float(np.abs(np.asarray(a)).max()))
            assert float(np.abs(np.asarray(a - s)).max()) / sc < 1e-11
