"""Staged (host-orchestrated) solver == vmap of the per-scenario solver.

The staged engine (solver/staged.py) must be numerically identical to
jit(vmap(fused_hsddp.solve)) — same update equations, same masking, only
the loop driver (host Python vs lax control flow) and the memory layout
(channel-last vs batch-leading) differ.  This hop replaced the retired
batch-native mirror `fused_hsddp_batched` as the cross-engine oracle
(VERDICT r4 item 4); fused==phase coverage lives in test_golden_solve.
"""
import pytest
import numpy as np
import jax.numpy as jnp

from mhpc_minimal_env_tpu.runtime.locomotion import (
    MHPCProblem, X0_DEFAULT, default_problem,
)
from mhpc_minimal_env_tpu.solver.fused_hsddp import build_fused_solver
from mhpc_minimal_env_tpu.solver.staged import build_staged_solver
from mhpc_minimal_env_tpu.types import HSDDPOptions, PhaseSpec

pytestmark = pytest.mark.slow  # full-size solves / multi-process: run with --runslow


def _tiny_problem():
    specs = (
        PhaseSpec(model="wb", mode=1, n_steps=6, dt=1e-3),
        PhaseSpec(model="wb", mode=2, n_steps=6, dt=1e-3),
        PhaseSpec(model="fb", mode=3, n_steps=6, dt=1e-3),
    )
    return MHPCProblem(
        specs=specs, opt=HSDDPOptions(max_AL_iter=2, max_DDP_iter=2),
        vel_cmd=1.5, ground_height=-0.404, height_cmd=0.0,
    )


def test_staged_matches_vmap():
    p = _tiny_problem()
    rng = np.random.default_rng(0)
    B = 3
    x0_b = jnp.asarray(
        X0_DEFAULT[None, :] + 0.01 * rng.normal(size=(B, 14))
    )

    solve_ref, _ = build_fused_solver(
        list(p.specs), p.opt, p.vel_cmd, p.ground_height, p.height_cmd
    )
    solve_staged, _ = build_staged_solver(
        list(p.specs), p.opt, p.vel_cmd, p.ground_height, p.height_cmd
    )
    import jax

    ra = jax.jit(jax.vmap(solve_ref))(x0_b)
    rb = solve_staged(x0_b)

    # Tolerance: the staged engine stores trajectories/linearization
    # CHANNEL-LAST (T, ., B); identical update equations, but XLA's
    # layout-dependent reduction vectorization perturbs f64 association at
    # the ~1e-13-relative level.  1e-9 is still ~6 orders below any
    # semantic divergence (a wrong branch/threshold shows up as O(1e-3+)
    # through the iterate path's ~1e12x noise amplification — see
    # tools/decision_slack.py).
    np.testing.assert_allclose(np.asarray(ra.cost), np.asarray(rb.cost),
                               rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(np.asarray(ra.viol), np.asarray(rb.viol),
                               rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(np.asarray(ra.nominal.u),
                               np.moveaxis(np.asarray(rb.nominal.u), -1, 0),
                               rtol=1e-9, atol=1e-8)
    np.testing.assert_allclose(np.asarray(ra.nominal.x),
                               np.moveaxis(np.asarray(rb.nominal.x), -1, 0),
                               rtol=1e-9, atol=1e-8)
    assert np.array_equal(np.asarray(ra.aborted), np.asarray(rb.aborted))


def test_structured_constraints_bit_equal_dense():
    """The structured barrier path (torque rows as -+u + 33, weightless
    joint rows elided, GRF rows via the 3 Cy rows) must reproduce the
    dense 19-row constraint algebra BIT-for-bit: every elided term is an
    exact float 0.0 and every kept partial sum keeps its association (see
    fused.make_fused_engine).  Any reassociation would amplify ~1e12x
    through the iterate path and show up here as O(1e-3)."""
    p = _tiny_problem()
    rng = np.random.default_rng(7)
    x0_b = jnp.asarray(X0_DEFAULT[None, :] + 0.01 * rng.normal(size=(3, 14)))
    r_s = build_staged_solver(
        list(p.specs), p.opt, p.vel_cmd, p.ground_height, p.height_cmd,
        structured_constraints=True)[0](x0_b)
    r_d = build_staged_solver(
        list(p.specs), p.opt, p.vel_cmd, p.ground_height, p.height_cmd,
        structured_constraints=False)[0](x0_b)
    np.testing.assert_array_equal(np.asarray(r_s.cost), np.asarray(r_d.cost))
    np.testing.assert_array_equal(np.asarray(r_s.viol), np.asarray(r_d.viol))
    np.testing.assert_array_equal(np.asarray(r_s.nominal.u),
                                  np.asarray(r_d.nominal.u))


def test_budget_override_reuses_stages_and_deepens():
    """solve_batched(max_al=, max_ddp=) runs a deeper budget through the
    SAME compiled stage graphs (the budget lives in host loops only) and
    must (a) equal the built-in budget when passed the default values,
    (b) not worsen the constraint violation when deepened — the two-tier
    fleet remedy (PERF.md §17) rests on both properties."""
    p = _tiny_problem()
    rng = np.random.default_rng(2)
    x0_b = jnp.asarray(X0_DEFAULT[None, :] + 0.01 * rng.normal(size=(3, 14)))
    solve, _ = build_staged_solver(
        list(p.specs), p.opt, p.vel_cmd, p.ground_height, p.height_cmd)
    r_def = solve(x0_b)
    r_same = solve(x0_b, max_al=p.opt.max_AL_iter, max_ddp=p.opt.max_DDP_iter)
    np.testing.assert_array_equal(np.asarray(r_def.cost),
                                  np.asarray(r_same.cost))
    r_deep = solve(x0_b, max_al=3, max_ddp=4)
    assert np.all(np.isfinite(np.asarray(r_deep.cost)))
    # deeper budget: violation not meaningfully worse on any live lane
    # (AL convergence is near- but not strictly monotone per iteration)
    ok = ~np.asarray(r_deep.aborted)
    assert np.all(np.asarray(r_deep.viol)[ok]
                  <= np.asarray(r_def.viol)[ok] + 0.05)


@pytest.mark.parametrize("K", [1, 2])
def test_ls_fastpath_prefix_matches_full_sweep(K):
    """The K-candidate fused line-search probe (+ remaining-candidates
    fallback) must reproduce the full sequential sweep exactly: the
    first-accepted-in-sequence semantics of MultiPhaseDDP.cpp:130-151 are
    preserved for ANY prefix width, and the fallback's stacked cost table
    reuses the probe's trial costs verbatim.  K=1 makes the fallback
    branch fire whenever any lane's accepted step is below eps=1 (on the
    default workload the accepted eps is frequently the second candidate —
    tools/decision_slack.py)."""
    p = _tiny_problem()
    rng = np.random.default_rng(1)
    B = 4
    x0_b = jnp.asarray(X0_DEFAULT[None, :] + 0.01 * rng.normal(size=(B, 14)))

    solve_full, _ = build_staged_solver(
        list(p.specs), p.opt, p.vel_cmd, p.ground_height, p.height_cmd,
        ls_fastpath=0)
    solve_k, _ = build_staged_solver(
        list(p.specs), p.opt, p.vel_cmd, p.ground_height, p.height_cmd,
        ls_fastpath=K)
    ra, rb = solve_full(x0_b), solve_k(x0_b)
    np.testing.assert_allclose(np.asarray(ra.cost), np.asarray(rb.cost),
                               rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(np.asarray(ra.viol), np.asarray(rb.viol),
                               rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(np.asarray(ra.nominal.u),
                               np.asarray(rb.nominal.u),
                               rtol=1e-9, atol=1e-9)
    assert np.array_equal(np.asarray(ra.aborted), np.asarray(rb.aborted))
