"""Staged (host-orchestrated) solver == fully-jitted batched solver.

The staged engine (solver/staged.py) must be numerically identical to
fused_hsddp_batched — same stage graphs, same masking, only the loop
driver differs (host Python vs lax control flow).
"""
import pytest
import numpy as np
import jax.numpy as jnp

from mhpc_minimal_env_tpu.runtime.locomotion import (
    MHPCProblem, X0_DEFAULT, default_problem,
)
from mhpc_minimal_env_tpu.solver.fused_hsddp_batched import (
    build_fused_solver_batched,
)
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


def test_staged_matches_batched():
    p = _tiny_problem()
    rng = np.random.default_rng(0)
    B = 3
    x0_b = jnp.asarray(
        X0_DEFAULT[None, :] + 0.01 * rng.normal(size=(B, 14))
    )

    solve_ref, _ = build_fused_solver_batched(
        list(p.specs), p.opt, p.vel_cmd, p.ground_height, p.height_cmd
    )
    solve_staged, _ = build_staged_solver(
        list(p.specs), p.opt, p.vel_cmd, p.ground_height, p.height_cmd
    )
    import jax

    ra = jax.jit(solve_ref)(x0_b)
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
