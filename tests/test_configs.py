"""The five named BASELINE workload configs: structure + tiny-size smoke.

Full-size runs live in tools/bench_configs.py; here each config's problem
builder is exercised at test-friendly scale on the CPU mesh.
"""
import pytest
import numpy as np
import jax.numpy as jnp

from mhpc_minimal_env_tpu.configs import (
    CONFIGS, multi_phase_bounding_problem, wb_only_extended_problem,
)
from mhpc_minimal_env_tpu.runtime.locomotion import MHPCLocomotion, X0_DEFAULT
from mhpc_minimal_env_tpu.types import HSDDPOptions

# only the solve-running tests are slow; the pure registry / structure
# checks stay in the default fast tier so registry drift is caught there
slow = pytest.mark.slow


def test_config_registry_complete():
    assert set(CONFIGS) == {
        "mhpc_ctrl_default", "wb_only_extended", "multi_phase_bounding",
        "batched_mpc", "latency", "pod_sweep",
    }


def test_wb_only_extended_problem_structure():
    p = wb_only_extended_problem()
    assert all(s.model == "wb" for s in p.specs)
    assert len(p.specs) == 8
    assert tuple(s.mode for s in p.specs) == (1, 2, 3, 4, 1, 2, 3, 4)
    assert p.opt.DDP_thresh <= 1e-6  # tightened convergence


@slow
def test_wb_only_solve_tiny():
    """WB-only (no hierarchy) problem solves: 4 WB phases at production dt
    with shortened horizons (the PD warm start is only Euler-stable near
    dt=1e-3; see wb_only_extended_problem docstring)."""
    p = wb_only_extended_problem(
        n_cycles=1, duration_scale=0.2,
        opt=HSDDPOptions(max_AL_iter=1, max_DDP_iter=2),
    )
    loco = MHPCLocomotion(p)
    res = loco.solve(X0_DEFAULT)
    assert not bool(res.aborted)
    assert np.isfinite(float(res.cost))
    assert np.all(np.isfinite(np.asarray(res.nominal.u)))


@slow
def test_wb_only_graceful_abort_on_unstable_dt():
    """At dt=0.01 the bounding-PD warm-start rollout diverges (explicit
    Euler with the k=2200 leg spring is unstable for dt >= ~2e-3) — the
    solver must flag `aborted` instead of raising, mirroring the
    reference's backward-sweep abort path (MultiPhaseDDP.cpp:221-226)."""
    p = wb_only_extended_problem(
        n_cycles=1, dt=0.01,
        opt=HSDDPOptions(max_AL_iter=1, max_DDP_iter=1),
    )
    loco = MHPCLocomotion(p)
    res = loco.solve(X0_DEFAULT)
    assert bool(res.aborted)


def test_multi_phase_bounding_problem_structure():
    p = multi_phase_bounding_problem()
    models = [s.model for s in p.specs]
    assert models == ["wb"] * 4 + ["fb"] * 2
    # both impact seams (after modes 2 and 4) inside the WB chain
    assert 2 in [s.mode for s in p.specs[:4]]
    assert 4 in [s.mode for s in p.specs[:4]]
