"""End-to-end golden test: the full HSDDP solve vs the reference binary's
default run (tests/golden/reference_run.npz, produced by mhpc_ctrl per
BASELINE.md).  Runs on the fused single-scan engine (the default).

Golden .txt files carry ~6 significant digits, so tolerances are set at the
dump quantization level for each quantity's magnitude.
"""
import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # full-size solves / multi-process: run with --runslow

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "reference_run.npz")


@pytest.fixture(scope="module")
def solved():
    from mhpc_minimal_env_tpu.runtime.locomotion import MHPCLocomotion

    loco = MHPCLocomotion()
    res = loco.solve()
    return loco, res


def test_terminal_violation(solved):
    _, res = solved
    # reference run log: "terminal constraint violation = 2.365e-02"
    assert abs(float(res.viol) - 2.365136e-2) < 5e-7
    assert not bool(res.aborted)


def test_state_control_gradient_match(solved):
    loco, res = solved
    g = np.load(GOLDEN)
    state, control, grad = loco.dump_arrays(res)
    # FB rows are 6-wide in the golden dump (NaN-padded) -> nanmax ignores
    assert np.nanmax(np.abs(state - g["state"])) < 2e-5
    assert np.nanmax(np.abs(control - g["control"])) < 1e-3  # the SLO bound
    assert np.nanmax(np.abs(grad - g["gradient"])) < 1e-2   # |G| ~ 1e3


def test_cost_dump_matches_golden(solved):
    """cost.txt rows (running-cost gradient lx for k<N-1, terminal Phix at
    the phase end — MHPCLocomotion.cpp:293-380 dump layout) vs the golden
    reference dump.  Golden carries ~6 sig figs; max|cost| ~ 2e2 puts the
    quantization floor near 1e-4."""
    loco, res = solved
    g = np.load(GOLDEN)
    lx = np.asarray(res.lin.lx)
    phix = np.asarray(res.lin.phix)
    rows = []
    for a, b, _ in loco.phase_slices():
        rows.append(np.concatenate([lx[a : b - 1], phix[b - 1 : b]], axis=0))
    cost_rows = np.concatenate(rows, axis=0)
    # FB rows are 6-wide in the golden dump (NaN-padded) -> nanmax ignores
    assert cost_rows.shape == g["cost"].shape
    assert np.nanmax(np.abs(cost_rows - g["cost"])) < 2e-3


def test_control_rows_at_phase_ends_are_zero(solved):
    loco, res = solved
    # the reference never writes u at the terminal gridpoint of a phase
    for a, b, _ in loco.phase_slices():
        assert np.all(np.asarray(res.nominal.u[b - 1]) == 0.0)


def test_phase_engine_agrees_with_fused():
    """The per-phase engine (structural mirror of the reference) and the
    fused engine produce the same solution on a reduced problem."""
    import jax.numpy as jnp
    from mhpc_minimal_env_tpu.runtime.locomotion import (
        MHPCLocomotion, MHPCProblem, default_problem,
    )
    from mhpc_minimal_env_tpu.types import HSDDPOptions

    problem = default_problem(
        n_wbphase=2, n_fbphase=1,
        opt=HSDDPOptions(max_AL_iter=1, max_DDP_iter=2),
    )
    fused = MHPCLocomotion(problem, engine="fused")
    phase = MHPCLocomotion(problem, engine="phase")
    rf = fused.solve()
    rp = phase.solve()
    assert abs(float(rf.cost) - float(rp.cost)) < 1e-6
    assert abs(float(rf.viol) - float(rp.viol)) < 1e-9
    xf = fused.phase_arrays(rf, "u")
    xp = phase.phase_arrays(rp, "u")
    for a, b in zip(xf, xp):
        assert np.abs(a - b).max() < 1e-8
