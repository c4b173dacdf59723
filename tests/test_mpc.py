"""Receding-horizon MPC driver test (tiny problem: 1 WB + 1 FB phase)."""
import pytest
import numpy as np
import jax.numpy as jnp

from mhpc_minimal_env_tpu.runtime.mpc import RecedingHorizonMPC
from mhpc_minimal_env_tpu.runtime.locomotion import X0_DEFAULT
from mhpc_minimal_env_tpu.types import HSDDPOptions

pytestmark = pytest.mark.slow  # full-size solves / multi-process: run with --runslow


def test_mpc_cycles_advance_plant():
    mpc = RecedingHorizonMPC(
        n_wbphase=1, n_fbphase=1,
        opt=HSDDPOptions(max_AL_iter=1, max_DDP_iter=1),
    )
    out = mpc.run(X0_DEFAULT, n_cycles=2, cmode=1)
    assert len(out) == 2
    for res in out:
        assert np.all(np.isfinite(np.asarray(res.x_exec)))
        assert np.isfinite(float(res.cost))
    # plant advanced: states change across the executed horizon
    assert float(jnp.abs(out[0].x_exec[0] - out[0].x_exec[-1]).max()) > 1e-4
    # cycle 2 starts from cycle 1's terminal state through the reset map
    assert np.allclose(
        np.asarray(out[1].x_exec[0]), np.asarray(out[0].x_next), atol=1e-12
    )


def test_mpc_first_cycle_budget():
    """first_cycle_budget deepens ONLY the cold-start solve (the
    productized tail remedy, PERF.md §17): with a deliberately starved
    default budget (1 DDP iteration), granting cycle 0 more iterations
    must not hurt — and later cycles still run the default budget (same
    compiled stages; the call only changes host loop counts)."""
    mpc = RecedingHorizonMPC(
        n_wbphase=1, n_fbphase=1, duration_scale=0.1,
        opt=HSDDPOptions(max_AL_iter=1, max_DDP_iter=1),
    )
    rng = np.random.default_rng(5)
    x0_b = X0_DEFAULT[None, :] + 0.005 * rng.normal(size=(2, 14))
    out_def = mpc.run_batched(x0_b, n_cycles=2)
    # same AL count, deeper DDP: within one AL iteration the line search
    # only ever accepts cost decreases, so cycle-0 cost is comparable
    out_deep = mpc.run_batched(x0_b, n_cycles=2, first_cycle_budget=(1, 3))
    for o in (out_def, out_deep):
        assert np.all(np.isfinite(np.asarray(o[0].cost)))
    # the deeper cycle-0 budget was actually applied: more DDP iterations
    # move the (unconverged at 1 iteration) solution
    assert not np.allclose(np.asarray(out_def[0].cost),
                           np.asarray(out_deep[0].cost))
    # and it improves (or preserves) the cycle-0 objective per live lane
    assert np.all(np.asarray(out_deep[0].cost)
                  <= np.asarray(out_def[0].cost) + 1e-9)


def test_mpc_run_batched_matches_single():
    """run_batched lane semantics == the single-scenario loop.

    Runs at the production dt=1e-3 with duration_scale-shrunk horizons:
    the bounding-PD warm start is Euler-unstable at coarsened dt, which in
    round 1 made this test compare diverged (1e15-magnitude) plants."""
    mpc = RecedingHorizonMPC(
        n_wbphase=1, n_fbphase=1, duration_scale=0.1,
        opt=HSDDPOptions(max_AL_iter=1, max_DDP_iter=1),
    )
    rng = np.random.default_rng(3)
    x0_b = X0_DEFAULT[None, :] + 0.005 * rng.normal(size=(3, 14))
    out_b = mpc.run_batched(x0_b, n_cycles=2)
    assert len(out_b) == 2
    # sanity: the plants stayed bounded (the round-1 failure mode)
    assert float(np.max(np.abs(np.asarray(out_b[-1].x_next)))) < 1e3
    for lane in range(3):
        out_s = mpc.run(x0_b[lane], n_cycles=2)
        for cyc in range(2):
            np.testing.assert_allclose(
                np.asarray(out_b[cyc].u_exec[lane]),
                np.asarray(out_s[cyc].u_exec), atol=1e-9,
            )
            np.testing.assert_allclose(
                np.asarray(out_b[cyc].x_next[lane]),
                np.asarray(out_s[cyc].x_next), atol=1e-9,
            )
            # warm_x/warm_u are CHANNEL-LAST (T, ch, B) in the batch: run()
            # must slice lane `0` off the TRAILING axis (round-3 advisor
            # finding: a uniform tree-map a[0] returned gridpoint 0)
            T = out_b[cyc].warm_x.shape[0]
            assert out_s[cyc].warm_x.shape == (T, 14)
            assert out_s[cyc].warm_u.shape == (T, 4)
            np.testing.assert_allclose(
                np.asarray(out_b[cyc].warm_u[..., lane]),
                np.asarray(mpc.run(x0_b[lane], n_cycles=cyc + 1)[-1].warm_u),
                atol=1e-9,
            )
