"""Checkpointed sweep resume (orbax on the sweep carry)."""
import shutil

import numpy as np
import jax.numpy as jnp
import pytest

from mhpc_minimal_env_tpu.runtime.checkpoint import SweepRunner
from mhpc_minimal_env_tpu.runtime.locomotion import (
    MHPCLocomotion, MHPCProblem, X0_DEFAULT,
)
from mhpc_minimal_env_tpu.types import HSDDPOptions, PhaseSpec

pytestmark = pytest.mark.slow  # full-size solves / multi-process: run with --runslow


@pytest.fixture(scope="module")
def tiny_loco():
    specs = (
        PhaseSpec(model="wb", mode=1, n_steps=6, dt=1e-3),
        PhaseSpec(model="fb", mode=2, n_steps=6, dt=1e-3),
    )
    problem = MHPCProblem(
        specs=specs, opt=HSDDPOptions(max_AL_iter=1, max_DDP_iter=1),
        vel_cmd=1.5, ground_height=-0.404, height_cmd=0.0,
    )
    return MHPCLocomotion(problem, dtype=jnp.float64)


def test_sweep_resume(tiny_loco, tmp_path_factory):
    ckpt = str(tmp_path_factory.mktemp("ckpt"))
    rng = np.random.default_rng(0)
    scen = X0_DEFAULT[None, :] + 0.01 * rng.normal(size=(8, 14))

    # full run
    full = SweepRunner(tiny_loco, scen, chunk=4).run()

    # interrupted run: do one chunk, checkpoint, then resume in a new runner
    r1 = SweepRunner(tiny_loco, scen, chunk=4, ckpt_dir=ckpt)
    batch = scen[:4]
    res = tiny_loco.solve_batched(batch)
    r1.costs.append(np.asarray(res.cost))
    r1.viols.append(np.asarray(res.viol))
    r1.cursor = 4
    from mhpc_minimal_env_tpu.runtime.checkpoint import save_sweep_state
    save_sweep_state(ckpt, dict(cursor=np.asarray(4), costs=list(r1.costs),
                                viols=list(r1.viols)), 1)

    r2 = SweepRunner(tiny_loco, scen, chunk=4, ckpt_dir=ckpt)
    assert r2.cursor == 4
    resumed = r2.run()
    np.testing.assert_allclose(resumed["cost"], full["cost"], rtol=1e-12)
    shutil.rmtree(ckpt, ignore_errors=True)
