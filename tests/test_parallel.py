"""Sharded scenario sweeps on the virtual 8-device CPU mesh."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mhpc_minimal_env_tpu.parallel.mesh import (
    make_mesh, shard_batch, sharded_metrics, sharded_solve,
)
from mhpc_minimal_env_tpu.runtime.locomotion import (
    MHPCLocomotion, MHPCProblem, X0_DEFAULT,
)
from mhpc_minimal_env_tpu.types import HSDDPOptions, PhaseSpec

pytestmark = pytest.mark.slow  # full-size solves / multi-process: run with --runslow


@pytest.fixture(scope="module")
def tiny_loco():
    specs = (
        PhaseSpec(model="wb", mode=1, n_steps=6, dt=1e-3),
        PhaseSpec(model="wb", mode=2, n_steps=6, dt=1e-3),
        PhaseSpec(model="fb", mode=3, n_steps=6, dt=1e-3),
    )
    problem = MHPCProblem(
        specs=specs, opt=HSDDPOptions(max_AL_iter=1, max_DDP_iter=1),
        vel_cmd=1.5, ground_height=-0.404, height_cmd=0.0,
    )
    return MHPCLocomotion(problem)


def _batch(n):
    rng = np.random.default_rng(0)
    return jnp.asarray(X0_DEFAULT[None, :] + 0.01 * rng.normal(size=(n, 14)))


def test_mesh_has_8_fake_devices():
    assert len(jax.devices()) == 8


def test_sharded_solve_matches_single_device(tiny_loco):
    mesh = make_mesh(8)
    x0 = _batch(16)
    run = sharded_solve(tiny_loco, mesh)
    res_sharded = run(shard_batch(x0, mesh))
    res_local = tiny_loco.solve_batched(x0)
    np.testing.assert_allclose(
        np.asarray(res_sharded.cost), np.asarray(res_local.cost), rtol=1e-9
    )


def test_sharded_metrics_psum(tiny_loco):
    mesh = make_mesh(8)
    x0 = _batch(16)
    m = sharded_metrics(tiny_loco, mesh)(shard_batch(x0, mesh))
    res_local = tiny_loco.solve_batched(x0)
    assert abs(float(m["mean_cost"]) - float(res_local.cost.mean())) < 1e-6
    assert abs(float(m["worst_violation"]) - float(res_local.viol.max())) < 1e-12
