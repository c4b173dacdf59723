"""Receding-horizon MPC driver test (tiny problem: 1 WB + 1 FB phase)."""
import numpy as np
import jax.numpy as jnp

from mhpc_minimal_env_tpu.runtime.mpc import RecedingHorizonMPC
from mhpc_minimal_env_tpu.runtime.locomotion import X0_DEFAULT
from mhpc_minimal_env_tpu.types import HSDDPOptions


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
