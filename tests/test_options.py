"""HSDDP_OPTION parity: AL_active gating + heterogeneous dt support."""
import numpy as np
import jax
import jax.numpy as jnp

from mhpc_minimal_env_tpu.runtime.locomotion import (
    MHPCLocomotion, MHPCProblem, X0_DEFAULT,
)
from mhpc_minimal_env_tpu.solver.fused import (
    FusedCTG, XDIM, initial_fused_alreb, make_fused_engine,
)
from mhpc_minimal_env_tpu.types import HSDDPOptions, PhaseSpec


def _specs(dt_wb=1e-3, dt_fb=1e-3):
    return (
        PhaseSpec(model="wb", mode=1, n_steps=5, dt=dt_wb),
        PhaseSpec(model="wb", mode=2, n_steps=5, dt=dt_wb),
        PhaseSpec(model="fb", mode=3, n_steps=5, dt=dt_fb),
    )


def _rollout_V(opt, alreb, sig_override=None):
    eng = make_fused_engine(list(_specs()), opt, 1.5, -0.404, 0.0)
    plan, T = eng["plan"], eng["T"]
    if sig_override is not None:
        alreb = alreb._replace(
            sigma=jnp.full_like(alreb.sigma, sig_override[0]),
            lam=jnp.full_like(alreb.lam, sig_override[1]),
        )
    x0 = jnp.asarray(X0_DEFAULT)
    ref_x = plan.ref_x.at[:, 0].add(x0[0])
    ctg0 = FusedCTG(du=jnp.zeros((T, 4)), Kfb=jnp.zeros((T, 4, XDIM)),
                    G=jnp.zeros((T, XDIM)))
    zf = jnp.zeros(())
    tr = jax.jit(eng["rollout"])(
        x0, jnp.zeros((T, XDIM)), jnp.zeros((T, 4)), ctg0, zf, ref_x,
        alreb, zf, jnp.ones(()))
    return float(tr.V)


def test_al_active_gates_terminal_penalty():
    """With AL_active=False, nonzero (sigma, lambda) must not change the
    rollout cost (SinglePhase.cpp:110,141,178 gate the AL augmentation);
    with AL_active=True they must."""
    alreb = initial_fused_alreb(list(_specs()))
    v_off_zero = _rollout_V(HSDDPOptions(AL_active=False), alreb,
                            sig_override=(0.0, 0.0))
    v_off_big = _rollout_V(HSDDPOptions(AL_active=False), alreb,
                           sig_override=(50.0, 10.0))
    v_on_zero = _rollout_V(HSDDPOptions(AL_active=True), alreb,
                           sig_override=(0.0, 0.0))
    v_on_big = _rollout_V(HSDDPOptions(AL_active=True), alreb,
                          sig_override=(50.0, 10.0))
    assert v_off_zero == v_off_big
    assert v_on_zero == v_off_zero  # zero multipliers: penalty vanishes
    assert v_on_big != v_on_zero


def test_heterogeneous_dt_fused_matches_phase_engine():
    """dt_wb != dt_fb (MHPC_CompoundTypes.h:246-247 carries independent
    float dt_wb/dt_fb): the fused engine must agree with the per-phase
    engine, which handles per-phase dt natively."""
    opt = HSDDPOptions(max_AL_iter=1, max_DDP_iter=2)
    specs = _specs(dt_wb=1e-3, dt_fb=2e-3)
    problem = MHPCProblem(specs=specs, opt=opt, vel_cmd=1.5,
                          ground_height=-0.404, height_cmd=0.0)
    fused = MHPCLocomotion(problem, engine="fused")
    phase = MHPCLocomotion(problem, engine="phase")
    rf = fused.solve(X0_DEFAULT)
    rp = phase.solve(X0_DEFAULT)
    assert not bool(rf.aborted) and not bool(rp.aborted)
    np.testing.assert_allclose(float(rf.cost), float(rp.cost),
                               rtol=1e-10, atol=1e-10)
    uf = np.concatenate(fused.phase_arrays(rf, "u"))
    up = np.concatenate(phase.phase_arrays(rp, "u"))
    np.testing.assert_allclose(uf, up, atol=1e-9)
