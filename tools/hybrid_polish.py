#!/usr/bin/env python3
"""Mixed-precision experiment: f32 first AL iteration + f64 second
(the "polish" hybrid of VERDICT r3 item 10).

Question: can the throughput-optimal f32 engine carry the fidelity SLO
(control deviation <= 1e-3 vs the Eigen reference trace, BASELINE.json)
if only the FINAL AL iteration reruns in f64?

Protocol (golden problem, B=1, CPU f64-exact arithmetic):
  1. full f64 solve (2 AL x <=3 DDP)      -> the SLO-meeting trace
  2. full f32 solve                        -> the fast trace (dev ~0.35)
  3. hybrid: f32 solve with max_AL_iter=1, then an f64 solve of AL
     iteration 2 only (al_iter0=1, warm-started from the f32 nominal,
     AL/ReB state cast to f64) -> does AL2-in-f64 contract the f32
     history's deviation under 1e-3?

The deviation is chaotic amplification of rounding (PERF.md §5): the
hybrid passes only if 3 DDP iterations of AL2 CONTRACT an O(0.3) input
difference by ~3 orders of magnitude, which DDP has no reason to do.
This tool measures it so the answer is data, not argument.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from mhpc_minimal_env_tpu.runtime.locomotion import X0_DEFAULT, default_problem
from mhpc_minimal_env_tpu.solver.staged import build_staged_solver
from mhpc_minimal_env_tpu.types import HSDDPOptions


def dev_vs_golden(u_cl):
    g = np.load(os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests", "golden", "reference_run.npz"))
    u = np.asarray(u_cl[..., 0])
    if not np.all(np.isfinite(u)):
        return float("inf")  # never let NaN lanes pass the SLO silently
    return float(np.max(np.abs(u - g["control"])))


def main():
    problem = default_problem()
    x0 = jnp.asarray(X0_DEFAULT)[None]

    def build(dtype, opt=None, **kw):
        return build_staged_solver(
            list(problem.specs), opt or problem.opt, problem.vel_cmd,
            problem.ground_height, problem.height_cmd, dtype,
            acc_dtype=(jnp.float64 if dtype == jnp.float32 else None),
            **kw)[0]

    # 1. full f64 (sanity: must match the recorded SLO number)
    res64 = build(jnp.float64)(x0)
    print(f"[hybrid] full f64 : dev={dev_vs_golden(res64.nominal.u):.3e} "
          f"cost={float(res64.cost[0]):.6f} viol={float(res64.viol[0]):.4e}",
          flush=True)

    # 2. full f32
    res32 = build(jnp.float32)(x0.astype(jnp.float32))
    print(f"[hybrid] full f32 : dev={dev_vs_golden(res32.nominal.u):.3e} "
          f"cost={float(res32.cost[0]):.6f} viol={float(res32.viol[0]):.4e}",
          flush=True)

    # 3. hybrid: f32 AL1 -> f64 AL2
    opt1 = problem.opt._replace(max_AL_iter=1)
    r1 = build(jnp.float32, opt=opt1)(x0.astype(jnp.float32))
    solve64_al2 = build(jnp.float64, opt=opt1)
    alreb1 = jax.tree.map(lambda a: jnp.asarray(a[0], jnp.float64), r1.alreb)
    hyb = solve64_al2(
        x0,
        warm_x_b=jnp.asarray(r1.nominal.x, jnp.float64),
        warm_u_b=jnp.asarray(r1.nominal.u, jnp.float64),
        alreb0_=alreb1, al_iter0=1,
        viol0_b=jnp.asarray(r1.viol, jnp.float64))
    print(f"[hybrid] f32+f64  : dev={dev_vs_golden(hyb.nominal.u):.3e} "
          f"cost={float(hyb.cost[0]):.6f} viol={float(hyb.viol[0]):.4e}",
          flush=True)

    # control experiment: f64 AL1 -> f64 AL2 through the same resume path
    # (isolates the resume machinery from the precision question)
    r1d = build(jnp.float64, opt=opt1)(x0)
    alreb1d = jax.tree.map(lambda a: a[0], r1d.alreb)
    ctrl = solve64_al2(x0, warm_x_b=r1d.nominal.x, warm_u_b=r1d.nominal.u,
                       alreb0_=alreb1d, al_iter0=1, viol0_b=r1d.viol)
    print(f"[hybrid] f64 resume ctl: dev={dev_vs_golden(ctrl.nominal.u):.3e} "
          f"cost={float(ctrl.cost[0]):.6f} viol={float(ctrl.viol[0]):.4e}",
          flush=True)


if __name__ == "__main__":
    main()
