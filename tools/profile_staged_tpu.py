#!/usr/bin/env python3
"""Per-stage timing of the staged batched HSDDP solver on the current device.

Times each compiled stage of solver/staged.py in isolation at the bench
batch size, then the full solve, so the PERF.md breakdown (reference
analog: the TIME_BENCHMARK printout of MultiPhaseDDP.cpp:163-251) is
backed by measured numbers rather than estimates.

  MHPC_PROF_B=256 MHPC_PROF_DTYPE=f32 python tools/profile_staged_tpu.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bench(label, fn, *args, reps=5):
    import jax

    out = jax.block_until_ready(fn(*args))  # compile
    ts = []
    for _ in range(reps):
        t0 = time.time()
        out = jax.block_until_ready(fn(*args))
        ts.append(time.time() - t0)
    print(f"[prof] {label:24s} best {min(ts)*1e3:9.2f} ms", flush=True)
    return out


def main():
    import jax

    jax.config.update("jax_enable_x64", True)
    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np

    from mhpc_minimal_env_tpu.runtime.locomotion import (
        X0_DEFAULT, default_problem,
    )
    from mhpc_minimal_env_tpu.solver.staged import build_staged_solver
    from mhpc_minimal_env_tpu.solver.fused import (
        FusedCTG, XDIM, initial_fused_alreb,
    )

    B = int(os.environ.get("MHPC_PROF_B", "256"))
    dtype = (jnp.float64 if os.environ.get("MHPC_PROF_DTYPE") == "f64"
             else jnp.float32)
    engine = os.environ.get("MHPC_PROF_ENGINE", "staged")
    print(f"[prof] device={jax.devices()[0]} B={B} dtype={dtype.__name__} "
          f"engine={engine}", flush=True)

    problem = default_problem()
    solve, eng = build_staged_solver(
        list(problem.specs), problem.opt, problem.vel_cmd,
        problem.ground_height, problem.height_cmd, dtype,
        backward="pallas" if engine == "staged_pallas" else "xla",
    )
    plan, T = eng["plan"], eng["T"]

    rng = np.random.default_rng(0)
    x0 = jnp.asarray(X0_DEFAULT[None] + 0.01 * rng.normal(size=(B, 14)),
                     dtype=dtype)

    # full solve first (compiles everything, populates realistic operands)
    t0 = time.time()
    res = solve(x0)
    res.cost.block_until_ready()
    print(f"[prof] full solve compile+run: {time.time()-t0:.1f}s", flush=True)
    ts = []
    for _ in range(3):
        t0 = time.time()
        res = solve(x0)
        res.cost.block_until_ready()
        ts.append(time.time() - t0)
    best = min(ts)
    print(f"[prof] full solve steady: {best*1e3:.1f} ms "
          f"({B/best:.1f} solves/s)", flush=True)

    # isolated stages on the converged operands
    alreb0 = initial_fused_alreb(list(problem.specs), dtype)
    alreb_b = jax.tree.map(lambda a: jnp.broadcast_to(a, (B,) + a.shape),
                           alreb0)
    ref_x = jax.vmap(lambda x: plan.ref_x.at[:, 0].add(x[0]))(x0)
    zf = jnp.zeros((), dtype)
    eps0 = jnp.zeros((B,), dtype)
    reb0 = jnp.zeros((B,), dtype)

    rollout_b = jax.jit(jax.vmap(
        eng["rollout"], in_axes=(0, 0, 0, 0, 0, 0, 0, 0, None)))
    rollout_V_be = jax.jit(jax.vmap(
        jax.vmap(eng["rollout_V"],
                 in_axes=(None, None, None, None, 0, None, None, None, None)),
        in_axes=(0, 0, 0, 0, None, 0, 0, 0, None)))
    linearize_b = jax.jit(jax.vmap(
        eng["linearize"], in_axes=(0, 0, 0, 0, None)))
    backward_b = jax.jit(jax.vmap(eng["backward"], in_axes=(0, 0)))

    import mhpc_minimal_env_tpu.solver.staged as S
    eps_all = jnp.asarray(
        [problem.opt.alpha ** i for i in range(11)], dtype)

    tr = bench("rollout (full)", rollout_b, x0, res.nominal.x, res.nominal.u,
               res.ctg, eps0, ref_x, alreb_b, reb0, zf)
    bench("rollout_V x11 eps (LS)", rollout_V_be, x0, res.nominal.x,
          res.nominal.u, res.ctg, eps_all, ref_x, alreb_b, reb0, zf)
    lin = bench("linearize", linearize_b, tr, ref_x, alreb_b, reb0, zf)
    bench("backward (Riccati)", backward_b, lin, jnp.zeros((B,), dtype))
    print("[prof] per AL iter: rollout + linearize + 3x(backward + LS "
          "rollouts + rollout + linearize); 2 AL iters per solve",
          flush=True)


if __name__ == "__main__":
    main()
