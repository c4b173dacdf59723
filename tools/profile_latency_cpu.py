#!/usr/bin/env python3
"""Decompose the B=1 host-CPU solve latency (VERDICT r4 item 3).

The latency serving path (configs.run_latency) runs the fused
single-program engine on XLA:CPU at ~199 ms/solve (r4) against the
reference's 66 ms (BASELINE.md, test_main.cpp:12-34 workload).  This tool
answers "where do the milliseconds go": it times each stage function of
the UNBATCHED fused engine (solver/fused.py make_fused_engine) in
isolation, multiplies by the per-solve invocation counts of the default
2 AL x 3 DDP schedule, and compares the sum with the measured end-to-end
fused-program latency.

  JAX_PLATFORMS=cpu python tools/profile_latency_cpu.py [f64|f32] [unroll]

Stage counts for the default solve (fused_hsddp.solve, elide_last_lin):
  rollout    ~12  (1 warm + 2 AL x (1 + ~1.5 per DDP line search x 3))
  linearize    6  (2 AL x (1 + 2 non-elided DDP))
  backward     6  (2 AL x 3 DDP, no reg retries on the default problem)
"""
import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bench(fn, args, reps=20):
    out = fn(*args)
    jax_block(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax_block(out)
        ts.append(time.perf_counter() - t0)
    return min(ts) * 1e3


def jax_block(x):
    import jax
    for leaf in jax.tree_util.tree_leaves(x):
        if hasattr(leaf, "block_until_ready"):
            leaf.block_until_ready()


def main():
    import jax

    # the axon sitecustomize force-registers the remote TPU backend and
    # overrides JAX_PLATFORMS from the environment; jax.config wins
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(root, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np

    dtype = jnp.float32 if "f32" in sys.argv[1:] else jnp.float64
    unroll = 1
    for a in sys.argv[1:]:
        if a.isdigit():
            unroll = int(a)
    from mhpc_minimal_env_tpu.runtime.locomotion import (
        X0_DEFAULT, default_problem)
    from mhpc_minimal_env_tpu.solver.fused import (
        FusedALReB, initial_fused_alreb, make_fused_engine)
    from mhpc_minimal_env_tpu.solver.fused_hsddp import build_fused_solver

    problem = default_problem()
    specs = list(problem.specs)
    eng = make_fused_engine(specs, problem.opt, problem.vel_cmd,
                            problem.ground_height, problem.height_cmd,
                            dtype, scan_unroll=unroll)
    plan, T = eng["plan"], eng["T"]
    x0 = jnp.asarray(X0_DEFAULT, dtype)
    ref_x = plan.ref_x.at[:, 0].add(x0[0])
    alreb0 = initial_fused_alreb(specs, dtype)
    f0 = jnp.zeros((), dtype)

    rollout = jax.jit(eng["rollout"])
    linearize = jax.jit(eng["linearize"])
    backward = jax.jit(eng["backward"])

    from mhpc_minimal_env_tpu.solver.fused import FusedCTG, XDIM
    ctg0 = FusedCTG(du=jnp.zeros((T, 4), dtype),
                    Kfb=jnp.zeros((T, 4, XDIM), dtype),
                    G=jnp.zeros((T, XDIM), dtype))
    zx = jnp.zeros((T, XDIM), dtype)
    zu = jnp.zeros((T, 4), dtype)

    tr = rollout(x0, zx, zu, ctg0, f0, ref_x, alreb0, f0,
                 jnp.ones((), dtype))
    lin = linearize(tr, ref_x, alreb0, f0, jnp.ones((), dtype))

    t_roll = bench(rollout, (x0, tr.x, tr.u, ctg0, f0, ref_x, alreb0,
                             f0, f0))
    t_lin = bench(linearize, (tr, ref_x, alreb0, f0, f0))
    t_bwd = bench(backward, (lin, jnp.zeros((), dtype)))

    counts = {"rollout": 12, "linearize": 6, "backward": 6}
    per = {"rollout": t_roll, "linearize": t_lin, "backward": t_bwd}
    print(f"dtype={jnp.dtype(dtype).name} unroll={unroll}")
    tot = 0.0
    for k in per:
        est = per[k] * counts[k]
        tot += est
        print(f"  {k:10s} {per[k]:8.2f} ms/call x {counts[k]:2d} "
              f"= {est:7.1f} ms")
    print(f"  sum of stages (est per solve): {tot:.1f} ms")

    # end-to-end fused program for comparison
    solve = jax.jit(build_fused_solver(
        specs, problem.opt, problem.vel_cmd, problem.ground_height,
        problem.height_cmd, dtype, scan_unroll=unroll,
        elide_last_lin=True)[0])
    res = solve(x0)
    res.cost.block_until_ready()
    ts = []
    for _ in range(10):
        t0 = time.perf_counter()
        res = solve(x0)
        res.cost.block_until_ready()
        ts.append(time.perf_counter() - t0)
    print(f"  end-to-end fused solve: {min(ts)*1e3:.1f} ms "
          f"(viol={float(res.viol):.4f})")


if __name__ == "__main__":
    main()
