#!/usr/bin/env python3
"""Probe XLA compile times of the solver stages on the current device.

Usage: python tools/probe_compile.py [stage ...]
Stages: rollout linearize backward solve_b4
Prints per-stage compile wall time.  Used to attack the round-1 finding
that the full batched solve exceeds 9 min of compile on TPU.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    jax.config.update("jax_enable_x64", True)
    cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                         ".jax_cache")
    if os.environ.get("MHPC_PROBE_CACHE", "0") == "1":
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np

    from mhpc_minimal_env_tpu.runtime.locomotion import default_problem, X0_DEFAULT
    from mhpc_minimal_env_tpu.solver.fused import (
        make_fused_engine, initial_fused_alreb, FusedCTG, XDIM,
    )

    dtype = jnp.float32 if os.environ.get("MHPC_PROBE_DTYPE") == "f32" else jnp.float64
    B = int(os.environ.get("MHPC_PROBE_B", "4"))
    problem = default_problem()
    specs = list(problem.specs)
    eng = make_fused_engine(specs, problem.opt, problem.vel_cmd,
                            problem.ground_height, problem.height_cmd, dtype)
    plan = eng["plan"]
    T = eng["T"]
    alreb0 = initial_fused_alreb(specs, dtype)
    print(f"[probe] device={jax.devices()[0]} dtype={dtype.__name__} B={B}",
          flush=True)

    rng = np.random.default_rng(0)
    x0 = jnp.asarray(X0_DEFAULT + 0.0 * rng.normal(size=(14,)), dtype=dtype)
    ref_x = plan.ref_x.at[:, 0].add(x0[0])
    ctg0 = FusedCTG(du=jnp.zeros((T, 4), dtype),
                    Kfb=jnp.zeros((T, 4, XDIM), dtype),
                    G=jnp.zeros((T, XDIM), dtype))
    zf = jnp.zeros((), dtype)

    stages = sys.argv[1:] or ["rollout", "linearize", "backward"]

    if "rollout" in stages:
        t0 = time.time()
        f = jax.jit(eng["rollout"])
        tr = f(x0, jnp.zeros((T, XDIM), dtype), jnp.zeros((T, 4), dtype),
               ctg0, zf, ref_x, alreb0, zf, jnp.ones((), dtype))
        tr.V.block_until_ready()
        print(f"[probe] rollout compile+run: {time.time()-t0:.1f}s", flush=True)
        t0 = time.time()
        tr = f(x0, jnp.zeros((T, XDIM), dtype), jnp.zeros((T, 4), dtype),
               ctg0, zf, ref_x, alreb0, zf, jnp.ones((), dtype))
        tr.V.block_until_ready()
        print(f"[probe] rollout steady: {time.time()-t0:.3f}s", flush=True)
    else:
        tr = eng["rollout"](x0, jnp.zeros((T, XDIM), dtype),
                            jnp.zeros((T, 4), dtype), ctg0, zf, ref_x,
                            alreb0, zf, jnp.ones((), dtype))

    if "linearize" in stages:
        t0 = time.time()
        f = jax.jit(eng["linearize"])
        lin = f(tr, ref_x, alreb0, zf, jnp.ones((), dtype))
        lin.A.block_until_ready()
        print(f"[probe] linearize compile+run: {time.time()-t0:.1f}s", flush=True)
        t0 = time.time()
        lin = f(tr, ref_x, alreb0, zf, jnp.ones((), dtype))
        lin.A.block_until_ready()
        print(f"[probe] linearize steady: {time.time()-t0:.3f}s", flush=True)
    else:
        lin = eng["linearize"](tr, ref_x, alreb0, zf, jnp.ones((), dtype))

    if "backward" in stages:
        t0 = time.time()
        f = jax.jit(eng["backward"])
        ok, dV, ctg = f(lin, zf)
        ctg.G.block_until_ready()
        print(f"[probe] backward compile+run: {time.time()-t0:.1f}s", flush=True)
        t0 = time.time()
        ok, dV, ctg = f(lin, zf)
        ctg.G.block_until_ready()
        print(f"[probe] backward steady: {time.time()-t0:.3f}s", flush=True)

    if "solve_b4" in stages:
        from mhpc_minimal_env_tpu.solver.staged import build_staged_solver
        solve_b, _ = build_staged_solver(
            specs, problem.opt, problem.vel_cmd, problem.ground_height,
            problem.height_cmd, dtype)
        x0b = jnp.broadcast_to(x0, (B, 14))
        t0 = time.time()
        res = solve_b(x0b)
        res.cost.block_until_ready()
        print(f"[probe] solve_b{B} compile+run: {time.time()-t0:.1f}s", flush=True)


if __name__ == "__main__":
    main()
