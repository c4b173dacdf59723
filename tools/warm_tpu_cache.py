#!/usr/bin/env python3
"""Warm the persistent XLA compilation cache for the staged solver stages.

On the axon-tunneled TPU, XLA compiles REMOTELY and a cold stage compile
takes minutes; the staged solve dispatches ~6 distinct stage programs, so
a cold full solve can exceed any single bench budget.  This tool compiles
each stage AOT (jit(...).lower(args).compile()), one at a time, logging
per-stage compile seconds — every completed stage lands in the persistent
cache (.jax_cache_tpu on TPU, .jax_cache on CPU), so repeated runs make
monotonic progress and the final state is a fully-warm cache that can be
committed for the driver's bench run.

  python tools/warm_tpu_cache.py [B] [f32|f64] [stage_filter]

Also records the compile-time-vs-batch data for PERF.md (run with B=256
and B=1024).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    want64 = len(sys.argv) > 2 and sys.argv[2] == "f64"
    stage_filter = sys.argv[3] if len(sys.argv) > 3 else ""

    import jax

    jax.config.update("jax_enable_x64", True)
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    on_cpu = jax.devices()[0].platform == "cpu"
    cache = os.path.join(root, ".jax_cache" if on_cpu else ".jax_cache_tpu")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp
    import numpy as np

    from mhpc_minimal_env_tpu.runtime.locomotion import (
        X0_DEFAULT, default_problem,
    )
    from mhpc_minimal_env_tpu.solver.staged import build_staged_solver
    from mhpc_minimal_env_tpu.solver.fused import (
        FusedCTG, FusedLin, XDIM, initial_fused_alreb,
    )

    dtype = jnp.float64 if want64 else jnp.float32
    acc_dtype = jnp.float64 if not want64 else None
    lin_chunk = int(os.environ.get("MHPC_LIN_CHUNK", "48"))
    scan_unroll = int(os.environ.get("MHPC_SCAN_UNROLL", "1"))
    print(f"[warm] device={jax.devices()[0]} B={B} dtype={dtype.__name__} "
          f"lin_chunk={lin_chunk} unroll={scan_unroll}", flush=True)

    problem = default_problem()
    # MUST build with the same knobs as bench.py's worker (ls_fastpath from
    # MHPC_LS_K) — a different K changes the ls_fused program and its cache
    # key, leaving the bench to cold-compile it inside its rung budget.
    solve, eng = build_staged_solver(
        list(problem.specs), problem.opt, problem.vel_cmd,
        problem.ground_height, problem.height_cmd, dtype,
        acc_dtype=acc_dtype, lin_chunk=lin_chunk, scan_unroll=scan_unroll,
        ls_fastpath=int(os.environ.get("MHPC_LS_K", "4")))
    plan, T, P = eng["plan"], eng["T"], eng["n_phases"]
    st = eng["stages"]

    rng = np.random.default_rng(0)
    x0 = jnp.asarray(X0_DEFAULT[None] + 0.01 * rng.normal(size=(B, 14)),
                     dtype)
    zb = lambda *s: jnp.zeros((B,) + s, dtype)
    zc = lambda *s: jnp.zeros((T,) + s + (B,), dtype)  # channel-last
    nom_x, nom_u = zc(XDIM), zc(4)
    ctg = FusedCTG(du=zc(4), Kfb=zc(4, XDIM), G=zc(XDIM))
    alreb0 = initial_fused_alreb(list(problem.specs), dtype)
    alreb_b = jax.tree.map(lambda a: jnp.broadcast_to(a, (B,) + a.shape),
                           alreb0)
    ref_x = jax.vmap(lambda x: plan.ref_x.at[:, 0].add(x[0]),
                     out_axes=-1)(x0)
    zf = jnp.zeros((), dtype)
    epsb = zb()
    lin = FusedLin(
        A=zc(XDIM, XDIM), Bm=zc(XDIM, 4), Cm=zc(4, XDIM),
        D=zc(4, 4), lx=zc(XDIM), lu=zc(4), ly=zc(4),
        lxx=zc(XDIM, XDIM), luu=zc(4, 4), lyy=zc(4, 4),
        phix=zc(XDIM), phixx=zc(XDIM, XDIM), Px=zc(XDIM, XDIM),
    )

    stages = [
        ("rollout", st["rollout_b"],
         (plan, x0, nom_x, nom_u, ctg, epsb, ref_x, alreb_b, epsb, zf)),
        ("linearize", st["linearize_b"],
         (plan, None, ref_x, alreb_b, epsb, zf)),   # traj filled below
        ("backward_retry", st["backward_retry"], (plan, lin, ctg, epsb)),
        ("rollout_V_11eps", st["rollout_V_be"],
         (plan, x0, nom_x, nom_u, ctg, st["eps_all"], ref_x, alreb_b, epsb,
          zf)),
    ]
    from mhpc_minimal_env_tpu.solver.fused import FusedTraj

    traj = FusedTraj(x=nom_x, u=nom_u, y=zc(4),
                     V=jnp.zeros((B,), acc_dtype or dtype),
                     h=jnp.zeros((B, P), acc_dtype or dtype),
                     viol=jnp.zeros((B,), acc_dtype or dtype))
    stages[1] = ("linearize", st["linearize_b"],
                 (plan, traj, ref_x, alreb_b, epsb, zf))
    stages.append(("linearize_donate", st["linearize_donate"],
                   (plan, traj, ref_x, alreb_b, epsb, zf, lin)))
    if st.get("ls_fused") is not None:
        stages.append(("ls_fused", st["ls_fused"],
                       (plan, x0, traj, ctg, ref_x, alreb_b, epsb,
                        jnp.zeros((B,), acc_dtype or dtype),
                        jnp.zeros((B,), dtype),
                        jnp.zeros((B,), bool))))

    for name, fn, args in stages:
        if stage_filter and stage_filter not in name:
            continue
        t0 = time.time()
        try:
            fn.lower(*args).compile()
            print(f"[warm] {name:18s} compile {time.time()-t0:7.1f}s",
                  flush=True)
        except Exception as e:
            print(f"[warm] {name:18s} FAILED after {time.time()-t0:.1f}s: "
                  f"{type(e).__name__}: {str(e)[:300]}", flush=True)

    # free the AOT probe operands (notably the full-size lin zeros tree,
    # ~2.8 GB at B=1024 f32) before running the real solve
    del lin, ctg, traj, nom_x, nom_u, stages

    # end-to-end: one full solve (compiles the small glue jits too)
    t0 = time.time()
    res = solve(x0)
    res.cost.block_until_ready()
    print(f"[warm] full solve (warm)  {time.time()-t0:7.1f}s", flush=True)
    t0 = time.time()
    res = solve(x0)
    res.cost.block_until_ready()
    dt = time.time() - t0
    print(f"[warm] full solve steady  {dt*1e3:7.1f} ms  "
          f"({B/dt:.1f} solves/s)", flush=True)


if __name__ == "__main__":
    main()
