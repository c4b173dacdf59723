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
    # mirror bench.py: TPU executables live in a separate committable dir
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
        FusedCTG, XDIM, initial_fused_alreb,
    )

    B = int(os.environ.get("MHPC_PROF_B", "256"))
    dtype = (jnp.float64 if os.environ.get("MHPC_PROF_DTYPE") == "f64"
             else jnp.float32)
    engine = os.environ.get("MHPC_PROF_ENGINE", "staged")
    unroll = int(os.environ.get("MHPC_PROF_UNROLL", "1"))
    lin_chunk = int(os.environ.get("MHPC_PROF_LIN_CHUNK", "48"))
    print(f"[prof] device={jax.devices()[0]} B={B} dtype={dtype.__name__} "
          f"engine={engine} unroll={unroll} lin_chunk={lin_chunk}",
          flush=True)

    problem = default_problem()
    solve, eng = build_staged_solver(
        list(problem.specs), problem.opt, problem.vel_cmd,
        problem.ground_height, problem.height_cmd, dtype,
        acc_dtype=(jnp.float64 if dtype == jnp.float32 else None),
        scan_unroll=unroll, lin_chunk=lin_chunk,
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

    # isolated stages on the converged operands — the EXACT jitted programs
    # the staged solve dispatches (eng["stages"]), so these times are the
    # production path's
    alreb0 = initial_fused_alreb(list(problem.specs), dtype)
    alreb_b = jax.tree.map(lambda a: jnp.broadcast_to(a, (B,) + a.shape),
                           alreb0)
    ref_x = jax.vmap(lambda x: plan.ref_x.at[:, 0].add(x[0]),
                     out_axes=-1)(x0)  # channel-last, like the solve's
    zf = jnp.zeros((), dtype)
    eps0 = jnp.zeros((B,), dtype)
    reb0 = jnp.zeros((B,), dtype)

    st = eng["stages"]
    rollout_b, rollout_V_be = st["rollout_b"], st["rollout_V_be"]
    linearize_b, backward_retry = st["linearize_b"], st["backward_retry"]
    eps_all = st["eps_all"]

    tr = bench("rollout (full)", rollout_b, plan, x0, res.nominal.x,
               res.nominal.u, res.ctg, eps0, ref_x, alreb_b, reb0, zf)
    bench("rollout_V x11 eps (LS)", rollout_V_be, plan, x0, res.nominal.x,
          res.nominal.u, res.ctg, eps_all, ref_x, alreb_b, reb0, zf)
    lin = bench("linearize", linearize_b, plan, tr, ref_x, alreb_b, reb0, zf)
    bench("backward+retry", backward_retry, plan, lin, res.ctg,
          jnp.zeros((B,), dtype))
    if st.get("ls_fused") is not None:
        adt = jnp.float64
        bench("ls_fused (probe+sel)", st["ls_fused"], plan, x0, tr,
              res.ctg, ref_x, alreb_b, reb0,
              jnp.full((B,), 1e9, adt), jnp.zeros((B,), dtype),
              jnp.zeros((B,), bool))

    # XLA cost analysis per stage executable: FLOPs + bytes accessed, the
    # inputs to the PERF.md speed-of-light table
    for name, fn, args in [
        ("rollout", rollout_b, (plan, x0, res.nominal.x, res.nominal.u,
                                res.ctg, eps0, ref_x, alreb_b, reb0, zf)),
        ("linearize", linearize_b, (plan, tr, ref_x, alreb_b, reb0, zf)),
        ("backward_retry", backward_retry,
         (plan, lin, res.ctg, jnp.zeros((B,), dtype))),
    ]:
        try:
            ca = fn.lower(*args).compile().cost_analysis()
            ca = ca[0] if isinstance(ca, (list, tuple)) else ca
            fl = ca.get("flops", float("nan"))
            by = ca.get("bytes accessed", float("nan"))
            print(f"[prof] cost {name:16s} flops={fl:.3e} "
                  f"bytes={by:.3e}", flush=True)
        except Exception as e:
            print(f"[prof] cost {name}: unavailable ({e})", flush=True)
    print("[prof] per solve: 1 warm rollout + 2 AL x [rollout + linearize "
          "+ <=3 DDP x (backward_retry + ls_fused + linearize)]",
          flush=True)


if __name__ == "__main__":
    main()
