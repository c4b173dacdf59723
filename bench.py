#!/usr/bin/env python3
"""Benchmark: batched full-horizon HSDDP solves/s on the available device.

Prints ONE JSON line:
  {"metric": "hsddp_solves_per_s", "value": N, "unit": "solves/s",
   "vs_baseline": N / 15.0}

Baseline: the reference `mhpc_ctrl` measures ~15 solves/s on one CPU core
(BASELINE.md: 66 ms/solve).  The workload here is the identical default
problem (8 phases, 720 steps, 2 AL x 3 DDP iterations) solved for a batch
of perturbed initial states in float64 (the precision required for <=1e-3
control fidelity vs the reference; see tests/test_golden_solve.py).

Env knobs: MHPC_BENCH_BATCH (default 256), MHPC_BENCH_REPS (default 3),
MHPC_BENCH_DTYPE (f64|f32, default f64).
"""
import json
import os
import sys
import time

import numpy as np


def main():
    import jax

    jax.config.update("jax_enable_x64", True)
    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from mhpc_minimal_env_tpu.runtime.locomotion import MHPCLocomotion, X0_DEFAULT

    B = int(os.environ.get("MHPC_BENCH_BATCH", "256"))
    reps = int(os.environ.get("MHPC_BENCH_REPS", "3"))
    dtype = jnp.float32 if os.environ.get("MHPC_BENCH_DTYPE") == "f32" else jnp.float64

    print(f"[bench] devices={jax.devices()} B={B} dtype={dtype.__name__}",
          file=sys.stderr, flush=True)

    lin_chunk = int(os.environ.get("MHPC_LIN_CHUNK", "48"))
    engine = os.environ.get("MHPC_BENCH_ENGINE", "vmap")
    if engine == "batched_pallas":
        # batch-native engine with the fused Pallas Riccati backward (f32
        # backward; rollout/linearize in `dtype`) — the throughput path.
        from mhpc_minimal_env_tpu.runtime.locomotion import default_problem
        from mhpc_minimal_env_tpu.solver.fused_hsddp_batched import (
            build_fused_solver_batched,
        )

        problem = default_problem()
        solve_b, _ = build_fused_solver_batched(
            list(problem.specs), problem.opt, problem.vel_cmd,
            problem.ground_height, problem.height_cmd, dtype,
            lin_chunk=lin_chunk, backward="pallas",
            b_tile=int(os.environ.get("MHPC_BTILE", "512")),
        )

        class _Loco:
            solve_batched = staticmethod(jax.jit(solve_b))

        loco = _Loco()
    else:
        loco = MHPCLocomotion(dtype=dtype, lin_chunk=lin_chunk)
    rng = np.random.default_rng(0)

    def make_x0(B):
        x0 = X0_DEFAULT[None, :] + 0.01 * rng.normal(size=(B, 14))
        x0[0] = X0_DEFAULT  # lane 0 = the golden problem, for fidelity check
        return jnp.asarray(x0, dtype=dtype)

    x0 = make_x0(B)
    while True:
        try:
            t0 = time.time()
            res = loco.solve_batched(x0)
            res.cost.block_until_ready()
            break
        except Exception as e:  # HBM OOM at large B: halve and retry
            if "RESOURCE_EXHAUSTED" not in str(e) and "memory" not in str(e).lower():
                raise
            B //= 2
            if B < 1:
                raise
            print(f"[bench] OOM, retrying with B={B}", file=sys.stderr,
                  flush=True)
            x0 = make_x0(B)
    print(f"[bench] first batch (incl compile): {time.time()-t0:.1f}s B={B}",
          file=sys.stderr, flush=True)

    # fidelity check on lane 0 vs the golden control sequence
    try:
        g = np.load(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                 "tests", "golden", "reference_run.npz"))
        # fused engine: nominal.u is (B, T, 4); lane 0 is the golden problem
        ctrl = np.asarray(res.nominal.u[0]).reshape(-1, 4)
        dev = np.nanmax(np.abs(ctrl - g["control"]))
        print(f"[bench] lane-0 control deviation vs reference: {dev:.2e}",
              file=sys.stderr, flush=True)
    except Exception as e:  # fidelity check must not kill the bench
        print(f"[bench] fidelity check skipped: {e}", file=sys.stderr)

    times = []
    for _ in range(reps):
        t0 = time.time()
        res = loco.solve_batched(x0)
        res.cost.block_until_ready()
        times.append(time.time() - t0)
    best = min(times)
    solves_per_s = B / best
    print(f"[bench] times={['%.3f' % t for t in times]} best={best:.3f}s",
          file=sys.stderr, flush=True)

    print(json.dumps({
        "metric": "hsddp_solves_per_s",
        "value": round(solves_per_s, 2),
        "unit": "solves/s",
        "vs_baseline": round(solves_per_s / 15.0, 2),
    }), flush=True)


if __name__ == "__main__":
    main()
