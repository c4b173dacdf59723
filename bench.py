#!/usr/bin/env python3
"""Benchmark: batched full-horizon HSDDP solves/s on the available device.

Prints ONE JSON line:
  {"metric": "hsddp_solves_per_s", "value": N, "unit": "solves/s",
   "vs_baseline": N / 15.0}

Baseline: the reference `mhpc_ctrl` measures ~15 solves/s on one CPU core
(BASELINE.md: 66 ms/solve).  The workload is the identical default problem
(8 phases, 720 gridpoints, 2 AL x <=3 DDP iterations) solved for a batch of
perturbed initial states; lane 0 is the exact golden problem and its
control sequence is checked against the recorded reference run.

Robustness (round-1 failure was rc=124 with no output): this entry point is
an ORCHESTRATOR that runs worker attempts in subprocesses, each with its
own wall-clock budget, walking a degradation ladder (smaller batch, f32)
until one emits a JSON line — so the driver always records a number.  The
default engine is the staged host-orchestrated solver (solver/staged.py),
whose three stage graphs compile in minutes, not the >9-minute single
full-solve graph of round 1; a persistent compilation cache
(.jax_cache) makes warm runs start in seconds.

Env knobs: MHPC_BENCH_BATCH, MHPC_BENCH_REPS, MHPC_BENCH_DTYPE (f64|f32),
MHPC_BENCH_ENGINE (staged|staged_pallas|batched|batched_pallas|vmap),
MHPC_BENCH_BUDGET (total seconds, default 520).
"""
import json
import os
import subprocess
import sys
import time

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
BASELINE_SOLVES_PER_S = 15.0


# --------------------------------------------------------------------------
# worker: one attempt at a fixed config
# --------------------------------------------------------------------------

def build_solver(engine, dtype, problem, lin_chunk, b_tile):
    import jax

    if engine in ("staged", "staged_pallas"):
        from mhpc_minimal_env_tpu.solver.staged import build_staged_solver

        solve_b, _ = build_staged_solver(
            list(problem.specs), problem.opt, problem.vel_cmd,
            problem.ground_height, problem.height_cmd, dtype,
            lin_chunk=lin_chunk,
            backward="pallas" if engine == "staged_pallas" else "xla",
            b_tile=b_tile,
        )
        return solve_b
    if engine in ("batched", "batched_pallas"):
        from mhpc_minimal_env_tpu.solver.fused_hsddp_batched import (
            build_fused_solver_batched,
        )

        solve_b, _ = build_fused_solver_batched(
            list(problem.specs), problem.opt, problem.vel_cmd,
            problem.ground_height, problem.height_cmd, dtype,
            lin_chunk=lin_chunk,
            backward="pallas" if engine == "batched_pallas" else "xla",
            b_tile=b_tile,
        )
        return jax.jit(solve_b)
    # engine == "vmap": jit(vmap(single-solve)) on the fused engine
    from mhpc_minimal_env_tpu.runtime.locomotion import MHPCLocomotion

    return MHPCLocomotion(problem, dtype=dtype,
                          lin_chunk=lin_chunk).solve_batched


def worker():
    import jax

    jax.config.update("jax_enable_x64", True)
    on_cpu = jax.devices()[0].platform == "cpu"
    # TPU executables are platform-specific; keep them in a dedicated dir so
    # the TPU-warm cache can be committed without dragging CPU blobs along.
    cache = ".jax_cache" if on_cpu else ".jax_cache_tpu"
    jax.config.update("jax_compilation_cache_dir", os.path.join(HERE, cache))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp

    sys.path.insert(0, HERE)
    from mhpc_minimal_env_tpu.runtime.locomotion import (
        X0_DEFAULT, default_problem,
    )

    B = int(os.environ.get("MHPC_BENCH_BATCH", "256"))
    reps = int(os.environ.get("MHPC_BENCH_REPS", "3"))
    # default dtype: f64 is the golden-fidelity path and is what CPU runs;
    # on TPU f64 is software-emulated (5x compile, 3x runtime — measured
    # round 2) so the throughput bench defaults to f32 there and reports
    # lane-0 solution-quality figures vs the reference run instead.
    dt_env = os.environ.get("MHPC_BENCH_DTYPE")
    if dt_env is None:
        dtype = jnp.float64 if on_cpu else jnp.float32
    else:
        dtype = jnp.float32 if dt_env == "f32" else jnp.float64
    engine = os.environ.get("MHPC_BENCH_ENGINE", "staged")
    lin_chunk = int(os.environ.get("MHPC_LIN_CHUNK", "48"))
    b_tile = int(os.environ.get("MHPC_BTILE", "512"))

    print(f"[bench] devices={jax.devices()} engine={engine} B={B} "
          f"dtype={dtype.__name__}", file=sys.stderr, flush=True)

    problem = default_problem()
    solve = build_solver(engine, dtype, problem, lin_chunk, b_tile)
    rng = np.random.default_rng(0)

    def make_x0(B):
        x0 = X0_DEFAULT[None, :] + 0.01 * rng.normal(size=(B, 14))
        x0[0] = X0_DEFAULT  # lane 0 = the golden problem (fidelity check)
        return jnp.asarray(x0, dtype=dtype)

    x0 = make_x0(B)
    t0 = time.time()
    while True:
        try:
            res = solve(x0)
            res.cost.block_until_ready()
            break
        except Exception as e:  # HBM OOM at large B: halve and retry
            if ("RESOURCE_EXHAUSTED" not in str(e)
                    and "memory" not in str(e).lower()):
                raise
            B //= 2
            if B < 1:
                raise
            print(f"[bench] OOM, retrying with B={B}", file=sys.stderr,
                  flush=True)
            x0 = make_x0(B)
    print(f"[bench] first batch (incl compile): {time.time()-t0:.1f}s B={B}",
          file=sys.stderr, flush=True)

    # fidelity: lane 0 is the exact reference problem.  In f64 the control
    # sequence matches the golden run to <=1e-3 (the golden test's SLO);
    # in f32 discrete line-search accept decisions can flip, so the control
    # trace diverges while the SOLUTION stays equally good — report both
    # the raw deviation and the solution-quality figures (terminal
    # constraint violation vs the reference's logged 2.365e-2, cost).
    quality = {}
    try:
        g = np.load(os.path.join(HERE, "tests", "golden",
                                 "reference_run.npz"))
        ctrl = np.asarray(res.nominal.u[0]).reshape(-1, 4)
        quality["control_dev_vs_reference"] = float(
            np.nanmax(np.abs(ctrl - g["control"])))
        quality["lane0_terminal_viol"] = float(np.asarray(res.viol[0]))
        quality["reference_terminal_viol"] = 2.365136e-2
        quality["lane0_cost"] = float(np.asarray(res.cost[0]))
        quality["aborted_lanes"] = int(np.asarray(res.aborted).sum())
        print(f"[bench] lane-0 vs reference: ctrl_dev="
              f"{quality['control_dev_vs_reference']:.2e} "
              f"viol={quality['lane0_terminal_viol']:.4e} "
              f"(ref 2.3651e-2) aborted={quality['aborted_lanes']}/{B}",
              file=sys.stderr, flush=True)
    except Exception as e:  # fidelity check must not kill the bench
        print(f"[bench] fidelity check skipped: {e}", file=sys.stderr)

    times = []
    for _ in range(reps):
        t0 = time.time()
        res = solve(x0)
        res.cost.block_until_ready()
        times.append(time.time() - t0)
    best = min(times)
    solves_per_s = B / best
    print(f"[bench] times={['%.3f' % t for t in times]} best={best:.3f}s",
          file=sys.stderr, flush=True)

    out = {
        "metric": "hsddp_solves_per_s",
        "value": round(solves_per_s, 2),
        "unit": "solves/s",
        "vs_baseline": round(solves_per_s / BASELINE_SOLVES_PER_S, 2),
        "batch": B,
        "engine": engine,
        "dtype": dtype.__name__,
    }
    out.update(quality)
    print(json.dumps(out), flush=True)


# --------------------------------------------------------------------------
# orchestrator: degradation ladder in subprocesses
# --------------------------------------------------------------------------

LADDER = [
    # (env overrides, per-attempt budget seconds)
    ({}, 420),                                                # as configured
    ({"MHPC_BENCH_BATCH": "64"}, 240),                        # smaller batch
    ({"MHPC_BENCH_BATCH": "64", "MHPC_BENCH_DTYPE": "f32"}, 200),
    ({"MHPC_BENCH_BATCH": "8", "MHPC_BENCH_DTYPE": "f32",
      "MHPC_BENCH_REPS": "1"}, 150),
]


def orchestrate():
    total_budget = float(os.environ.get("MHPC_BENCH_BUDGET", "520"))
    deadline = time.time() + total_budget
    last_err = ""
    for i, (overrides, budget) in enumerate(LADDER):
        remaining = deadline - time.time()
        if remaining < 30:
            break
        attempt_budget = min(budget, remaining)
        env = dict(os.environ)
        env.update(overrides)
        print(f"[bench] attempt {i}: overrides={overrides} "
              f"budget={attempt_budget:.0f}s", file=sys.stderr, flush=True)
        try:
            p = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--worker"],
                env=env, capture_output=True, text=True,
                timeout=attempt_budget,
            )
        except subprocess.TimeoutExpired as e:
            tail = (e.stderr or "")[-500:] if isinstance(e.stderr, str) else ""
            last_err = f"attempt {i} timed out after {attempt_budget:.0f}s"
            print(f"[bench] {last_err}\n{tail}", file=sys.stderr, flush=True)
            continue
        sys.stderr.write(p.stderr[-4000:])
        json_lines = [l for l in p.stdout.splitlines()
                      if l.startswith("{") and '"metric"' in l]
        if p.returncode == 0 and json_lines:
            print(json_lines[-1], flush=True)
            return 0
        last_err = f"attempt {i} rc={p.returncode}"
        print(f"[bench] {last_err}: {p.stdout[-300:]}", file=sys.stderr,
              flush=True)
    # every rung failed: emit an honest zero so the driver records the miss
    print(json.dumps({
        "metric": "hsddp_solves_per_s", "value": 0.0, "unit": "solves/s",
        "vs_baseline": 0.0, "error": last_err or "no attempt ran",
    }), flush=True)
    return 1


if __name__ == "__main__":
    if "--worker" in sys.argv:
        worker()
    else:
        sys.exit(orchestrate())
