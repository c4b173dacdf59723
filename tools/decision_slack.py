#!/usr/bin/env python3
"""Measure how close the solver's discrete decisions sit to their thresholds,
and what control fidelity each precision scheme achieves, on CPU.

The f32 TPU bench of round 2 recorded control_dev_vs_reference = 0.32; the
diagnosis was that f32 cost-summation drift flips line-search accept
decisions (MultiPhaseDDP.cpp:130-151), after which the iterate walks a
different path.  This tool quantifies that on CPU, where f32 arithmetic is
bit-comparable to the precision-pinned TPU path:

  1. f64 golden run (B=1, exact reference problem): record every accept
     decision's SLACK |V - (cost_prev + gamma eps (1-eps/2) dVexp)|; the
     minimum slack is the noise budget any lower-precision scheme must beat
     to reproduce the reference's decision sequence.
  2. precision schemes x {f64, f32 + f64 accumulators, pure f32}: max
     control deviation vs the golden reference run
     (tests/golden/reference_run.npz), plus whether the decision sequence
     (selected eps per DDP iteration) matches the f64 run.

Run:  python tools/decision_slack.py
"""
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
_CACHE = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from mhpc_minimal_env_tpu.runtime.locomotion import X0_DEFAULT, default_problem
from mhpc_minimal_env_tpu.solver.staged import build_staged_solver


def run_scheme(label, dtype, acc_dtype):
    problem = default_problem()
    events = []
    solve, eng = build_staged_solver(
        list(problem.specs), problem.opt, problem.vel_cmd,
        problem.ground_height, problem.height_cmd, dtype,
        acc_dtype=acc_dtype, monitor=lambda k, d: events.append((k, d)),
        ls_fastpath=0)  # full 11-candidate sweep -> slacks for every eps
    x0 = jnp.asarray(X0_DEFAULT[None, :], dtype)
    res = solve(x0)
    res.cost.block_until_ready()

    opt = problem.opt
    from mhpc_minimal_env_tpu.solver.fused_hsddp import LS_EPS_MIN
    eps_all = []
    e = 1.0
    while e > LS_EPS_MIN:
        eps_all.append(e)
        e *= opt.alpha
    eps_all = np.asarray(eps_all)

    slacks, eps_seq = [], []
    for kind, d in events:
        if kind != "ls":
            continue
        V = np.asarray(d["V_bl"])[0]          # (L,)
        cp = float(np.asarray(d["cost_prev"])[0])
        dV = float(np.asarray(d["dVexp"])[0])
        thr = cp + opt.gamma * eps_all * (1.0 - eps_all / 2.0) * dV
        ok = V <= thr
        first = int(np.argmax(ok)) if ok.any() else -1
        # decision slack: distance of each compared V to its threshold,
        # over the candidates the sequential reference would actually test
        upto = first + 1 if first >= 0 else len(eps_all)
        slacks.extend(np.abs(V - thr)[:upto].tolist())
        eps_seq.append(first)
    ctrl = np.asarray(res.nominal.u[..., 0]).reshape(-1, 4)
    g = np.load(os.path.join(os.path.dirname(_CACHE), "tests", "golden",
                             "reference_run.npz"))
    dev = float(np.nanmax(np.abs(ctrl - g["control"])))
    print(f"[{label:16s}] ctrl_dev={dev:.3e}  viol={float(res.viol[0]):.4e}"
          f"  cost={float(res.cost[0]):.6f}  min_slack="
          f"{min(slacks):.3e}  eps_seq={eps_seq}", flush=True)
    return dev, eps_seq, slacks


def main():
    d64, seq64, s64 = run_scheme("f64", jnp.float64, None)
    dmx, seqmx, _ = run_scheme("f32+f64acc", jnp.float32, jnp.float64)
    d32, seq32, _ = run_scheme("f32", jnp.float32, None)
    print(f"\nf64 min decision slack: {min(s64):.3e}")
    print(f"decision sequence match: mixed={seqmx == seq64} "
          f"pure-f32={seq32 == seq64}")
    print(f"SLO (<=1e-3): f64={'PASS' if d64 <= 1e-3 else 'FAIL'} "
          f"mixed={'PASS' if dmx <= 1e-3 else 'FAIL'} "
          f"f32={'PASS' if d32 <= 1e-3 else 'FAIL'}")


if __name__ == "__main__":
    main()
