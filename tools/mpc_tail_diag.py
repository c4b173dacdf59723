#!/usr/bin/env python3
"""Diagnose the batched-MPC violation tail (VERDICT r3 weak item 3).

CONFIGS_r03 showed alive lanes ending MPC with terminal violation ~1.1
(50x the AL penalty-acceptance gate).  This tool runs the production MPC
loop and records the PER-CYCLE violation trajectory of every lane, then
reports for the worst lanes: when the violation first left the healthy
band, at which gait-mode rotation, and how it correlates with the
initial perturbation magnitude — so the tail is a diagnosis, not a
mystery number.

  MHPC_DIAG_B=256 MHPC_DIAG_CYCLES=8 MHPC_DIAG_DTYPE=f64 \
      python tools/mpc_tail_diag.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    jax.config.update("jax_enable_x64", True)
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    on_cpu = jax.devices()[0].platform == "cpu"
    cache = os.path.join(root, ".jax_cache" if on_cpu else ".jax_cache_tpu")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp
    import numpy as np

    from mhpc_minimal_env_tpu.configs import _perturbed_x0
    from mhpc_minimal_env_tpu.runtime.locomotion import X0_DEFAULT
    from mhpc_minimal_env_tpu.runtime.mpc import RecedingHorizonMPC

    B = int(os.environ.get("MHPC_DIAG_B", "256"))
    n_cycles = int(os.environ.get("MHPC_DIAG_CYCLES", "8"))
    dtype = (jnp.float32 if os.environ.get("MHPC_DIAG_DTYPE") == "f32"
             else jnp.float64)
    print(f"[diag] device={jax.devices()[0]} B={B} cycles={n_cycles} "
          f"dtype={dtype.__name__}", flush=True)

    acc = jnp.float64 if dtype == jnp.float32 else None
    mpc = RecedingHorizonMPC(dtype=dtype, acc_dtype=acc)
    x0 = _perturbed_x0(B)
    out = mpc.run_batched(x0, n_cycles=n_cycles)

    viol = np.stack([np.asarray(r.viol) for r in out])        # (C, B)
    cost = np.stack([np.asarray(r.cost) for r in out])
    alive = np.asarray(out[-1].alive)
    pert = np.linalg.norm(x0 - X0_DEFAULT[None, :], axis=1)   # (B,)
    modes = [1]
    from mhpc_minimal_env_tpu.models import gait as G
    for _ in range(n_cycles - 1):
        modes.append(G.next_mode(modes[-1]))

    final = viol[-1]
    bad = alive & (final > 0.03)
    print(f"[diag] alive={int(alive.sum())}/{B} "
          f"converged(<0.03)={int((alive & (final < 0.03)).sum())} "
          f"tail(>0.03)={int(bad.sum())} "
          f"max_final_viol={final[alive].max():.3f}", flush=True)

    # tail correlation with perturbation size
    if bad.any():
        print(f"[diag] perturbation |dx0|: tail lanes "
              f"median={np.median(pert[bad]):.4f} "
              f"healthy median={np.median(pert[alive & ~bad]):.4f}",
              flush=True)
        # which cycle does each tail lane first exceed 0.03 and stay above?
        first_bad = np.full(B, -1)
        for b in np.where(bad)[0]:
            above = viol[:, b] > 0.03
            idx = np.where(above)[0]
            first_bad[b] = idx[0] if idx.size else -1
        counts = {}
        for b in np.where(bad)[0]:
            m = modes[first_bad[b]] if first_bad[b] >= 0 else None
            counts[m] = counts.get(m, 0) + 1
        print(f"[diag] first-exceed cycle mode histogram "
              f"(mode->lanes): {counts}", flush=True)

        worst = np.argsort(-np.where(alive, final, -1))[:5]
        for b in worst:
            tr = " ".join(f"{v:.3f}" for v in viol[:, b])
            print(f"[diag] lane {b:4d} |dx0|={pert[b]:.4f} "
                  f"viol/cycle: {tr}  cost {cost[-1, b]:.1f}", flush=True)
        # do tail lanes RECOVER (viol decreasing at the end) or diverge?
        rec = int((bad & (viol[-1] < viol[-2])).sum())
        print(f"[diag] tail lanes with viol still falling at last cycle: "
              f"{rec}/{int(bad.sum())}", flush=True)
    else:
        print("[diag] no tail lanes above 0.03 — tail is clean at this "
              "B/cycles", flush=True)


if __name__ == "__main__":
    main()
