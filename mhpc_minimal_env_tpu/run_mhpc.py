"""CLI entry point — the reference's `mhpc_ctrl` (test_main.cpp:12-34).

    python -m mhpc_minimal_env_tpu.run_mhpc [--cpu] [--f32] [--out DIR]
        [--max-al 2] [--max-ddp 3] [--vel 1.5] [--mpc N]

Runs one default MHPC solve (or an N-cycle receding-horizon MPC run with
--mpc) and writes the four debug dumps (state/control/gradient/cost.txt)
like print_debugInfo.
"""
from __future__ import annotations

import argparse
import sys
import time


def main(argv=None):
    ap = argparse.ArgumentParser(description="MHPC bounding-gait solver (TPU-native)")
    ap.add_argument("--cpu", action="store_true", help="force CPU backend")
    ap.add_argument("--f32", action="store_true", help="float32 (default f64)")
    ap.add_argument("--out", default=".", help="output directory for dumps")
    ap.add_argument("--max-al", type=int, default=2)
    ap.add_argument("--max-ddp", type=int, default=3)
    ap.add_argument("--vel", type=float, default=1.5)
    ap.add_argument("--mpc", type=int, default=0,
                    help="run N receding-horizon MPC cycles instead of one solve")
    args = ap.parse_args(argv)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    if not args.f32:
        jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from .runtime.locomotion import MHPCLocomotion, default_problem
    from .runtime.logging import dump_debug_files, log_solve_stats
    from .types import HSDDPOptions

    dtype = jnp.float32 if args.f32 else jnp.float64
    opt = HSDDPOptions(max_AL_iter=args.max_al, max_DDP_iter=args.max_ddp)

    if args.mpc:
        from .runtime.mpc import RecedingHorizonMPC
        from .runtime.locomotion import X0_DEFAULT

        mpc = RecedingHorizonMPC(opt=opt, dtype=dtype)
        t0 = time.time()
        out = mpc.run(X0_DEFAULT, n_cycles=args.mpc)
        print(f"{args.mpc} MPC cycles in {time.time()-t0:.2f}s")
        for i, r in enumerate(out):
            print(f"cycle {i}: cost={float(r.cost):.4f} viol={float(r.viol):.3e}")
        return 0

    problem = default_problem(vel_cmd=args.vel, opt=opt)
    loco = MHPCLocomotion(problem, dtype=dtype)
    t0 = time.time()
    res = loco.solve()
    res.cost.block_until_ready()
    print(f"solve: {time.time()-t0:.2f}s")
    print(log_solve_stats(res))
    dump_debug_files(loco, res, args.out)
    print(f"wrote state/control/gradient/cost.txt to {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
