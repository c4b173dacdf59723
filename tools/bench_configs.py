#!/usr/bin/env python3
"""Run one (or all) of the five named BASELINE workload configs and print a
JSON line per config.

    python tools/bench_configs.py [--config NAME] [--cpu] [--f32]
        [--batch B] [--cycles N] [--scenarios N] [--devices N]

See mhpc_minimal_env_tpu/configs.py for what each config measures.  The
repo-root bench.py remains the driver's single-line headline benchmark;
this tool covers the full config matrix.
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="all")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--f32", action="store_true")
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--cycles", type=int, default=4)
    ap.add_argument("--scenarios", type=int, default=8192)
    ap.add_argument("--chunk", type=int, default=1024,
                    help="pod_sweep per-chunk lanes (use 512 for f64: the "
                         "lin tree at 1024 f64 lanes is ~11 GB)")
    ap.add_argument("--devices", type=int, default=None)
    ap.add_argument("--wb-batch", type=int, default=64,
                    help="batch for the wb_only_extended stress config "
                         "(VERDICT r3: report it at a batched rung, not "
                         "only B=1)")
    args = ap.parse_args(argv)

    if args.cpu:
        os.environ.setdefault(
            "XLA_FLAGS",
            os.environ.get("XLA_FLAGS", "")
            + " --xla_force_host_platform_device_count=8",
        )
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    # x64 is always enabled: --f32 selects the f32 COMPUTE dtype, but the
    # accumulator/decision dtype stays f64 (solver acc_dtype) and needs
    # real float64 available
    jax.config.update("jax_enable_x64", True)
    on_cpu = args.cpu or jax.devices()[0].platform == "cpu"
    cache = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache" if on_cpu else ".jax_cache_tpu",
    )
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from mhpc_minimal_env_tpu.configs import CONFIGS

    dtype = jnp.float32 if args.f32 else jnp.float64
    kwargs = {
        "batched_mpc": dict(B=args.batch, n_cycles=args.cycles),
        "pod_sweep": dict(n_scenarios=args.scenarios, n_devices=args.devices,
                          chunk=args.chunk),
        "wb_only_extended": dict(B=args.wb_batch),
    }
    names = list(CONFIGS) if args.config == "all" else [args.config]
    for name in names:
        out = CONFIGS[name](dtype=dtype, **kwargs.get(name, {}))
        print(json.dumps(out), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
