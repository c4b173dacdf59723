"""Microbenchmark: Pallas Riccati backward kernel vs XLA scan backward (TPU).

Synthetic but well-conditioned linearization data at the default problem
size (T=720, 8 phases).  Checks numerics parity, then times both.

  python tools/bench_riccati.py [B] [f32|f64]
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, "/root/repo")

from mhpc_minimal_env_tpu.ops.riccati_pallas import (  # noqa: E402
    backward_batched_pallas, segment_plan_of,
)
from mhpc_minimal_env_tpu.solver.fused import (  # noqa: E402
    FusedLin, make_fused_engine,
)
from mhpc_minimal_env_tpu.types import HSDDPOptions, PhaseSpec  # noqa: E402


def synth_lin(B, T, dtype):
    """Synthesize well-conditioned linearization data ON DEVICE.

    (Host-side numpy synthesis + transfer is ~6 GB over the axon tunnel at
    B=512 — it timed out the whole benchmark in round 2.  jax.random on the
    chip makes setup <1 s.)"""
    import jax.random as jr

    keys = iter(jr.split(jr.key(0), 16))

    def r(*shape, scale=1.0):
        return scale * jr.normal(next(keys), shape, dtype)

    eye = jnp.eye(14, dtype=dtype)

    def psd(*shape):
        M = r(*shape, scale=0.1)
        return M @ jnp.swapaxes(M, -1, -2)

    return FusedLin(
        A=eye + r(B, T, 14, 14, scale=0.003),
        Bm=r(B, T, 14, 4, scale=0.01),
        Cm=r(B, T, 4, 14, scale=0.3),
        D=r(B, T, 4, 4, scale=0.05),
        lx=r(B, T, 14, scale=1e-3), lu=r(B, T, 4, scale=1e-3),
        ly=r(B, T, 4, scale=1e-2),
        lxx=psd(B, T, 14, 14) * 1e-3 + 1e-4 * eye,
        luu=psd(B, T, 4, 4) * 1e-3 + 5e-3 * jnp.eye(4, dtype=dtype),
        lyy=psd(B, T, 4, 4) * 1e-4 + 1e-4 * jnp.eye(4, dtype=dtype),
        phix=r(B, T, 14, scale=1.0),
        phixx=psd(B, T, 14, 14) + 0.1 * eye,
        Px=eye + r(B, T, 14, 14, scale=0.01),
    )


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    xla_dtype = jnp.float64 if (len(sys.argv) > 2 and sys.argv[2] == "f64") else jnp.float32
    specs = []
    for p in range(8):
        mode = p % 4 + 1
        n = 80 if mode in (1, 3) else 100
        specs.append(PhaseSpec(model="wb" if p < 4 else "fb", mode=mode,
                               n_steps=n, dt=1e-3))
    T = sum(s.n_steps for s in specs)
    eng = make_fused_engine(specs, HSDDPOptions(), 1.5, -0.404, 0.0, xla_dtype)
    plan = eng["plan"]
    seg = segment_plan_of(plan)

    lin = synth_lin(B, T, xla_dtype)
    reg = jnp.full((B,), 1.0, xla_dtype)

    print(f"devices={jax.devices()} B={B} T={T} xla_dtype={xla_dtype.__name__}",
          flush=True)

    xla_bwd = jax.jit(jax.vmap(eng["backward"], in_axes=(0, 0)))
    pls_bwd = jax.jit(lambda l, r: backward_batched_pallas(seg, l, r))

    t0 = time.time()
    ok_x, dV_x, ctg_x = jax.block_until_ready(xla_bwd(lin, reg))
    print(f"xla compile+run: {time.time()-t0:.1f}s ok={np.asarray(ok_x).all()}",
          flush=True)
    t0 = time.time()
    ok_p, dV_p, ctg_p = jax.block_until_ready(pls_bwd(lin, reg))
    print(f"pallas compile+run: {time.time()-t0:.1f}s ok={np.asarray(ok_p).all()}",
          flush=True)

    sd = np.nanmax(np.abs(np.asarray(ctg_x.du)))
    err_du = np.nanmax(np.abs(np.asarray(ctg_p.du) - np.asarray(ctg_x.du)))
    err_K = np.nanmax(np.abs(np.asarray(ctg_p.Kfb) - np.asarray(ctg_x.Kfb)))
    print(f"parity: max|ddu|={err_du:.3e} (scale {sd:.3e}) max|dK|={err_K:.3e}",
          flush=True)

    for name, fn in [("xla", xla_bwd), ("pallas", pls_bwd)]:
        ts = []
        for _ in range(5):
            t0 = time.time()
            jax.block_until_ready(fn(lin, reg))
            ts.append(time.time() - t0)
        best = min(ts)
        print(f"{name}: best {best*1e3:.2f} ms  ({B/best:.0f} sweeps/s)",
              flush=True)


if __name__ == "__main__":
    main()
