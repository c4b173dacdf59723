"""Multi-host (multi-process) distributed scenario sweeps.

The reference is strictly single-process (SURVEY.md §2.3); the distributed
analog defined for this framework (SURVEY.md §5.8, BASELINE config 5
``pod_sweep`` at N>=2 hosts) is single-controller JAX:

  - every host calls :func:`initialize` (jax.distributed.initialize) and
    then sees the GLOBAL device set;
  - the mesh is 2-D ``(dcn, ici)`` = (process/host, local chips): batch
    lanes shard over both axes, metric reductions psum over ``ici`` first
    (rides the intra-slice interconnect) then ``dcn`` (the data-center
    network between hosts) — XLA lowers a psum over both named axes to
    exactly that hierarchy;
  - per-host input construction uses `jax.make_array_from_process_local_data`
    so no host ever materializes the global batch.

CI runs this for real with N>=2 *processes* on CPU
(tests/test_distributed.py spawns workers over localhost), which exercises
the identical code path a TPU pod uses — only the transport differs.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DCN_AXIS = "dcn"   # across hosts / processes
ICI_AXIS = "ici"   # across a host's local devices


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None,
               local_device_ids=None) -> None:
    """Bring up the JAX distributed runtime (idempotent).

    On TPU pods all arguments are auto-detected from the environment; for
    CPU/GPU multi-process runs pass them explicitly.
    """
    if jax.distributed.is_initialized():
        return
    # NB: must run before anything touches the XLA backend (jax.devices()
    # etc.), so this check must not itself initialize the backend.
    kwargs = {}
    if coordinator_address is not None:
        kwargs.update(coordinator_address=coordinator_address,
                      num_processes=num_processes, process_id=process_id)
    if local_device_ids is not None:
        kwargs.update(local_device_ids=local_device_ids)
    jax.distributed.initialize(**kwargs)


def make_host_mesh() -> Mesh:
    """2-D ``(dcn, ici)`` mesh: hosts x local devices.

    Works on a single process too (dcn axis of size 1), so the same solver
    code serves laptop, single chip, and pod.
    """
    n_proc = jax.process_count()
    devs = sorted(jax.devices(), key=lambda d: (d.process_index, d.id))
    per_host = len(devs) // n_proc
    grid = np.asarray(devs).reshape(n_proc, per_host)
    return Mesh(grid, (DCN_AXIS, ICI_AXIS))


def host_local_batch(x0_global_fn, B_global: int, mesh: Mesh, dtype=None):
    """Build a globally-sharded (B, 14) batch without materializing it on
    any single host: each process generates only its slice.

    ``x0_global_fn(lo, hi)`` must return rows [lo, hi) of the global batch
    (deterministic in the row index, e.g. seeded per row).
    """
    n_proc = jax.process_count()
    assert B_global % n_proc == 0, (B_global, n_proc)
    per = B_global // n_proc
    pid = jax.process_index()
    local = np.asarray(x0_global_fn(pid * per, (pid + 1) * per))
    if dtype is not None:
        local = local.astype(dtype)
    sharding = NamedSharding(mesh, P((DCN_AXIS, ICI_AXIS)))
    return jax.make_array_from_process_local_data(sharding, local)


def sharded_solve_2d(solve_single, mesh: Mesh):
    """jit the vmapped solver with batch sharded over (dcn, ici)."""
    vsolve = jax.vmap(solve_single)

    @partial(jax.jit,
             in_shardings=NamedSharding(mesh, P((DCN_AXIS, ICI_AXIS))))
    def run(x0_batch):
        return vsolve(x0_batch)

    return run


def sharded_metrics_2d(solve_single, mesh: Mesh):
    """Fleet metrics with hierarchical reduction: psum over ici then dcn.

    Returns fn(x0_batch sharded) -> dict of replicated scalars.
    """
    vsolve = jax.vmap(solve_single)

    def shard_fn(x0_shard):
        res = vsolve(x0_shard)
        n_local = x0_shard.shape[0]
        axes = (ICI_AXIS, DCN_AXIS)  # ICI reduction first, then DCN
        tot = jax.lax.psum(jnp.sum(res.cost), axes)
        n = jax.lax.psum(jnp.asarray(n_local, res.cost.dtype), axes)
        worst_viol = jax.lax.pmax(jnp.max(res.viol), axes)
        n_aborted = jax.lax.psum(jnp.sum(res.aborted.astype(jnp.int32)), axes)
        return dict(mean_cost=tot / n, worst_violation=worst_viol,
                    aborted=n_aborted)

    fn = jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=P((DCN_AXIS, ICI_AXIS)), out_specs=P(),
        check_vma=False,
    )
    return jax.jit(fn)


def result_metrics_2d(mesh: Mesh):
    """Fleet metrics from already-computed per-lane RESULT arrays, with the
    hierarchical psum (ici first, then dcn).  Works with the staged engine,
    whose orchestration runs on the host and cannot sit inside shard_map —
    only the reductions do."""
    def metrics_fn(cost, viol, aborted):
        axes = (ICI_AXIS, DCN_AXIS)
        # f32 reductions: the TPU backend lowers only SUM all-reduces in
        # f64 (a f64 pmax fails to compile); fleet stats don't need f64
        cost = cost.astype(jnp.float32)
        viol = viol.astype(jnp.float32)
        n = jax.lax.psum(jnp.asarray(cost.shape[0], cost.dtype), axes)
        return dict(
            mean_cost=jax.lax.psum(jnp.sum(cost), axes) / n,
            worst_violation=jax.lax.pmax(jnp.max(viol), axes),
            aborted=jax.lax.psum(jnp.sum(aborted.astype(jnp.int32)), axes),
        )

    fn = jax.shard_map(
        metrics_fn, mesh=mesh,
        in_specs=(P((DCN_AXIS, ICI_AXIS)),) * 3, out_specs=P(),
        check_vma=False,
    )
    return jax.jit(fn)


def pod_sweep_distributed(B_global: int, dtype=None, opt=None,
                          x0_scale: float = 0.01, seed: int = 0):
    """BASELINE config 5 at N>=2 hosts: sharded sweep + fleet metrics on
    the production staged engine (stage programs SPMD-partition along the
    (dcn, ici)-sharded batch; the host orchestration is identical on every
    process, as single-controller JAX requires).

    Every process calls this after :func:`initialize`; returns (per-process
    wall time of the solve, replicated fleet metrics dict).
    """
    import time

    import jax.numpy as jnp_

    from ..runtime.locomotion import X0_DEFAULT, default_problem
    from ..solver.staged import build_staged_solver
    from ..types import HSDDPOptions

    dtype = dtype or jnp_.float64
    problem = default_problem(opt=opt or HSDDPOptions())
    solve, _ = build_staged_solver(
        list(problem.specs), problem.opt, problem.vel_cmd,
        problem.ground_height, problem.height_cmd, dtype)
    mesh = make_host_mesh()

    def rows(lo, hi):
        out = np.empty((hi - lo, 14))
        for i in range(lo, hi):
            rng = np.random.default_rng(seed + i)
            out[i - lo] = X0_DEFAULT + x0_scale * rng.normal(size=14)
        return out

    x0 = host_local_batch(rows, B_global, mesh, dtype=dtype)
    res = solve(x0)
    res.cost.block_until_ready()
    t0 = time.time()
    res = solve(x0)
    res.cost.block_until_ready()
    dt = time.time() - t0
    metrics = {k: float(v) for k, v in result_metrics_2d(mesh)(
        res.cost, res.viol, res.aborted).items()}
    return dt, metrics
