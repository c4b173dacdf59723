"""Device mesh + sharded scenario sweeps.

The reference is single-process/single-core (SURVEY.md 2.3); its natural
parallel axis is the *scenario batch* (a solve is a pure function of x0).
Here that axis is sharded over a JAX device mesh: `pjit` partitions the
vmapped solver along batch, XLA inserts the collectives, and per-scenario
metric reductions ride ICI via `psum` inside `shard_map`.

Works identically on a real TPU slice and on the CPU fake mesh
(XLA_FLAGS=--xla_force_host_platform_device_count=N) used in CI.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis: str = "batch") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis,))


def shard_batch(x, mesh: Mesh, axis: str = "batch"):
    """Place a (B, ...) array with B sharded across the mesh."""
    spec = P(axis, *([None] * (x.ndim - 1)))
    return jax.device_put(x, NamedSharding(mesh, spec))


def sharded_solve(loco, mesh: Mesh, axis: str = "batch"):
    """Batch-sharded solver: returns fn(x0_batch sharded) -> results sharded.

    The vmapped solve is trivially partitionable along batch; constraining
    the input sharding is enough for SPMD partitioning.
    """
    vsolve = jax.vmap(loco.single)

    @partial(jax.jit, in_shardings=NamedSharding(mesh, P(axis, None)))
    def run(x0_batch):
        return vsolve(x0_batch)

    return run


def sharded_metrics(loco, mesh: Mesh, axis: str = "batch"):
    """Scenario sweep that reduces metrics across the mesh with psum:
    returns fn(x0_batch) -> dict of fleet-level statistics (replicated)."""
    vsolve = jax.vmap(loco.single)

    def shard_fn(x0_shard):
        res = vsolve(x0_shard)
        n_local = x0_shard.shape[0]
        tot = jax.lax.psum(jnp.sum(res.cost), axis)
        n = jax.lax.psum(jnp.asarray(n_local, res.cost.dtype), axis)
        worst_viol = jax.lax.pmax(jnp.max(res.viol), axis)
        n_aborted = jax.lax.psum(jnp.sum(res.aborted.astype(jnp.int32)), axis)
        return dict(
            mean_cost=tot / n, worst_violation=worst_viol, aborted=n_aborted
        )

    fn = jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=P(axis, None), out_specs=P(),
        check_vma=False,
    )
    return jax.jit(fn)
