"""Multi-host distributed path, exercised with REAL separate processes.

Spawns N=2 worker processes over localhost (jax.distributed.initialize with
a CPU backend, 4 fake devices per process -> a 2x4 (dcn, ici) mesh), runs
the 2-D-sharded sweep + hierarchical psum metrics on a tiny problem, and
checks every process computed identical replicated fleet metrics.

This is the same code path a TPU pod uses (parallel/distributed.py);
only the transport differs (TCP here, ICI/DCN there).
"""
import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # multi-process: run with --runslow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import json, os, sys
sys.path.insert(0, os.environ["MHPC_REPO"])
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=4"
)
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.environ["MHPC_REPO"], ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

# NB: import ONLY parallel.distributed before initialize(): the model
# modules hold jnp constants at module scope, which would initialize the
# XLA backend too early.
from mhpc_minimal_env_tpu.parallel import distributed as D

pid = int(os.environ["MHPC_PID"])
nproc = int(os.environ["MHPC_NPROC"])
D.initialize(coordinator_address=os.environ["MHPC_COORD"],
             num_processes=nproc, process_id=pid)

from mhpc_minimal_env_tpu.runtime.locomotion import (
    X0_DEFAULT, default_problem,
)
from mhpc_minimal_env_tpu.solver.staged import build_staged_solver
from jax.sharding import PartitionSpec as P

assert jax.process_count() == nproc, jax.process_count()
assert len(jax.devices()) == 4 * nproc, len(jax.devices())

mesh = D.make_host_mesh()
assert mesh.devices.shape == (nproc, 4), mesh.devices.shape

# the PRODUCTION engine + problem shape: all 8 phases of the default
# bounding problem (every impact seam + the WB->FB projection), staged
# solver, 1 AL x 1 DDP; quarter horizons keep the 2-process CPU CI fast
from mhpc_minimal_env_tpu.types import HSDDPOptions
problem = default_problem(opt=HSDDPOptions(max_AL_iter=1, max_DDP_iter=1),
                          duration_scale=0.25)
solve, _ = build_staged_solver(
    list(problem.specs), problem.opt, problem.vel_cmd,
    problem.ground_height, problem.height_cmd, jnp.float64)

B = 16  # 2 lanes per device

def rows(lo, hi):
    out = np.empty((hi - lo, 14))
    for i in range(lo, hi):
        rng = np.random.default_rng(100 + i)
        out[i - lo] = X0_DEFAULT + 0.01 * rng.normal(size=14)
    return out

x0 = D.host_local_batch(rows, B, mesh)
# per-process slice really is local-only:
assert x0.shape == (B, 14)
local_rows = sum(s.data.shape[0] for s in x0.addressable_shards)
assert local_rows == B // nproc, local_rows

res = solve(x0)
res.cost.block_until_ready()
assert res.cost.shape == (B,)
metrics = D.result_metrics_2d(mesh)(res.cost, res.viol, res.aborted)
out = {k: float(v) for k, v in metrics.items()}
out["pid"] = pid
out["ndev"] = len(jax.devices())
print("RESULT " + json.dumps(out), flush=True)
"""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_distributed_sweep(tmp_path):
    nproc = 2
    coord = f"127.0.0.1:{_free_port()}"
    worker_py = tmp_path / "worker.py"
    worker_py.write_text(WORKER)
    procs = []
    for pid in range(nproc):
        env = dict(os.environ)
        env.update(MHPC_REPO=REPO, MHPC_PID=str(pid), MHPC_NPROC=str(nproc),
                   MHPC_COORD=coord)
        env.pop("JAX_PLATFORMS", None)
        procs.append(subprocess.Popen(
            [sys.executable, "-u", str(worker_py)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        ))
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=900)
        outs.append(out)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-3000:]}"
    results = []
    for out in outs:
        lines = [l for l in out.splitlines() if l.startswith("RESULT ")]
        assert lines, out[-2000:]
        results.append(json.loads(lines[-1][len("RESULT "):]))
    # global device view + identical replicated metrics on every process
    assert all(r["ndev"] == 8 for r in results)
    m0, m1 = results
    for k in ("mean_cost", "worst_violation", "aborted"):
        np.testing.assert_allclose(m0[k], m1[k], rtol=0, atol=0)
    assert np.isfinite(m0["mean_cost"])
