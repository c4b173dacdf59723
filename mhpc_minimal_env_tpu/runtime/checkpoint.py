"""Checkpoint / resume for long scenario sweeps (orbax-backed).

The reference has no checkpointing (SURVEY.md 5.4); its closest analog is
the warm-start copy.  Here, sweep state (pending scenario batch, completed
results, RNG key) is a pytree, so checkpointing is orbax on the carry:
long multi-batch sweeps resume mid-flight after preemption.
"""
from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np


def _ocp():
    import orbax.checkpoint as ocp

    return ocp


def save_sweep_state(path: str, state: Any, step: int):
    ocp = _ocp()
    path = os.path.abspath(path)
    with ocp.CheckpointManager(path) as mgr:
        mgr.save(step, args=ocp.args.StandardSave(state))
        mgr.wait_until_finished()


def restore_sweep_state(path: str, template: Any = None):
    """Returns (state, step) of the latest checkpoint, or (None, None)."""
    ocp = _ocp()
    path = os.path.abspath(path)
    if not os.path.isdir(path):
        return None, None
    with ocp.CheckpointManager(path) as mgr:
        step = mgr.latest_step()
        if step is None:
            return None, None
        if template is not None:
            restored = mgr.restore(
                step, args=ocp.args.StandardRestore(template)
            )
        else:
            restored = mgr.restore(step)
        return restored, step


class SweepRunner:
    """Chunked scenario sweep with periodic checkpointing.

    Runs `solve_batched` over chunks of a large scenario set, appending
    per-chunk metrics, checkpointing (metrics, cursor) every chunk so a
    preempted sweep resumes where it stopped.
    """

    def __init__(self, loco, scenarios: np.ndarray, chunk: int,
                 ckpt_dir: str | None = None):
        self.loco = loco
        self.scenarios = np.asarray(scenarios)
        self.chunk = chunk
        self.ckpt_dir = ckpt_dir
        self.cursor = 0
        self.costs = []
        self.viols = []
        if ckpt_dir:
            state, _ = restore_sweep_state(ckpt_dir)
            if state is not None:
                self.cursor = int(state["cursor"])
                self.costs = [np.asarray(c) for c in state["costs"]]
                self.viols = [np.asarray(v) for v in state["viols"]]

    def run(self):
        n = self.scenarios.shape[0]
        step = len(self.costs)
        while self.cursor < n:
            batch = self.scenarios[self.cursor : self.cursor + self.chunk]
            res = self.loco.solve_batched(batch)
            self.costs.append(np.asarray(res.cost))
            self.viols.append(np.asarray(res.viol))
            self.cursor += batch.shape[0]
            step += 1
            if self.ckpt_dir:
                save_sweep_state(
                    self.ckpt_dir,
                    dict(cursor=np.asarray(self.cursor),
                         costs=list(self.costs), viols=list(self.viols)),
                    step,
                )
        return dict(
            cost=np.concatenate(self.costs), viol=np.concatenate(self.viols)
        )
