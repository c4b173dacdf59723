"""Debug dump + structured run logging.

`dump_debug_files` mirrors MHPCLocomotion::print_debugInfo
(MHPCLocomotion.cpp:293-380): four whitespace-separated text files with one
row per timestep, WB phases then FB phases.  Unlike the reference (which
indexes FB rows with a hardcoded `i+2`, see SURVEY.md 2.5.5), all four
files use the correct phase lengths here.
"""
from __future__ import annotations

import json
import os
import time

import numpy as np


def _write_rows(path, blocks):
    with open(path, "w") as f:
        for block in blocks:
            for row in np.asarray(block):
                f.write(" ".join(f"{v:.6g}" for v in row) + "\n")


def dump_debug_files(loco, result, out_dir="."):
    """Writes state.txt / control.txt / gradient.txt / cost.txt."""
    os.makedirs(out_dir, exist_ok=True)
    state, control, grad = loco.dump_arrays(result)
    _write_rows(os.path.join(out_dir, "state.txt"), [state])
    _write_rows(os.path.join(out_dir, "control.txt"), [control])
    _write_rows(os.path.join(out_dir, "gradient.txt"), [grad])
    # cost.txt: running-cost gradient rows for k < N-1 then terminal Phix
    if loco.engine == "fused":
        lx = np.asarray(result.lin.lx)
        phix = np.asarray(result.lin.phix)
        rows = []
        for a, b, _ in loco.phase_slices():
            rows.append(np.concatenate([lx[a : b - 1], phix[b - 1 : b]], axis=0))
        _write_rows(os.path.join(out_dir, "cost.txt"), rows)
    else:
        blocks = []
        for p in range(len(loco.problem.specs)):
            lx = np.asarray(result.lin[p].lx)
            phix = np.asarray(result.lin[p].phix)[None, :]
            blocks.append(np.concatenate([lx, phix], axis=0))
        _write_rows(os.path.join(out_dir, "cost.txt"), blocks)


def log_solve_stats(result, path=None):
    """One-line JSON stats record (cost, violation, abort flag)."""
    rec = dict(
        ts=time.time(),
        cost=float(np.asarray(result.cost)),
        tconstr_violation=float(np.asarray(result.viol)),
        aborted=bool(np.asarray(result.aborted)),
    )
    line = json.dumps(rec)
    if path:
        with open(path, "a") as f:
            f.write(line + "\n")
    return line
