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
    specs = loco.problem.specs
    P = len(specs)
    _write_rows(os.path.join(out_dir, "state.txt"),
                [result.nominal[p].x for p in range(P)])
    _write_rows(os.path.join(out_dir, "control.txt"),
                [result.nominal[p].u for p in range(P)])
    _write_rows(os.path.join(out_dir, "gradient.txt"),
                [result.ctg[p].G for p in range(P)])
    # cost.txt: running-cost gradient rows for k < N-1 then terminal Phix
    blocks = []
    for p in range(P):
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
