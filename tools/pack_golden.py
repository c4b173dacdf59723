#!/usr/bin/env python3
"""Pack reference golden data + kernel I/O probes into compressed .npz archives.

The reference binary (`mhpc_ctrl`, see /root/reference/test_main.cpp:12-34) was
built out-of-tree per the recipe in BASELINE.md and run to produce:
  - state.txt / control.txt / gradient.txt / cost.txt  (720 rows each)
  - probe_*.bin: dense I/O of every generated CasADi kernel at 400 random
    samples (captured via the casadi_interface scatter, CasadiGen.cpp:46-68)

Outputs:
  tests/golden/reference_run.npz   - the golden default-run trajectories
  tests/golden/kernel_probes.npz   - kernel I/O samples for dynamics validation
"""
import numpy as np
import os
import sys

RUN_DIR = sys.argv[1] if len(sys.argv) > 1 else "/tmp/refrun"
OUT_DIR = os.path.join(os.path.dirname(__file__), "..", "tests", "golden")

def load(name, shape):
    a = np.fromfile(os.path.join(RUN_DIR, name), dtype=np.float64)
    return a.reshape(shape)

N = 400
# Column-major (Eigen default) matrices flattened: reshape with order='F' later.
probes = {
    "x": load("probe_x.bin", (N, 14)),
    "u": load("probe_u.bin", (N, 4)),
    "dyn_fl": load("probe_dyn_fl.bin", (N, 18)),
    "dyn_bs": load("probe_dyn_bs.bin", (N, 18)),
    "dyn_fs": load("probe_dyn_fs.bin", (N, 18)),
    "par_fl": load("probe_par_fl.bin", (N, 196 + 56 + 56 + 16)),
    "par_bs": load("probe_par_bs.bin", (N, 196 + 56 + 56 + 16)),
    "par_fs": load("probe_par_fs.bin", (N, 196 + 56 + 56 + 16)),
    "imp_f": load("probe_imp_f.bin", (N, 18)),
    "imp_b": load("probe_imp_b.bin", (N, 18)),
    "imp_f_par": load("probe_imp_f_par.bin", (N, 196)),
    "imp_b_par": load("probe_imp_b_par.bin", (N, 196)),
    "jac_f": load("probe_jac_f.bin", (N, 28)),
    "jac_b": load("probe_jac_b.bin", (N, 28)),
    "tc1": load("probe_tc1.bin", (N, 1 + 14 + 196)),
    "tc2": load("probe_tc2.bin", (N, 1 + 14 + 196)),
}

def load_ragged(name):
    """WB rows have 14 cols, FB rows 6 (4/4 in control.txt); right-pad with NaN."""
    rows = []
    with open(os.path.join(RUN_DIR, name)) as f:
        for line in f:
            vals = [float(v) for v in line.split()]
            if vals:
                rows.append(vals)
    width = max(len(r) for r in rows)
    out = np.full((len(rows), width), np.nan)
    for i, r in enumerate(rows):
        out[i, : len(r)] = r
    return out

golden = {
    "state": load_ragged("state.txt"),
    "control": load_ragged("control.txt"),
    "gradient": load_ragged("gradient.txt"),
    "cost": load_ragged("cost.txt"),
}

os.makedirs(OUT_DIR, exist_ok=True)
np.savez_compressed(os.path.join(OUT_DIR, "kernel_probes.npz"), **probes)
np.savez_compressed(os.path.join(OUT_DIR, "reference_run.npz"), **golden)
print("packed:", {k: v.shape for k, v in golden.items()})
print("probe keys:", list(probes))
