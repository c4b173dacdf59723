"""Tracking-reference generation (ReferenceGen, HSDDPSolver/source/ReferenceGen.cpp
+ ReferenceGen.h:53-109).

Host-side numpy: references depend only on (x0[0], commanded velocity/height,
phase structure) and are inputs to the jitted solver.
"""
from __future__ import annotations

import numpy as np

from ..types import PhaseRef, PhaseSpec

PI = np.pi
NOMINAL_GRF = 8.252 * 9.81  # ReferenceGen.cpp:42

# terminal WB state references per mode (ReferenceGen.cpp:45-52); x[0] and
# vx are filled per-problem.
_WB_TERM = np.zeros((4, 14))
_WB_TERM[0] = [0, -0.1432, -PI / 25, 0.35 * PI, -0.65 * PI, 0.35 * PI, -0.6 * PI, 0, 1, 0, 0, 0, 0, 0]
_WB_TERM[1] = [0, -0.1418, PI / 35, 0.2 * PI, -0.58 * PI, 0.25 * PI, -0.7 * PI, 0, -1, 0, 0, 0, 0, 0]
_WB_TERM[2] = [0, -0.1325, -PI / 40, 0.33 * PI, -0.48 * PI, 0.33 * PI, -0.75 * PI, 0, 1, 0, 0, 0, 0, 0]
_WB_TERM[3] = [0, -0.1490, -PI / 25, 0.35 * PI, -0.7 * PI, 0.25 * PI, -0.60 * PI, 0, -1, 0, 0, 0, 0, 0]

_QJOINT_BIAS = np.array([0.3 * PI, -0.7 * PI, 0.3 * PI, -0.7 * PI])


def generate_references(phase_specs, x0_pos, vel_cmd, height_cmd):
    """Per-phase PhaseRef list.

    Forward position integrates pos += vel*dt within each phase
    (ReferenceGen.h:94-109); phase k=0 of phase p continues from the previous
    phase's LAST gridpoint value.
    """
    refs = []
    pos0 = float(x0_pos)
    for p, spec in enumerate(phase_specs):
        n, dt = spec.n_steps, spec.dt
        pos = pos0 + vel_cmd * dt * np.arange(n)
        x = np.zeros((n, spec.xsize))
        u = np.zeros((n, 4))
        y = np.zeros((n, 4))
        if spec.model == "wb":
            # running reference (ReferenceGen.h:67-69)
            x[:, 0] = pos
            x[:, 1] = height_cmd
            x[:, 3:7] = _QJOINT_BIAS
            x[:, 7] = vel_cmd
            y[:, 1] = NOMINAL_GRF
            y[:, 3] = NOMINAL_GRF
            # terminal reference (ReferenceGen.h:80-84)
            xt = _WB_TERM[spec.mode - 1].copy()
            xt[0] = pos[-1]
            xt[7] = vel_cmd
            x[-1] = xt
        else:
            # running (ReferenceGen.h:73-76)
            x[:, 0] = pos
            x[:, 1] = height_cmd
            x[:, 3] = vel_cmd
            u[:, 1] = NOMINAL_GRF
            u[:, 3] = NOMINAL_GRF
            # terminal (ReferenceGen.h:87-88)
            x[-1, :] = [pos[-1], height_cmd, 0, vel_cmd, 0, 0]
        # NOTE (reference quirk): rows 0..N-2 are "running" refs; the loop in
        # generate_ref writes k < N-1 then overwrites row N-1 with the
        # terminal ref, which we already did above.
        refs.append(PhaseRef(x=x, u=u, y=y))
        pos0 = pos[-1]
    return refs


def reference_templates(phase_specs, vel_cmd, height_cmd):
    """Static per-phase reference templates with x-position zeroed at x0=0.

    The references depend on the problem's initial state only through
    x0[0], added to column 0 of x linearly — so inside jit (and under vmap
    over scenarios) the per-lane references are `template + x0[0] * e0`.
    """
    return generate_references(phase_specs, 0.0, vel_cmd, height_cmd)


def make_reference_fn(phase_specs, vel_cmd, height_cmd, dtype):
    """Returns refs_fn(x0) usable inside jit/vmap."""
    import jax.numpy as jnp

    templates = [
        PhaseRef(*(jnp.asarray(a, dtype=dtype) for a in r))
        for r in reference_templates(phase_specs, vel_cmd, height_cmd)
    ]

    def refs_fn(x0):
        pos0 = x0[0]
        out = []
        for t in templates:
            x = t.x.at[:, 0].add(pos0)
            out.append(PhaseRef(x=x, u=t.u, y=t.y))
        return out

    return refs_fn
