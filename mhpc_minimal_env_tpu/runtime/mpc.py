"""Receding-horizon MPC driver.

The reference *declares* the receding-horizon loop but never implements it:
`MHPCLocomotion::run()` is declared (MHPCLocomotion.h:25) and undefined, and
`update_problem` (MHPCLocomotion.cpp:107-158) — the phase-ring rotation — is
written but never called.  This module implements that loop for real, the
TPU way: one compiled cycle per gait mode, vmappable over scenario batches.

Cycle semantics (mirroring update_problem's data rotation):
  1. solve the 8-phase problem at the current mode
  2. execute phase 0: roll the plant through the phase-0 horizon applying
     u = u_nom + K (x - x_nom)   (the ms_exec/CTG_exec execution buffers,
     MHPCLocomotion.cpp:178-194)
  3. apply the phase-0 reset map -> next cycle's x0
  4. advance cmode (Gait::get_next_mode) and rotate the warm-start data one
     phase left within each model group — exactly the pidx_WB/pidx_FB ring
     rotation, which is shape-consistent because the mode sequence shifts by
     one (N_new[i] = N_old[i+1]).
  5. AL/ReB parameters re-initialize fresh (update_problem calls
     SinglePhase::initialization each cycle).
"""
from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from ..models import gait as G
from ..models import quadruped as Q
from ..solver.hsddp import build_solver
from ..solver.phase import PhaseTraj
from ..solver.reference_gen import make_reference_fn
from ..types import HSDDPOptions
from .locomotion import (
    MHPCProblem, default_problem, initial_al_reb, warmstart_nominal,
)


def _resize_rows(a, n):
    if a.shape[0] == n:
        return a
    if a.shape[0] > n:
        return a[:n]
    pad = jnp.repeat(a[-1:], n - a.shape[0], axis=0)
    return jnp.concatenate([a, pad], axis=0)


def _adapt_traj(t: "PhaseTraj", spec, dtype):
    n_tc = 1 if (spec.model == "wb" and spec.mode in (2, 4)) else 0
    return PhaseTraj(
        x=_resize_rows(t.x, spec.n_steps),
        u=_resize_rows(t.u, spec.n_steps),
        y=_resize_rows(t.y, spec.n_steps),
        V=jnp.zeros((), dtype=dtype),
        h=jnp.zeros(n_tc, dtype=dtype),
    )


class MPCCycleResult(NamedTuple):
    x_next: jnp.ndarray       # plant state entering the next cycle
    x_exec: jnp.ndarray       # (N0, 14) executed plant trajectory
    u_exec: jnp.ndarray       # (N0, 4) executed controls
    cost: jnp.ndarray
    viol: jnp.ndarray
    nominal: list             # warm-start payload for the next cycle (rotated)


class RecedingHorizonMPC:
    """MPC driver over the bounding gait; one jitted cycle per cmode."""

    def __init__(self, n_wbphase=4, n_fbphase=4, dtype=jnp.float64,
                 opt: HSDDPOptions = HSDDPOptions(), feedback: bool = True):
        self.dtype = dtype
        self.n_wb = n_wbphase
        self.n_fb = n_fbphase
        self._cycles = {}
        self.problems = {}
        for cmode in (1, 2, 3, 4):
            problem = default_problem(
                n_wbphase=n_wbphase, n_fbphase=n_fbphase, cmode=cmode, opt=opt
            )
            self.problems[cmode] = problem
            solve_fn, _ = build_solver(
                list(problem.specs), problem.opt,
                problem.vel_cmd, problem.ground_height,
            )
            refs_fn = make_reference_fn(
                problem.specs, problem.vel_cmd, problem.height_cmd, dtype
            )
            alreb0 = initial_al_reb(problem, dtype)
            spec0 = problem.specs[0]

            def cycle(x0, nominal0, _solve=solve_fn, _refs=refs_fn,
                      _alreb=alreb0, _spec0=spec0):
                res = _solve(x0, _refs(x0), nominal0, _alreb)
                # execute phase 0 on the plant with the solved policy
                nom0 = res.nominal[0]
                ctg0 = res.ctg[0]

                def step(x, inp):
                    nx, nu, Kk = inp
                    # execution policy: feedforward = updated nominal control
                    # (du is already absorbed post line search) + feedback
                    u = nu + (Kk @ (x - nx) if feedback else 0.0)
                    x_next, _ = Q.wb_step(x, u, _spec0.mode, _spec0.dt)
                    return x_next, (x, u)

                xe, (xs, us) = jax.lax.scan(
                    step, x0,
                    (nom0.x[:-1], nom0.u[:-1], ctg0.Kfb[:-1]),
                )
                x_next = Q.resetmap(xe, _spec0.mode)[0]
                # warm-start rotation (update_problem's pidx ring), adapted
                # to the next problem's phase shapes (the reference keeps
                # N_MAX-sized ring buffers; we truncate/pad-by-last-row)
                wb = res.nominal[: self.n_wb]
                fb = res.nominal[self.n_wb:]
                rotated = wb[1:] + wb[:1] + fb[1:] + fb[:1]
                next_specs = self.problems[G.next_mode(_spec0.mode)].specs
                rotated = [
                    _adapt_traj(t, s, x0.dtype)
                    for t, s in zip(rotated, next_specs)
                ]
                return MPCCycleResult(
                    x_next=x_next, x_exec=xs, u_exec=us,
                    cost=res.cost, viol=res.viol, nominal=rotated,
                )

            self._cycles[cmode] = jax.jit(cycle)

    def run(self, x0, n_cycles: int, cmode: int = 1):
        """Host-driven receding-horizon loop; returns per-cycle results."""
        x = jnp.asarray(x0, dtype=self.dtype)
        nominal = warmstart_nominal(self.problems[cmode], x, self.dtype)
        out = []
        for _ in range(n_cycles):
            res = self._cycles[cmode](x, nominal)
            out.append(res)
            x = res.x_next
            nominal = res.nominal
            cmode = G.next_mode(cmode)
        return out
