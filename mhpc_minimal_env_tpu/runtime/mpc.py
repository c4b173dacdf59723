"""Receding-horizon MPC driver (fused engine).

The reference *declares* the receding-horizon loop but never implements it:
`MHPCLocomotion::run()` is declared (MHPCLocomotion.h:25) and undefined, and
`update_problem` (MHPCLocomotion.cpp:107-158) — the phase-ring rotation — is
written but never called.  This module implements that loop for real, the
TPU way: one compiled cycle per gait mode, vmappable over scenario batches.

Cycle semantics (mirroring update_problem's data rotation):
  1. solve the multi-phase problem at the current mode (warm-started from
     the previous cycle's rotated solution)
  2. execute phase 0: roll the plant through the phase-0 horizon applying
     u = u_nom + K (x - x_nom)   (the ms_exec/CTG_exec execution buffers,
     MHPCLocomotion.cpp:178-194)
  3. apply the phase-0 reset map -> next cycle's x0
  4. advance cmode (Gait::get_next_mode) and rotate the warm-start data one
     phase left within each model group — the pidx_WB/pidx_FB ring rotation,
     realized as a precomputed gridpoint permutation (gather) on the fused
     trajectory arrays, with pad-by-last-row where phase lengths differ.
"""
from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from ..models import gait as G
from ..ops import linalg as LA
from ..models import quadruped as Q
from ..solver.fused_hsddp import build_fused_solver
from ..types import HSDDPOptions
from .locomotion import MHPCProblem, default_problem, warmstart_nominal


class MPCCycleResult(NamedTuple):
    x_next: jnp.ndarray       # plant state entering the next cycle
    x_exec: jnp.ndarray       # (N0-1, 14) executed plant trajectory
    u_exec: jnp.ndarray       # (N0-1, 4) executed controls
    cost: jnp.ndarray
    viol: jnp.ndarray
    warm_x: jnp.ndarray       # rotated warm start for the next cycle
    warm_u: jnp.ndarray


def _rotation_permutation(specs_now, specs_next, n_wb):
    """Gridpoint gather indices mapping this cycle's solution onto the next
    problem's layout (phase ring rotated one left per model group)."""
    def blocks(specs):
        out, t0 = [], 0
        for s in specs:
            out.append((t0, s.n_steps))
            t0 += s.n_steps
        return out

    bnow = blocks(specs_now)
    P = len(specs_now)
    order = (list(range(1, n_wb)) + [0]
             + list(range(n_wb + 1, P)) + [n_wb])
    perm = []
    for p_next, s_next in enumerate(specs_next):
        src_start, src_len = bnow[order[p_next]]
        idx = np.arange(s_next.n_steps)
        idx = np.minimum(idx, src_len - 1) + src_start
        perm.append(idx)
    return np.concatenate(perm)


class RecedingHorizonMPC:
    """MPC driver over the bounding gait; one jitted cycle per cmode."""

    def __init__(self, n_wbphase=4, n_fbphase=4, dtype=jnp.float64,
                 opt: HSDDPOptions = HSDDPOptions(), feedback: bool = True,
                 dt=None, duration_scale: float = 1.0):
        self.dtype = dtype
        self.n_wb = n_wbphase
        self._cycles = {}
        self._cycle_fns = {}
        self._bcycles = {}
        self.problems = {}
        solvers = {}
        dt_kw = {} if dt is None else dict(dt_wb=dt, dt_fb=dt)
        for cmode in (1, 2, 3, 4):
            problem = default_problem(
                n_wbphase=n_wbphase, n_fbphase=n_fbphase, cmode=cmode,
                opt=opt, duration_scale=duration_scale, **dt_kw
            )
            self.problems[cmode] = problem
            solvers[cmode], _ = build_fused_solver(
                list(problem.specs), problem.opt, problem.vel_cmd,
                problem.ground_height, problem.height_cmd, dtype,
            )
        for cmode in (1, 2, 3, 4):
            problem = self.problems[cmode]
            spec0 = problem.specs[0]
            nmode = G.next_mode(cmode)
            perm = jnp.asarray(_rotation_permutation(
                problem.specs, self.problems[nmode].specs, n_wbphase
            ))
            n0 = spec0.n_steps

            def cycle(x0, warm_x, warm_u, _solve=solvers[cmode],
                      _spec0=spec0, _perm=perm, _n0=n0):
                res = _solve(x0, warm_x, warm_u)
                nom_x = res.nominal.x[:_n0]
                nom_u = res.nominal.u[:_n0]
                Kfb = res.ctg.Kfb[:_n0]

                def step(x, inp):
                    nx, nu, Kk = inp
                    u = nu + (LA.mv(Kk, x - nx) if feedback else 0.0)
                    x_next, _ = Q.wb_step(x, u, _spec0.mode, _spec0.dt)
                    return x_next, (x, u)

                xe, (xs, us) = jax.lax.scan(
                    step, x0, (nom_x[:-1], nom_u[:-1], Kfb[:-1])
                )
                x_next = Q.resetmap(xe, _spec0.mode)[0]
                return MPCCycleResult(
                    x_next=x_next, x_exec=xs, u_exec=us,
                    cost=res.cost, viol=res.viol,
                    warm_x=res.nominal.x[_perm],
                    warm_u=res.nominal.u[_perm],
                )

            self._cycle_fns[cmode] = cycle
            self._cycles[cmode] = jax.jit(cycle)

    def _initial_warm(self, cmode: int, x0):
        """Bounding-PD warm start flattened to the fused layout (traceable,
        so it vmaps over scenario batches)."""
        nominal = warmstart_nominal(self.problems[cmode], x0, self.dtype)
        pad = lambda a: (
            a if a.shape[1] == 14
            else jnp.concatenate(
                [a, jnp.zeros((a.shape[0], 14 - a.shape[1]), self.dtype)], 1)
        )
        warm_x = jnp.concatenate([pad(t.x) for t in nominal])
        warm_u = jnp.concatenate([t.u for t in nominal])
        return warm_x, warm_u

    def run(self, x0, n_cycles: int, cmode: int = 1):
        """Host-driven receding-horizon loop; returns per-cycle results."""
        x = jnp.asarray(x0, dtype=self.dtype)
        warm_x, warm_u = self._initial_warm(cmode, x)
        out = []
        for _ in range(n_cycles):
            res = self._cycles[cmode](x, warm_x, warm_u)
            out.append(res)
            x = res.x_next
            warm_x, warm_u = res.warm_x, res.warm_u
            cmode = G.next_mode(cmode)
        return out

    def run_batched(self, x0_batch, n_cycles: int, cmode: int = 1):
        """Receding-horizon MPC over a (B, 14) scenario batch: every cycle is
        ONE compiled program (vmapped solve + plant rollout + warm rotation).
        This is the «batched MPC» production config (BASELINE.json config 4);
        the per-cycle batch stays device-resident between cycles."""
        x = jnp.asarray(x0_batch, dtype=self.dtype)
        mode0 = cmode
        warm_x, warm_u = jax.jit(
            jax.vmap(lambda xx: self._initial_warm(mode0, xx))
        )(x)
        out = []
        for _ in range(n_cycles):
            bc = self._bcycles.get(cmode)
            if bc is None:
                bc = jax.jit(jax.vmap(self._cycle_fns[cmode]))
                self._bcycles[cmode] = bc
            res = bc(x, warm_x, warm_u)
            out.append(res)
            x = res.x_next
            warm_x, warm_u = res.warm_x, res.warm_u
            cmode = G.next_mode(cmode)
        return out
