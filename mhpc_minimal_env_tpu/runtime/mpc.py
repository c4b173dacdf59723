"""Receding-horizon MPC driver on the staged batched engine.

The reference *declares* the receding-horizon loop but never implements it:
`MHPCLocomotion::run()` is declared (MHPCLocomotion.h:25) and undefined, and
`update_problem` (MHPCLocomotion.cpp:107-158) — the phase-ring rotation — is
written but never called.  This module implements that loop for real, the
TPU way.

Architecture (round 3): the solver is the STAGED engine (solver/staged.py)
whose jitted stage graphs take the problem `plan` as an argument.  The four
gait-mode problems (cmode rotations of the bounding cycle,
Gait::get_next_mode) share identical array shapes, so ONE set of compiled
stages serves every cycle — compile cost is paid once, not once per mode
(the round-2 monolithic-vmap driver compiled 4 full solver graphs and could
not reach B=1024 inside the bench budget).

Cycle semantics (mirroring update_problem's data rotation):
  1. solve the multi-phase problem at the current mode (warm-started from
     the previous cycle's rotated solution; bounding-PD heuristic on the
     first cycle)
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
from ..solver.fused import build_plan, initial_fused_alreb
from ..solver.staged import build_staged_solver
from ..types import HSDDPOptions
from .locomotion import default_problem


class MPCCycleResult(NamedTuple):
    x_next: jnp.ndarray       # plant state entering the next cycle
    x_exec: jnp.ndarray       # (N0-1, 14) executed plant trajectory
    u_exec: jnp.ndarray       # (N0-1, 4) executed controls
    cost: jnp.ndarray
    viol: jnp.ndarray
    warm_x: jnp.ndarray       # rotated warm start for the next cycle
    warm_u: jnp.ndarray
    alive: jnp.ndarray = None  # (B,) lanes not frozen by failure isolation


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
    """MPC driver over the bounding gait, staged engine, batched scenarios.

    One compiled stage set serves all four gait modes (plans of identical
    shapes ride through the jitted stages as arguments); per-mode state is
    data: plan, AL/ReB init, rotation permutation, phase-0 execution step.
    """

    def __init__(self, n_wbphase=4, n_fbphase=4, dtype=jnp.float64,
                 opt: HSDDPOptions = HSDDPOptions(), feedback: bool = True,
                 dt=None, duration_scale: float = 1.0, acc_dtype=None,
                 lin_chunk: int = 48):
        self.dtype = dtype
        self.n_wb = n_wbphase
        self.feedback = feedback
        self.problems = {}
        dt_kw = {} if dt is None else dict(dt_wb=dt, dt_fb=dt)
        for cmode in (1, 2, 3, 4):
            self.problems[cmode] = default_problem(
                n_wbphase=n_wbphase, n_fbphase=n_fbphase, cmode=cmode,
                opt=opt, duration_scale=duration_scale, **dt_kw
            )

        p1 = self.problems[1]
        self._solve, self._eng = build_staged_solver(
            list(p1.specs), p1.opt, p1.vel_cmd, p1.ground_height,
            p1.height_cmd, dtype, lin_chunk=lin_chunk, acc_dtype=acc_dtype,
        )
        np_dtype = np.float64 if dtype == jnp.float64 else np.float32
        self._plans, self._alreb0, self._tails_b = {}, {}, {}
        for cmode in (1, 2, 3, 4):
            pm = self.problems[cmode]
            self._plans[cmode] = (
                self._eng["plan"] if cmode == 1
                else build_plan(list(pm.specs), pm.vel_cmd, pm.height_cmd,
                                dtype=np_dtype))
            self._alreb0[cmode] = initial_fused_alreb(list(pm.specs), dtype)
            # trajectories and gains arrive CHANNEL-LAST (T, ., B) from the
            # staged solver (see solver/staged.py layout notes); the warm
            # rotation is emitted channel-last so it feeds straight back
            # into the next solve
            self._tails_b[cmode] = jax.jit(jax.vmap(
                self._make_tail(cmode), in_axes=(0, -1, -1, -1),
                out_axes=(0, 0, 0, -1, -1)))

    def _make_tail(self, cmode):
        """Per-cycle tail: execute phase 0 on the plant + rotate warm start.

        Static per mode: phase-0 (mode, dt, N) and the gridpoint
        permutation; modes sharing phase-0 length share the compiled graph
        shape family."""
        problem = self.problems[cmode]
        spec0 = problem.specs[0]
        n0 = spec0.n_steps
        perm = jnp.asarray(_rotation_permutation(
            problem.specs, self.problems[G.next_mode(cmode)].specs,
            self.n_wb))
        feedback = self.feedback

        def tail(x0, nom_x, nom_u, Kfb):
            def step(x, inp):
                nx, nu, Kk = inp
                u = nu + (LA.mv(Kk, x - nx) if feedback else 0.0)
                x_next, _ = Q.wb_step(x, u, spec0.mode, spec0.dt)
                return x_next, (x, u)

            xe, (xs, us) = jax.lax.scan(
                step, x0, (nom_x[: n0 - 1], nom_u[: n0 - 1], Kfb[: n0 - 1])
            )
            x_next = Q.resetmap(xe, spec0.mode)[0]
            return x_next, xs, us, nom_x[perm], nom_u[perm]

        return tail

    def run_batched(self, x0_batch, n_cycles: int, cmode: int = 1,
                    first_cycle_budget=None):
        """Receding-horizon MPC over a (B, 14) scenario batch.  Every cycle
        dispatches the staged solve (stage graphs shared across modes) plus
        one small jitted execute+rotate program; the batch stays
        device-resident between cycles.  This is the «batched MPC»
        production config (BASELINE.json config 4).

        Per-lane failure isolation: a lane whose solve aborts (the
        regularization ladder's hard abort, MultiPhaseDDP.cpp:221-226) or
        whose plant state goes non-finite is FROZEN — its plant state
        stops advancing and it is excluded from subsequent statistics via
        the returned `alive` mask — so one diverged scenario cannot
        poison fleet metrics or its own downstream cycles with NaNs.

        first_cycle_budget: optional (max_AL, max_DDP) for CYCLE 0 ONLY.
        Every unconverged tail lane observed in the fleet diagnosis first
        exceeds the gate at the cold-start cycle (tools/mpc_tail_diag.py,
        PERF.md §17) — its first, bounding-PD-warm-started solve does not
        converge inside the reference's fixed 2 AL x <=3 DDP budget and
        the receding-horizon loop inherits the debt.  Deepening only that
        cycle to the measured convergence budget (3, 5) drove every tail
        lane healthy (fleet max final viol 0.605 -> 0.055) at ~1.1x the
        8-cycle cost.  The budget lives in host loops, so no recompile."""
        x = jnp.asarray(x0_batch, dtype=self.dtype)
        B = x.shape[0]
        warm_x = warm_u = None
        alive = jnp.ones((B,), bool)
        out = []
        for cyc in range(n_cycles):
            deep = first_cycle_budget if (cyc == 0 and first_cycle_budget
                                          ) else (None, None)
            res = self._solve(x, warm_x, warm_u,
                              plan_=self._plans[cmode],
                              alreb0_=self._alreb0[cmode],
                              aborted0_b=~alive,
                              max_al=deep[0], max_ddp=deep[1])
            x_next, xs, us, warm_x, warm_u = self._tails_b[cmode](
                x, res.nominal.x, res.nominal.u, res.ctg.Kfb)
            # the dead-lane masking below hard-codes the channel-last
            # (T, ch, B) warm layout; fail loudly if a future solver
            # option ever emits batch-major warm arrays here
            assert warm_x.shape[-1] == B and warm_u.shape[-1] == B, (
                f"warm arrays must be channel-last (T, ch, B={B}); got "
                f"{warm_x.shape} / {warm_u.shape}")
            bad = res.aborted | ~jnp.all(jnp.isfinite(x_next), axis=-1)
            alive = alive & ~bad
            x_next = jnp.where(alive[:, None], x_next, x)
            # dead lanes: zero the (possibly NaN) rotated warm start so the
            # next solve starts from finite data, and carry the abort flag
            # in so the line-search fastpath gate skips them immediately
            # instead of forcing the full candidate sweep for everyone
            warm_x = jnp.where(alive[None, None, :], warm_x, 0.0)
            warm_u = jnp.where(alive[None, None, :], warm_u, 0.0)
            out.append(MPCCycleResult(
                x_next=x_next, x_exec=xs, u_exec=us,
                cost=res.cost, viol=res.viol,
                warm_x=warm_x, warm_u=warm_u, alive=alive,
            ))
            x = x_next
            cmode = G.next_mode(cmode)
        return out

    def run(self, x0, n_cycles: int, cmode: int = 1):
        """Single-scenario receding-horizon loop (B=1 lane of run_batched).

        Slicing is per-field because MPCCycleResult mixes layouts: warm_x /
        warm_u come out of the staged tail CHANNEL-LAST (T, ch, B) while
        everything else is batch-major (B, ...) — a uniform `a[0]` tree-map
        would slice gridpoint 0 of the warm fields instead of lane 0."""
        out_b = self.run_batched(jnp.asarray(x0)[None], n_cycles, cmode)
        return [r._replace(
            x_next=r.x_next[0], x_exec=r.x_exec[0], u_exec=r.u_exec[0],
            cost=r.cost[0], viol=r.viol[0],
            warm_x=r.warm_x[..., 0], warm_u=r.warm_u[..., 0],
            alive=r.alive[0],
        ) for r in out_b]
