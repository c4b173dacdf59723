"""Multi-phase Hybrid-Systems DDP (the reference's MultiPhaseDDP::solve,
HSDDPSolver/source/MultiPhaseDDP.cpp:154-289) as one jit-able pure function.

Control-flow mapping (batch-synchronous redesign of the reference's loops):
  - AL outer loop (max_AL_iter) and DDP inner loop (max_DDP_iter):
    statically unrolled with done-masking (small fixed trip counts), so the
    same compiled program serves every batch lane.
  - regularization retry (MultiPhaseDDP.cpp:209-227) and backtracking line
    search (:130-151): lax.while_loop.
  - phase chaining with reset maps + state projection: static Python loop
    over the (static) phase list, unrolled into the trace.

Everything operates on lists-of-pytrees indexed by phase; shapes are static
per phase.  vmap over x0/references gives the batched scenario solver.
"""
from __future__ import annotations

from typing import List, NamedTuple

import jax
import jax.numpy as jnp

from ..types import ALReBState, HSDDPOptions, PhaseSpec
from . import constraints as CONSTR
from .phase import PhaseCTG, PhaseLin, PhaseTraj, make_phase

LS_EPS_MIN = 0.1**10       # pow(0.1,10) in forward_iteration (MultiPhaseDDP.cpp:135)
REG_MIN = 1e-3
REG_MAX = 1000.0


def tree_where(pred, on_true, on_false):
    return jax.tree_util.tree_map(
        lambda a, b: jnp.where(pred, a, b), on_true, on_false
    )


def project_wb_to_fb(x):
    """stateProj (MHPCLocomotion.cpp:32-34): picks (x,z,pitch,vx,vz,omega)."""
    return jnp.concatenate([x[:3], x[7:10]])


class SolverCarry(NamedTuple):
    nominal: List[PhaseTraj]
    ctg: List[PhaseCTG]
    lin: List[PhaseLin]
    alreb: List[ALReBState]
    cost: jnp.ndarray
    viol: jnp.ndarray
    reg: jnp.ndarray
    aborted: jnp.ndarray


def build_solver(specs: List[PhaseSpec], opt: HSDDPOptions,
                 vel_cmd: float, ground_height: float):
    """Returns (solve_fn, phases).  solve_fn(x0, refs, nominal0, alreb0)."""
    phases = [make_phase(s, vel_cmd, ground_height) for s in specs]
    P = len(phases)

    # ---------------------------------------------------------- multi rollout
    def multi_rollout(x0, nominal, ctg, eps, refs, alrebs, reb_on):
        trajs = []
        xp = x0
        V = jnp.zeros((), dtype=x0.dtype)
        viol_sq = jnp.zeros((), dtype=x0.dtype)
        for p in range(P):
            tr = phases[p]["rollout"](
                xp, nominal[p].x, nominal[p].u, ctg[p], eps,
                refs[p], alrebs[p], reb_on,
            )
            trajs.append(tr)
            V = V + tr.V
            viol_sq = viol_sq + jnp.sum(tr.h**2)
            if p + 1 < P:
                xe = phases[p]["transition_state"](tr.x[-1])
                if specs[p].model == "wb" and specs[p + 1].model == "fb":
                    xe = project_wb_to_fb(xe)
                xp = xe
        return trajs, V, jnp.sqrt(viol_sq)

    # -------------------------------------------------------- multi linearize
    def multi_linearize(nominal, refs, alrebs, reb_on, include_al_grad):
        return [
            phases[p]["linearize"](nominal[p], refs[p], alrebs[p], reb_on,
                                   include_al_grad)
            for p in range(P)
        ]

    # --------------------------------------------------------- multi backward
    def multi_backward(lins, nominal, reg):
        """MultiPhaseDDP::backward_sweep (:100-127) + impact_aware_step (:299-341)."""
        dtype = nominal[0].x.dtype
        G = jnp.zeros(specs[-1].xsize, dtype=dtype)
        H = jnp.zeros((specs[-1].xsize, specs[-1].xsize), dtype=dtype)
        dV = jnp.zeros((), dtype=dtype)
        ok_all = jnp.asarray(True)
        ctgs = [None] * P
        for p in reversed(range(P)):
            if p + 1 < P:
                # CTG handoff through reset map (+ projection at WB->FB seam)
                Px = phases[p]["transition_jac"](nominal[p].x[-1])
                if specs[p].model == "wb" and specs[p + 1].model == "fb":
                    S = jnp.zeros((6, 14), dtype=dtype)
                    S = S.at[0:3, 0:3].set(jnp.eye(3, dtype=dtype))
                    S = S.at[3:6, 7:10].set(jnp.eye(3, dtype=dtype))
                    SPx = S @ Px
                    G = SPx.T @ G
                    H = SPx.T @ H @ SPx
                else:
                    G = Px.T @ G
                    H = Px.T @ H @ Px
            ok, dV, ctg_p, G, H = phases[p]["backward"](lins[p], G, H, dV, reg)
            ctgs[p] = ctg_p
            ok_all = ok_all & ok
        return ok_all, dV, ctgs

    # -------------------------------------------------- regularization retry
    def backward_with_retry(lins, nominal, ctg_prev, reg0):
        dtype = nominal[0].x.dtype
        dummy_dV = jnp.zeros((), dtype=dtype)

        def cond(c):
            reg, success, aborted, _, _ = c
            return (~success) & (~aborted)

        def body(c):
            reg, success, aborted, ctgs, dVexp = c
            ok, dV, new_ctgs = multi_backward(lins, nominal, reg)
            new_reg = jnp.maximum(reg * opt.update_regularization, REG_MIN)
            aborted_new = (~ok) & (new_reg > REG_MAX)
            reg_next = jnp.where(ok, reg, new_reg)
            ctgs = tree_where(ok, new_ctgs, ctgs)
            dVexp = jnp.where(ok, dV, dVexp)
            return (reg_next, ok, aborted_new, ctgs, dVexp)

        init = (jnp.asarray(reg0, dtype=dtype), jnp.asarray(False),
                jnp.asarray(False), ctg_prev, dummy_dV)
        reg, success, aborted, ctgs, dVexp = jax.lax.while_loop(cond, body, init)
        return reg, aborted, ctgs, dVexp

    # ------------------------------------------------------------ line search
    def line_search(x0, nominal, ctgs, refs, alrebs, reb_on, cost_prev, dVexp):
        dtype = nominal[0].x.dtype

        def cond(c):
            eps, accepted, trajs, V, viol = c
            return (~accepted) & (eps > LS_EPS_MIN)

        def body(c):
            eps, accepted, trajs, V, viol = c
            new_trajs, newV, new_viol = multi_rollout(
                x0, nominal, ctgs, eps, refs, alrebs, reb_on
            )
            # acceptance (MultiPhaseDDP.cpp:142)
            ok = newV <= cost_prev + opt.gamma * eps * (1.0 - eps / 2.0) * dVexp
            eps_next = jnp.where(ok, eps, eps * opt.alpha)
            return (eps_next, ok, new_trajs, newV, new_viol)

        init = (jnp.ones((), dtype=dtype), jnp.asarray(False), nominal,
                cost_prev, jnp.zeros((), dtype=dtype))
        _, _, trajs, V, viol = jax.lax.while_loop(cond, body, init)
        return trajs, V, viol

    # ------------------------------------------------------------- AL update
    def update_al_reb(alrebs, nominal, viol, reb_on):
        """udpate_AL_ReB_Param (SinglePhase.cpp:334-354) with the solve()-level
        gating (MultiPhaseDDP.cpp:273-277): penalty growth zeroed once the
        violation is below 0.03; delta/eps_ReB only update when ReB was on."""
        pen = jnp.where(viol < 0.03, 0.0, opt.update_penalty)
        out = []
        for p in range(P):
            a = alrebs[p]
            if phases[p]["has_al"]:
                lam = a.lam + a.sigma * nominal[p].h
                sigma = a.sigma * pen
            else:
                lam, sigma = a.lam, a.sigma
            if phases[p]["has_reb"]:
                delta = jnp.where(reb_on,
                                  jnp.maximum(a.delta * opt.update_relax,
                                              a.delta_min),
                                  a.delta)
                eps_reb = jnp.where(reb_on, a.eps_reb * opt.update_ReB, a.eps_reb)
            else:
                delta, eps_reb = a.delta, a.eps_reb
            out.append(ALReBState(sigma=sigma, lam=lam, delta=delta,
                                  delta_min=a.delta_min, eps_reb=eps_reb))
        return out

    # ---------------------------------------------------------------- solve
    def solve(x0, refs, nominal0, alreb0):
        dtype = x0.dtype
        zero = jnp.zeros((), dtype=dtype)
        ctg0 = [
            PhaseCTG(
                du=jnp.zeros((s.n_steps, 4), dtype=dtype),
                Kfb=jnp.zeros((s.n_steps, 4, s.xsize), dtype=dtype),
                G=jnp.zeros((s.n_steps, s.xsize), dtype=dtype),
            )
            for s in specs
        ]
        # placeholder linearization (overwritten before first use)
        lin0 = [
            PhaseLin(
                A=jnp.zeros((s.n_steps - 1, s.xsize, s.xsize), dtype=dtype),
                B=jnp.zeros((s.n_steps - 1, s.xsize, 4), dtype=dtype),
                Cm=jnp.zeros((s.n_steps - 1, 4, s.xsize), dtype=dtype),
                D=jnp.zeros((s.n_steps - 1, 4, 4), dtype=dtype),
                lx=jnp.zeros((s.n_steps - 1, s.xsize), dtype=dtype),
                lu=jnp.zeros((s.n_steps - 1, 4), dtype=dtype),
                ly=jnp.zeros((s.n_steps - 1, 4), dtype=dtype),
                lxx=jnp.zeros((s.n_steps - 1, s.xsize, s.xsize), dtype=dtype),
                luu=jnp.zeros((s.n_steps - 1, 4, 4), dtype=dtype),
                lyy=jnp.zeros((s.n_steps - 1, 4, 4), dtype=dtype),
                phix=jnp.zeros(s.xsize, dtype=dtype),
                phixx=jnp.zeros((s.xsize, s.xsize), dtype=dtype),
            )
            for s in specs
        ]
        carry = SolverCarry(
            nominal=nominal0, ctg=ctg0, lin=lin0, alreb=alreb0,
            cost=zero, viol=zero, reg=zero, aborted=jnp.asarray(False),
        )

        def al_body(i, loop_carry):
            carry, al_done = loop_carry
            al_iter = i + 1
            new_carry = _al_iteration(x0, refs, carry, al_iter)
            carry = tree_where(al_done | carry.aborted, carry, new_carry)
            al_done = al_done | (carry.viol < opt.AL_thresh)
            return (carry, al_done)

        carry, _ = jax.lax.fori_loop(
            0, opt.max_AL_iter, al_body, (carry, jnp.asarray(False))
        )
        return carry

    def _al_iteration(x0, refs, carry: SolverCarry, al_iter):
        # ReB gating (MultiPhaseDDP.cpp:178-183); al_iter is traced
        reb_on = (
            jnp.asarray(bool(opt.ReB_active))
            & (al_iter > 1)
            & (carry.viol <= 0.05)
        )

        # full forward sweep, eps=0 (MultiPhaseDDP.cpp:187)
        trajs, V, viol = multi_rollout(
            x0, carry.nominal, carry.ctg, jnp.zeros((), x0.dtype),
            refs, carry.alreb, reb_on,
        )
        lins = multi_linearize(trajs, refs, carry.alreb, reb_on,
                               include_al_grad=jnp.asarray(True))
        st = carry._replace(nominal=trajs, lin=lins, cost=V, viol=viol,
                            reg=jnp.zeros((), x0.dtype))

        def ddp_body(_, loop_carry):
            st, ddp_done = loop_carry
            new_st, converged = _ddp_iteration(x0, refs, st, reb_on)
            active = (~ddp_done) & (~st.aborted)
            st = tree_where(active, new_st, st)
            ddp_done = ddp_done | (active & (converged | new_st.aborted))
            return (st, ddp_done)

        st, _ = jax.lax.fori_loop(
            0, opt.max_DDP_iter, ddp_body, (st, jnp.asarray(False))
        )
        # AL parameter update (MultiPhaseDDP.cpp:273-278); skipped if the
        # regularization retry aborted (the reference returns from solve()).
        alreb = tree_where(
            st.aborted, st.alreb,
            update_al_reb(st.alreb, st.nominal, st.viol, reb_on),
        )
        return st._replace(alreb=alreb)

    def _ddp_iteration(x0, refs, st: SolverCarry, reb_on):
        cost_prev = st.cost
        reg, aborted, ctgs, dVexp = backward_with_retry(
            st.lin, st.nominal, st.ctg, st.reg
        )
        # shrink after success (MultiPhaseDDP.cpp:237-241)
        reg = reg / 20.0
        reg = jnp.where(reg < 1e-6, 0.0, reg)
        trajs, V, viol = line_search(
            x0, st.nominal, ctgs, refs, st.alreb, reb_on, cost_prev, dVexp
        )
        lins = multi_linearize(trajs, refs, st.alreb, reb_on,
                               include_al_grad=jnp.asarray(False))
        out = st._replace(nominal=trajs, ctg=ctgs, lin=lins, cost=V,
                          viol=viol, reg=reg)
        converged = (cost_prev - V) < opt.DDP_thresh
        # on abort: keep the pre-iteration state (reference returns mid-solve)
        out = tree_where(aborted, st._replace(aborted=jnp.asarray(True)), out)
        return out, converged

    return solve, phases
