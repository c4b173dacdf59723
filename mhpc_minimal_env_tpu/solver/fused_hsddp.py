"""Multi-phase HSDDP solve on the fused single-scan engine.

Same control-flow mapping as hsddp.py (AL/DDP fori loops with done-masking,
while_loops for regularization retry and line search — see that module's
docstring and the reference citations there), but over the fused flat-array
state: three compiled subgraphs total regardless of phase count.
"""
from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from ..types import HSDDPOptions, PhaseSpec
from .fused import (
    FusedALReB, FusedCTG, FusedLin, FusedTraj, NC, XDIM,
    initial_fused_alreb, make_fused_engine,
)
from .hsddp import LS_EPS_MIN, REG_MAX, REG_MIN, tree_where


class FusedSolveResult(NamedTuple):
    nominal: FusedTraj
    ctg: FusedCTG
    lin: FusedLin
    alreb: FusedALReB
    cost: jnp.ndarray
    viol: jnp.ndarray
    reg: jnp.ndarray
    aborted: jnp.ndarray


def build_fused_solver(specs, opt: HSDDPOptions, vel_cmd, ground_height,
                       height_cmd=0.0, dtype=jnp.float64, lin_chunk=48,
                       scan_unroll=1, analytic_lin=True, dynamics="sym",
                       elide_last_lin=False):
    """Returns solve(x0) -> FusedSolveResult (jittable, vmappable).

    elide_last_lin: peel the final DDP iteration of each AL pass out of
    the fori_loop and skip its linearization — the output is dead for the
    SOLVE (the next AL pass re-linearizes; trajectories/cost/gains are
    bit-identical) but it is what populates result.lin, which the debug
    dump (runtime/logging.py gradient file, MHPCLocomotion.cpp:293-380)
    reads.  Default False for dump fidelity; the latency serving path
    (configs.run_latency) enables it for ~2 of 8 linearize calls saved."""
    eng = make_fused_engine(specs, opt, vel_cmd, ground_height,
                            height_cmd, dtype, lin_chunk=lin_chunk,
                            scan_unroll=scan_unroll,
                            analytic_lin=analytic_lin, dynamics=dynamics)
    plan = eng["plan"]
    rollout, linearize, backward = (
        eng["rollout"], eng["linearize"], eng["backward"]
    )
    P, T = eng["n_phases"], eng["T"]
    alreb0 = initial_fused_alreb(specs, dtype)

    f0 = lambda: jnp.zeros((), dtype)
    fF = lambda: jnp.asarray(False)

    def backward_with_retry(lin, ctg_prev, reg0):
        def cond(c):
            reg, success, aborted, _, _ = c
            return (~success) & (~aborted)

        def body(c):
            reg, success, aborted, ctgs, dVexp = c
            ok, dV, new_ctg = backward(lin, reg)
            new_reg = jnp.maximum(reg * opt.update_regularization, REG_MIN)
            aborted_new = (~ok) & (new_reg > REG_MAX)
            return (jnp.where(ok, reg, new_reg), ok, aborted_new,
                    tree_where(ok, new_ctg, ctgs), jnp.where(ok, dV, dVexp))

        init = (jnp.asarray(reg0, dtype), fF(), fF(), ctg_prev, f0())
        reg, success, aborted, ctg, dVexp = jax.lax.while_loop(cond, body, init)
        return reg, aborted, ctg, dVexp

    def line_search(x0, nominal, ctg, ref_x, alreb, reb_on, cost_prev, dVexp):
        def cond(c):
            eps, accepted, *_ = c
            return (~accepted) & (eps > LS_EPS_MIN)

        def body(c):
            eps, accepted, trajs = c
            tr = rollout(x0, nominal.x, nominal.u, ctg, eps, ref_x, alreb,
                         reb_on, f0())
            ok = tr.V <= cost_prev + opt.gamma * eps * (1.0 - eps / 2.0) * dVexp
            return (jnp.where(ok, eps, eps * opt.alpha), ok, tr)

        init = (jnp.ones((), dtype), fF(), nominal)
        _, _, tr = jax.lax.while_loop(cond, body, init)
        return tr

    def update_al_reb(alreb: FusedALReB, h, viol, reb_on):
        pen = jnp.where(viol < 0.03, 0.0, opt.update_penalty)
        lam = alreb.lam + alreb.sigma * h
        sigma = alreb.sigma * pen
        delta = jnp.where(reb_on,
                          jnp.maximum(alreb.delta * opt.update_relax,
                                      alreb.delta_min),
                          alreb.delta)
        eps_reb = jnp.where(reb_on, alreb.eps_reb * opt.update_ReB,
                            alreb.eps_reb)
        return FusedALReB(sigma=sigma, lam=lam, delta=delta,
                          delta_min=alreb.delta_min, eps_reb=eps_reb)

    def _ddp_iteration(x0, ref_x, st: FusedSolveResult, reb_on,
                       need_lin=True):
        cost_prev = st.cost
        reg, aborted, ctg, dVexp = backward_with_retry(st.lin, st.ctg, st.reg)
        reg = reg / 20.0
        reg = jnp.where(reg < 1e-6, 0.0, reg)
        tr = line_search(x0, st.nominal, ctg, ref_x, st.alreb, reb_on,
                         cost_prev, dVexp)
        # the reference re-linearizes after every line search
        # (MultiPhaseDDP.cpp:262) including the LAST DDP iteration of each
        # AL pass, whose output is dead (the next AL iteration re-rolls
        # and re-linearizes under updated AL/ReB weights).  The caller
        # peels that final iteration out of the fori_loop and passes
        # need_lin=False — 2 of 8 linearize calls elided per default
        # solve, bit-identical results (pure dead computation).
        lin = linearize(tr, ref_x, st.alreb, reb_on, f0()) if need_lin \
            else st.lin
        out = st._replace(nominal=tr, ctg=ctg, lin=lin, cost=tr.V,
                          viol=tr.viol, reg=reg)
        converged = (cost_prev - tr.V) < opt.DDP_thresh
        out = tree_where(aborted, st._replace(aborted=jnp.asarray(True)), out)
        return out, converged

    def _al_iteration(x0, ref_x, carry: FusedSolveResult, al_iter):
        reb_on = (jnp.asarray(bool(opt.ReB_active)) & (al_iter > 1)
                  & (carry.viol <= 0.05)).astype(dtype)
        tr = rollout(x0, carry.nominal.x, carry.nominal.u, carry.ctg, f0(),
                     ref_x, carry.alreb, reb_on, f0())
        lin = linearize(tr, ref_x, carry.alreb, reb_on, jnp.ones((), dtype))
        st = carry._replace(nominal=tr, lin=lin, cost=tr.V, viol=tr.viol,
                            reg=f0())

        def ddp_body_core(st, done, need_lin):
            new_st, conv = _ddp_iteration(x0, ref_x, st, reb_on, need_lin)
            active = (~done) & (~st.aborted)
            st = tree_where(active, new_st, st)
            done = done | (active & (conv | new_st.aborted))
            return st, done

        def ddp_body(_, lc):
            st, done = lc
            return ddp_body_core(st, done, True)

        if elide_last_lin:
            # peel the last DDP iteration so its dead linearize is elided
            st, done = jax.lax.fori_loop(0, opt.max_DDP_iter - 1, ddp_body,
                                         (st, fF()))
            st, _ = ddp_body_core(st, done, False)
        else:
            st, _ = jax.lax.fori_loop(0, opt.max_DDP_iter, ddp_body,
                                      (st, fF()))
        alreb = tree_where(
            st.aborted, st.alreb,
            update_al_reb(st.alreb, st.nominal.h, st.viol, reb_on),
        )
        return st._replace(alreb=alreb)

    def solve(x0, warm_x=None, warm_u=None):
        """Full solve.  With (warm_x, warm_u) given, they seed the nominal
        trajectory (receding-horizon reuse); otherwise the bounding-PD warm
        start runs through the same rollout scan."""
        x0 = x0.astype(dtype)
        ref_x = plan.ref_x.at[:, 0].add(x0[0])
        ctg0 = FusedCTG(
            du=jnp.zeros((T, 4), dtype), Kfb=jnp.zeros((T, 4, XDIM), dtype),
            G=jnp.zeros((T, XDIM), dtype),
        )
        if warm_x is None:
            # warm start: PD rollout through the same scan (use_pd=1)
            zero_traj_x = jnp.zeros((T, XDIM), dtype)
            zero_traj_u = jnp.zeros((T, 4), dtype)
            ws = rollout(x0, zero_traj_x, zero_traj_u, ctg0, f0(), ref_x,
                         alreb0, f0(), jnp.ones((), dtype))
        else:
            ws = FusedTraj(
                x=warm_x.astype(dtype), u=warm_u.astype(dtype),
                y=jnp.zeros((T, 4), dtype), V=f0(),
                h=jnp.zeros(P, dtype), viol=f0(),
            )
        lin0 = FusedLin(
            A=jnp.zeros((T, XDIM, XDIM), dtype),
            Bm=jnp.zeros((T, XDIM, 4), dtype),
            Cm=jnp.zeros((T, 4, XDIM), dtype),
            D=jnp.zeros((T, 4, 4), dtype),
            lx=jnp.zeros((T, XDIM), dtype), lu=jnp.zeros((T, 4), dtype),
            ly=jnp.zeros((T, 4), dtype),
            lxx=jnp.zeros((T, XDIM, XDIM), dtype),
            luu=jnp.zeros((T, 4, 4), dtype), lyy=jnp.zeros((T, 4, 4), dtype),
            phix=jnp.zeros((T, XDIM), dtype),
            phixx=jnp.zeros((T, XDIM, XDIM), dtype),
            Px=jnp.zeros((T, XDIM, XDIM), dtype),
        )
        carry = FusedSolveResult(
            nominal=ws, ctg=ctg0, lin=lin0, alreb=alreb0,
            cost=f0(), viol=f0(), reg=f0(), aborted=fF(),
        )

        def al_body(i, lc):
            carry, done = lc
            new_carry = _al_iteration(x0, ref_x, carry, i + 1)
            carry = tree_where(done | carry.aborted, carry, new_carry)
            done = done | (carry.viol < opt.AL_thresh)
            return (carry, done)

        carry, _ = jax.lax.fori_loop(0, opt.max_AL_iter, al_body,
                                     (carry, fF()))
        return carry

    return solve, eng
