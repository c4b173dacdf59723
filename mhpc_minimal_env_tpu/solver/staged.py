"""Staged (host-orchestrated) batched HSDDP solver.

`fused_hsddp_batched` compiles the ENTIRE solve — AL fori-loop x DDP
fori-loop x regularization/line-search while-loops x three 720-step scans —
into one XLA program.  On TPU that single program exceeded 9 minutes of
XLA compile time in round 1 (BENCH_r01.json rc=124), because every loop
body inlines the full rollout/linearize/backward graphs at multiple call
sites.

This module keeps the numerics and the batch-synchronous masking semantics
IDENTICAL to fused_hsddp_batched (same update equations, same thresholds,
same reference citations — MultiPhaseDDP.cpp:154-289) but restructures the
control flow so that compile time is the SUM of a handful of small
programs AND the steady-state path needs ZERO host round-trips inside a
solve (critical on a remote-tunneled TPU where each sync costs dispatch
latency):

  - rollout / linearize / backward are separate jitted programs;
  - the backtracking line search (MultiPhaseDDP.cpp:130-151) is evaluated
    BATCHED over all candidate step sizes eps in {1, alpha, alpha^2, ...}
    in one cost-only rollout (`rollout_V`, no trajectory outputs), then a
    single full rollout runs at each lane's first-accepted eps.  Sequential
    trial order is preserved exactly: acceptance of each eps depends only
    on (cost_prev, dVexp), so "first accepted in sequence" == "first
    accepted among all", and lanes with no accepted eps keep the nominal
    trajectory, exactly like the while_loop version;
  - the regularization retry loop (MultiPhaseDDP.cpp:209-227) is a
    lax.while_loop around ONLY the backward sweep (one small jit);
  - AL / DDP iterations run at their static trip counts (max_AL_iter /
    max_DDP_iter) with the same done/abort masking the fori_loop versions
    apply — every dispatch is async, nothing blocks until the caller reads
    results.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..types import HSDDPOptions
from .fused import (
    FusedALReB, FusedCTG, FusedLin, FusedTraj, XDIM,
    initial_fused_alreb, make_fused_engine,
)
from .fused_hsddp import FusedSolveResult, LS_EPS_MIN, REG_MAX, REG_MIN
from .fused_hsddp_batched import bwhere


def build_staged_solver(specs, opt: HSDDPOptions, vel_cmd, ground_height,
                        height_cmd=0.0, dtype=jnp.float64, lin_chunk=48,
                        backward: str = "xla", b_tile: int = 512,
                        interpret: bool = False):
    """Returns solve_batched(x0_b: (B,14)) -> FusedSolveResult, numerically
    identical to fused_hsddp_batched.build_fused_solver_batched."""
    eng = make_fused_engine(specs, opt, vel_cmd, ground_height,
                            height_cmd, dtype, lin_chunk=lin_chunk)
    plan = eng["plan"]
    P, T = eng["n_phases"], eng["T"]
    alreb0 = initial_fused_alreb(specs, dtype)

    # candidate step sizes tried by the reference's backtracking loop
    eps_list = []
    e = 1.0
    while e > LS_EPS_MIN:
        eps_list.append(e)
        e *= opt.alpha
    eps_all = jnp.asarray(np.asarray(eps_list), dtype)
    L = len(eps_list)

    # ------------------------------------------------------ jitted stages
    rollout_b = jax.jit(jax.vmap(
        eng["rollout"], in_axes=(0, 0, 0, 0, 0, 0, 0, 0, None)))
    # (B, L) cost-only rollouts: inner vmap over eps, outer over the batch
    rollout_V_be = jax.jit(jax.vmap(
        jax.vmap(eng["rollout_V"],
                 in_axes=(None, None, None, None, 0, None, None, None, None)),
        in_axes=(0, 0, 0, 0, None, 0, 0, 0, None)))
    linearize_b = jax.jit(jax.vmap(
        eng["linearize"], in_axes=(0, 0, 0, 0, None)))

    if backward == "pallas":
        from ..ops.riccati_pallas import backward_batched_pallas, segment_plan_of

        seg = segment_plan_of(plan)

        def backward_b(lin_b, reg_b):
            ok, dV, ctg = backward_batched_pallas(
                seg, lin_b, reg_b, b_tile=b_tile, interpret=interpret)
            return ok, dV.astype(dtype), jax.tree.map(
                lambda a: a.astype(dtype), ctg)
    else:
        backward_b = jax.vmap(eng["backward"], in_axes=(0, 0))

    @jax.jit
    def backward_retry_jit(lin_b, ctg_prev, reg0_b):
        """Regularization retry (MultiPhaseDDP.cpp:209-227) as ONE compiled
        while_loop around the backward sweep."""
        B = reg0_b.shape[0]

        def cond(c):
            reg, success, aborted, _, _ = c
            return jnp.any((~success) & (~aborted))

        def body(c):
            reg, success, aborted, ctgs, dVexp = c
            ok, dV, new_ctg = backward_b(lin_b, reg)
            active = (~success) & (~aborted)
            adopt = active & ok
            new_reg = jnp.maximum(reg * opt.update_regularization, REG_MIN)
            reg_out = jnp.where(active & (~ok), new_reg, reg)
            aborted_new = aborted | (active & (~ok) & (new_reg > REG_MAX))
            ctg_out = bwhere(adopt, new_ctg, ctgs)
            dV_out = jnp.where(adopt, dV, dVexp)
            return (reg_out, success | adopt, aborted_new, ctg_out, dV_out)

        init = (reg0_b, jnp.zeros((B,), bool), jnp.zeros((B,), bool),
                ctg_prev, jnp.zeros((B,), dtype))
        reg, success, aborted, ctg, dVexp = jax.lax.while_loop(
            cond, body, init)
        return reg, aborted, ctg, dVexp

    @jax.jit
    def ls_select(V_bl, cost_prev_b, dVexp_b):
        """First-accepted candidate index per lane + acceptance mask."""
        dec = (opt.gamma * eps_all * (1.0 - eps_all / 2.0))[None, :]
        ok = V_bl <= cost_prev_b[:, None] + dec * dVexp_b[:, None]
        accepted = jnp.any(ok, axis=1)
        first = jnp.argmax(ok, axis=1)
        return eps_all[first], accepted

    @jax.jit
    def update_al_reb_b(alreb: FusedALReB, h_b, viol_b, reb_on_b, aborted):
        pen = jnp.where(viol_b < 0.03, 0.0, opt.update_penalty)[:, None]
        lam = alreb.lam + alreb.sigma * h_b
        sigma = alreb.sigma * pen
        reb = reb_on_b[:, None, None] > 0
        delta = jnp.where(
            reb, jnp.maximum(alreb.delta * opt.update_relax, alreb.delta_min),
            alreb.delta)
        eps_reb = jnp.where(reb, alreb.eps_reb * opt.update_ReB,
                            alreb.eps_reb)
        new = FusedALReB(sigma=sigma, lam=lam, delta=delta,
                         delta_min=alreb.delta_min, eps_reb=eps_reb)
        return bwhere(aborted, alreb, new)

    def zeros_b(B, *shape):
        return jnp.zeros((B,) + shape, dtype)

    # --------------------------------------------------- solve orchestration
    def line_search(x0_b, nominal, ctg, ref_x, alreb_b, reb_on_b,
                    cost_prev_b, dVexp_b):
        zf = jnp.zeros((), dtype)
        V_bl, _, _ = rollout_V_be(x0_b, nominal.x, nominal.u, ctg, eps_all,
                                  ref_x, alreb_b, reb_on_b, zf)
        eps_sel, accepted = ls_select(V_bl, cost_prev_b, dVexp_b)
        tr = rollout_b(x0_b, nominal.x, nominal.u, ctg, eps_sel, ref_x,
                       alreb_b, reb_on_b, zf)
        return bwhere(accepted, tr, nominal)

    def _ddp_iteration(x0_b, ref_x, st: FusedSolveResult, reb_on_b):
        cost_prev = st.cost
        reg, aborted, ctg, dVexp = backward_retry_jit(st.lin, st.ctg, st.reg)
        reg = reg / 20.0
        reg = jnp.where(reg < 1e-6, 0.0, reg)
        tr = line_search(x0_b, st.nominal, ctg, ref_x, st.alreb, reb_on_b,
                         cost_prev, dVexp)
        lin = linearize_b(tr, ref_x, st.alreb, reb_on_b, jnp.zeros((), dtype))
        out = st._replace(nominal=tr, ctg=ctg, lin=lin, cost=tr.V,
                          viol=tr.viol, reg=reg)
        converged = (cost_prev - tr.V) < opt.DDP_thresh
        out = bwhere(aborted, st._replace(aborted=st.aborted | aborted), out)
        return out, converged

    def _al_iteration(x0_b, ref_x, carry: FusedSolveResult, al_iter):
        B = x0_b.shape[0]
        reb_on_b = (jnp.asarray(bool(opt.ReB_active))
                    & (al_iter > 1) & (carry.viol <= 0.05)).astype(dtype)
        zf = jnp.zeros((), dtype)
        tr = rollout_b(x0_b, carry.nominal.x, carry.nominal.u, carry.ctg,
                       jnp.zeros((B,), dtype), ref_x, carry.alreb, reb_on_b,
                       zf)
        lin = linearize_b(tr, ref_x, carry.alreb, reb_on_b,
                          jnp.ones((), dtype))
        st = carry._replace(nominal=tr, lin=lin, cost=tr.V, viol=tr.viol,
                            reg=jnp.zeros((B,), dtype))

        done = jnp.zeros((B,), bool)
        for _ in range(opt.max_DDP_iter):
            new_st, conv = _ddp_iteration(x0_b, ref_x, st, reb_on_b)
            active = (~done) & (~st.aborted)
            st = bwhere(active, new_st, st)
            done = done | (active & (conv | new_st.aborted))
        alreb = update_al_reb_b(st.alreb, st.nominal.h, st.viol, reb_on_b,
                                st.aborted)
        return st._replace(alreb=alreb)

    def solve_batched(x0_b):
        x0_b = jnp.asarray(x0_b, dtype)
        B = x0_b.shape[0]
        ref_x = jax.vmap(lambda x: plan.ref_x.at[:, 0].add(x[0]))(x0_b)
        ctg0 = FusedCTG(du=zeros_b(B, T, 4), Kfb=zeros_b(B, T, 4, XDIM),
                        G=zeros_b(B, T, XDIM))
        alreb_b = jax.tree.map(
            lambda a: jnp.broadcast_to(a, (B,) + a.shape), alreb0)
        zf = jnp.zeros((), dtype)
        ws = rollout_b(x0_b, zeros_b(B, T, XDIM), zeros_b(B, T, 4), ctg0,
                       jnp.zeros((B,), dtype), ref_x, alreb_b,
                       jnp.zeros((B,), dtype), jnp.ones((), dtype))
        lin0 = FusedLin(
            A=zeros_b(B, T, XDIM, XDIM), Bm=zeros_b(B, T, XDIM, 4),
            Cm=zeros_b(B, T, 4, XDIM), D=zeros_b(B, T, 4, 4),
            lx=zeros_b(B, T, XDIM), lu=zeros_b(B, T, 4),
            ly=zeros_b(B, T, 4), lxx=zeros_b(B, T, XDIM, XDIM),
            luu=zeros_b(B, T, 4, 4), lyy=zeros_b(B, T, 4, 4),
            phix=zeros_b(B, T, XDIM), phixx=zeros_b(B, T, XDIM, XDIM),
            Px=zeros_b(B, T, XDIM, XDIM),
        )
        carry = FusedSolveResult(
            nominal=ws, ctg=ctg0, lin=lin0, alreb=alreb_b,
            cost=zeros_b(B), viol=zeros_b(B), reg=zeros_b(B),
            aborted=jnp.zeros((B,), bool),
        )

        done = jnp.zeros((B,), bool)
        for i in range(opt.max_AL_iter):
            new_carry = _al_iteration(x0_b, ref_x, carry, i + 1)
            carry = bwhere(done | carry.aborted, carry, new_carry)
            done = done | (carry.viol < opt.AL_thresh)
        return carry

    return solve_batched, eng
