"""Staged (host-orchestrated) batched HSDDP solver.

`fused_hsddp_batched` compiles the ENTIRE solve — AL fori-loop x DDP
fori-loop x regularization/line-search while-loops x three 720-step scans —
into one XLA program.  On TPU that single program exceeded 9 minutes of
XLA compile time in round 1 (BENCH_r01.json rc=124), because every loop
body inlines the full rollout/linearize/backward graphs at multiple call
sites.

This module keeps the numerics and the batch-synchronous masking semantics
IDENTICAL to fused_hsddp_batched (same update equations, same thresholds,
same reference citations — MultiPhaseDDP.cpp:154-289) but moves the outer
control flow to the host:

  - exactly four jitted device programs, each compiled once:
      rollout_b     (one 720-step scan, vmapped over the batch)
      linearize_b   (chunked jacfwd, vmapped)
      backward_b    (one reverse scan, vmapped — or the Pallas kernel)
      ls_accept_b   (tiny line-search acceptance masking)
  - AL / DDP / regularization-retry / line-search loops are Python loops;
    each iteration reads ONE boolean (`any lane still active?`) from the
    device — identical trip counts to the lax.while_loop program, since
    that too runs every lane to the worst lane's iteration count.

Cost: ~30-60 device dispatches per solve-batch plus one host sync per loop
iteration — microseconds against multi-millisecond stage runtimes.  Gain:
compile time is the SUM of four small programs instead of one giant one.
"""
from __future__ import annotations

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
                        interpret: bool = False, donate: bool = True):
    """Returns solve_batched(x0_b: (B,14)) -> FusedSolveResult, numerically
    identical to fused_hsddp_batched.build_fused_solver_batched."""
    eng = make_fused_engine(specs, opt, vel_cmd, ground_height,
                            height_cmd, dtype, lin_chunk=lin_chunk)
    plan = eng["plan"]
    P, T = eng["n_phases"], eng["T"]
    alreb0 = initial_fused_alreb(specs, dtype)

    # ------------------------------------------------------ jitted stages
    rollout_b = jax.jit(jax.vmap(
        eng["rollout"], in_axes=(0, 0, 0, 0, 0, 0, 0, 0, None)))
    linearize_b = jax.jit(jax.vmap(
        eng["linearize"], in_axes=(0, 0, 0, 0, None)))

    if backward == "pallas":
        from ..ops.riccati_pallas import backward_batched_pallas, segment_plan_of

        seg = segment_plan_of(plan)

        @jax.jit
        def backward_b(lin_b, reg_b):
            ok, dV, ctg = backward_batched_pallas(
                seg, lin_b, reg_b, b_tile=b_tile, interpret=interpret)
            return ok, dV.astype(dtype), jax.tree.map(
                lambda a: a.astype(dtype), ctg)
    else:
        backward_b = jax.jit(jax.vmap(eng["backward"], in_axes=(0, 0)))

    @jax.jit
    def ls_accept_b(tr, trajs, eps, accepted, cost_prev_b, dVexp_b):
        ok = tr.V <= cost_prev_b + opt.gamma * eps * (1.0 - eps / 2.0) * dVexp_b
        adopt = (~accepted) & ok
        trajs = bwhere(adopt, tr, trajs)
        accepted = accepted | ok
        eps = jnp.where(accepted, eps, eps * opt.alpha)
        return trajs, eps, accepted

    @jax.jit
    def reg_adopt_b(ok, dV, new_ctg, reg, success, aborted, ctgs, dVexp):
        active = (~success) & (~aborted)
        adopt = active & ok
        new_reg = jnp.maximum(reg * opt.update_regularization, REG_MIN)
        reg_out = jnp.where(active & (~ok), new_reg, reg)
        aborted_new = aborted | (active & (~ok) & (new_reg > REG_MAX))
        ctg_out = bwhere(adopt, new_ctg, ctgs)
        dV_out = jnp.where(adopt, dV, dVexp)
        return reg_out, success | adopt, aborted_new, ctg_out, dV_out

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

    # --------------------------------------------------- host-driven loops
    def backward_with_retry(lin_b, ctg_prev, reg0_b):
        B = reg0_b.shape[0]
        reg, success, aborted = (reg0_b, jnp.zeros((B,), bool),
                                 jnp.zeros((B,), bool))
        ctg, dVexp = ctg_prev, zeros_b(B)
        while bool(jnp.any((~success) & (~aborted))):
            ok, dV, new_ctg = backward_b(lin_b, reg)
            reg, success, aborted, ctg, dVexp = reg_adopt_b(
                ok, dV, new_ctg, reg, success, aborted, ctg, dVexp)
        return reg, aborted, ctg, dVexp

    def line_search(x0_b, nominal, ctg, ref_x, alreb_b, reb_on_b,
                    cost_prev_b, dVexp_b):
        B = x0_b.shape[0]
        eps = jnp.ones((B,), dtype)
        accepted = jnp.zeros((B,), bool)
        trajs = nominal
        zf = jnp.zeros((), dtype)
        while bool(jnp.any((~accepted) & (eps > LS_EPS_MIN))):
            tr = rollout_b(x0_b, nominal.x, nominal.u, ctg, eps, ref_x,
                           alreb_b, reb_on_b, zf)
            trajs, eps, accepted = ls_accept_b(tr, trajs, eps, accepted,
                                               cost_prev_b, dVexp_b)
        return trajs

    def _ddp_iteration(x0_b, ref_x, st: FusedSolveResult, reb_on_b):
        cost_prev = st.cost
        reg, aborted, ctg, dVexp = backward_with_retry(st.lin, st.ctg, st.reg)
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
            if not bool(jnp.any((~done) & (~st.aborted))):
                break
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
            if not bool(jnp.any((~done) & (~carry.aborted))):
                break
            new_carry = _al_iteration(x0_b, ref_x, carry, i + 1)
            carry = bwhere(done | carry.aborted, carry, new_carry)
            done = done | (carry.viol < opt.AL_thresh)
        return carry

    return solve_batched, eng
