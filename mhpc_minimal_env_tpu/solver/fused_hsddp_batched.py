"""Batch-native multi-phase HSDDP solve (all-in-one-jit mirror).

`fused_hsddp.build_fused_solver` maps per-scenario control flow through
`vmap(solve)` — semantically a batch-synchronous masked program, which is
exactly what JAX's while/fori batching rules produce.  This module writes
that batched program EXPLICITLY, with the batch axis as a real axis of the
solver state: per-lane scalars (regularization, line-search step, done
flags) become (B,) arrays with explicit `where` masking — the "solve all
lanes to the worst lane's iteration count" cost model of SURVEY.md §7 made
visible.  It serves as the cross-validation mirror for the production
staged engine (solver/staged.py): identical update equations and
control-flow thresholds as fused_hsddp.py / the reference
(MultiPhaseDDP.cpp:154-289), batch-major layouts throughout.

(The round-1/2 Pallas backward option was deleted in round 3: the
channel-last XLA backward in the staged engine delivers the layout win the
kernel was designed for, and works in f64 — see PERF.md §7.)
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..types import HSDDPOptions
from .fused import (
    FusedALReB, FusedCTG, FusedLin, XDIM,
    initial_fused_alreb, make_fused_engine,
)
from .fused_hsddp import FusedSolveResult, LS_EPS_MIN, REG_MAX, REG_MIN


def bwhere(mask_b, a, b):
    """tree_where with a (B,) mask broadcast against (B, ...) leaves."""
    def sel(x, y):
        m = mask_b.reshape((mask_b.shape[0],) + (1,) * (x.ndim - 1))
        return jnp.where(m, x, y)

    return jax.tree.map(sel, a, b)


def build_fused_solver_batched(specs, opt: HSDDPOptions, vel_cmd,
                               ground_height, height_cmd=0.0,
                               dtype=jnp.float64, lin_chunk: int = 48):
    """Returns solve_batched(x0_b: (B,14)) -> FusedSolveResult with (B, ...)
    leaves.  Computes exactly what vmap(fused_hsddp.solve) computes."""
    eng = make_fused_engine(specs, opt, vel_cmd, ground_height,
                            height_cmd, dtype, lin_chunk=lin_chunk)
    plan = eng["plan"]
    P, T = eng["n_phases"], eng["T"]
    alreb0 = initial_fused_alreb(specs, dtype)

    backward_b = jax.vmap(eng["backward"], in_axes=(0, 0))

    def zeros_b(B, *shape):
        return jnp.zeros((B,) + shape, dtype)

    def backward_with_retry(lin_b, ctg_prev, reg0_b):
        B = reg0_b.shape[0]

        def cond(c):
            reg, success, aborted, _, _ = c
            return jnp.any((~success) & (~aborted))

        def body(c):
            reg, success, aborted, ctgs, dVexp = c
            ok, dV, new_ctg = backward_b(lin_b, reg)
            # only lanes still active (not successful, not aborted) update —
            # the masking vmap(while_loop) would apply
            active = (~success) & (~aborted)
            adopt = active & ok
            new_reg = jnp.maximum(reg * opt.update_regularization, REG_MIN)
            reg_out = jnp.where(active & (~ok), new_reg, reg)
            aborted_new = aborted | (active & (~ok) & (new_reg > REG_MAX))
            ctg_out = bwhere(adopt, new_ctg, ctgs)
            dV_out = jnp.where(adopt, dV, dVexp)
            return (reg_out, success | adopt, aborted_new, ctg_out, dV_out)

        init = (reg0_b, jnp.zeros_like(reg0_b, bool),
                jnp.zeros_like(reg0_b, bool), ctg_prev, zeros_b(B))
        reg, success, aborted, ctg, dVexp = jax.lax.while_loop(
            cond, body, init)
        return reg, aborted, ctg, dVexp

    def update_al_reb(alreb: FusedALReB, h_b, viol_b, reb_on_b):
        # alreb leaves are per-lane here: (B, P) / (B, P, NC)
        pen = jnp.where(viol_b < 0.03, 0.0, opt.update_penalty)[:, None]
        lam = alreb.lam + alreb.sigma * h_b
        sigma = alreb.sigma * pen
        reb = reb_on_b[:, None, None] > 0
        delta = jnp.where(
            reb, jnp.maximum(alreb.delta * opt.update_relax, alreb.delta_min),
            alreb.delta)
        eps_reb = jnp.where(reb, alreb.eps_reb * opt.update_ReB,
                            alreb.eps_reb)
        return FusedALReB(sigma=sigma, lam=lam, delta=delta,
                          delta_min=alreb.delta_min, eps_reb=eps_reb)

    # per-lane alreb: vmap rollout/linearize over it too
    rollout_ba = jax.vmap(eng["rollout"],
                          in_axes=(0, 0, 0, 0, 0, 0, 0, 0, None))
    linearize_ba = jax.vmap(eng["linearize"], in_axes=(0, 0, 0, 0, None))

    def _ddp_iteration(x0_b, ref_x, st: FusedSolveResult, reb_on_b):
        cost_prev = st.cost
        reg, aborted, ctg, dVexp = backward_with_retry(st.lin, st.ctg, st.reg)
        reg = reg / 20.0
        reg = jnp.where(reg < 1e-6, 0.0, reg)
        tr = line_search_a(x0_b, st.nominal, ctg, ref_x, st.alreb, reb_on_b,
                           cost_prev, dVexp)
        lin = linearize_ba(tr, ref_x, st.alreb, reb_on_b,
                           jnp.zeros((), dtype))
        out = st._replace(nominal=tr, ctg=ctg, lin=lin, cost=tr.V,
                          viol=tr.viol, reg=reg)
        converged = (cost_prev - tr.V) < opt.DDP_thresh
        out = bwhere(aborted, st._replace(aborted=st.aborted | aborted), out)
        return out, converged

    def line_search_a(x0_b, nominal, ctg, ref_x, alreb_b, reb_on_b,
                      cost_prev_b, dVexp_b):
        B = x0_b.shape[0]
        zf = jnp.zeros((), dtype)

        def cond(c):
            eps, accepted, _ = c
            return jnp.any((~accepted) & (eps > LS_EPS_MIN))

        def body(c):
            eps, accepted, trajs = c
            tr = rollout_ba_eps(x0_b, nominal, ctg, eps, ref_x, alreb_b,
                                reb_on_b)
            ok = tr.V <= cost_prev_b + opt.gamma * eps * (1.0 - eps / 2.0) * dVexp_b
            adopt = (~accepted) & ok
            trajs = bwhere(adopt, tr, trajs)
            eps = jnp.where(accepted | ok, eps, eps * opt.alpha)
            return (eps, accepted | ok, trajs)

        def rollout_ba_eps(x0_b, nominal, ctg, eps_b, ref_x, alreb_b,
                           reb_on_b):
            return jax.vmap(
                eng["rollout"], in_axes=(0, 0, 0, 0, 0, 0, 0, 0, None)
            )(x0_b, nominal.x, nominal.u, ctg, eps_b, ref_x, alreb_b,
              reb_on_b, zf)

        init = (jnp.ones((B,), dtype), jnp.zeros((B,), bool), nominal)
        _, _, tr = jax.lax.while_loop(cond, body, init)
        return tr

    def _al_iteration(x0_b, ref_x, carry: FusedSolveResult, al_iter):
        B = x0_b.shape[0]
        reb_on_b = (jnp.asarray(bool(opt.ReB_active))
                    & (al_iter > 1) & (carry.viol <= 0.05)).astype(dtype)
        zf = jnp.zeros((), dtype)
        tr = rollout_ba(x0_b, carry.nominal.x, carry.nominal.u, carry.ctg,
                        jnp.zeros((B,), dtype), ref_x, carry.alreb, reb_on_b,
                        zf)
        lin = linearize_ba(tr, ref_x, carry.alreb, reb_on_b,
                           jnp.ones((), dtype))
        st = carry._replace(nominal=tr, lin=lin, cost=tr.V, viol=tr.viol,
                            reg=jnp.zeros((B,), dtype))

        def ddp_body(_, lc):
            st, done = lc
            new_st, conv = _ddp_iteration(x0_b, ref_x, st, reb_on_b)
            active = (~done) & (~st.aborted)
            st = bwhere(active, new_st, st)
            done = done | (active & (conv | new_st.aborted))
            return (st, done)

        st, _ = jax.lax.fori_loop(
            0, opt.max_DDP_iter, ddp_body, (st, jnp.zeros((B,), bool)))
        alreb = bwhere(
            st.aborted, st.alreb,
            update_al_reb(st.alreb, st.nominal.h, st.viol, reb_on_b))
        return st._replace(alreb=alreb)

    def solve_batched(x0_b):
        x0_b = x0_b.astype(dtype)
        B = x0_b.shape[0]
        ref_x = jax.vmap(lambda x: plan.ref_x.at[:, 0].add(x[0]))(x0_b)
        ctg0 = FusedCTG(du=zeros_b(B, T, 4), Kfb=zeros_b(B, T, 4, XDIM),
                        G=zeros_b(B, T, XDIM))
        alreb_b = jax.tree.map(
            lambda a: jnp.broadcast_to(a, (B,) + a.shape), alreb0)
        zf = jnp.zeros((), dtype)
        ws = rollout_ba(x0_b, zeros_b(B, T, XDIM), zeros_b(B, T, 4), ctg0,
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

        def al_body(i, lc):
            carry, done = lc
            new_carry = _al_iteration(x0_b, ref_x, carry, i + 1)
            carry = bwhere(done | carry.aborted, carry, new_carry)
            done = done | (carry.viol < opt.AL_thresh)
            return (carry, done)

        carry, _ = jax.lax.fori_loop(0, opt.max_AL_iter, al_body,
                                     (carry, jnp.zeros((B,), bool)))
        return carry

    return solve_batched, eng
