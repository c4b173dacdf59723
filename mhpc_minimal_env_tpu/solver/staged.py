"""Staged (host-orchestrated) batched HSDDP solver.

Compiling the ENTIRE solve — AL fori-loop x DDP fori-loop x
regularization/line-search while-loops x three 720-step scans — into one
XLA program exceeded 9 minutes of XLA compile time on TPU in round 1
(BENCH_r01.json rc=124), because every loop body inlines the full
rollout/linearize/backward graphs at multiple call sites.  (A batch-native
single-program mirror, `fused_hsddp_batched`, existed through round 4 as a
cross-check oracle; it was retired once this engine was pinned directly to
jit(vmap(fused_hsddp.solve)) — see tests/test_staged.py.)

This module keeps the numerics and the batch-synchronous masking semantics
IDENTICAL to vmap of the per-scenario solver (same update equations, same
thresholds, same reference citations — MultiPhaseDDP.cpp:154-289) but
restructures the
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


def bwhere(mask_b, a, b):
    """tree_where with a (B,) mask broadcast against (B, ...) leaves."""
    def sel(x, y):
        m = mask_b.reshape((mask_b.shape[0],) + (1,) * (x.ndim - 1))
        return jnp.where(m, x, y)

    return jax.tree.map(sel, a, b)


def _where_first(mask, x, y):
    m = mask.reshape((mask.shape[0],) + (1,) * (x.ndim - 1))
    return jnp.where(m, x, y)


def _where_last(mask, x, y):
    m = mask.reshape((1,) * (x.ndim - 1) + (mask.shape[0],))
    return jnp.where(m, x, y)


def build_staged_solver(specs, opt: HSDDPOptions, vel_cmd, ground_height,
                        height_cmd=0.0, dtype=jnp.float64, lin_chunk=48,
                        backward: str = "cl", acc_dtype=None,
                        monitor=None, ls_fastpath: int = 4,
                        scan_unroll: int = 1, analytic_lin: bool = True,
                        dynamics: str = "sym",
                        structured_constraints: bool = True):
    """Returns solve_batched(x0_b: (B,14)) -> FusedSolveResult, numerically
    identical to jit(vmap(fused_hsddp.solve)) modulo channel-last layout.

    acc_dtype: accumulator dtype for cost/violation scalars (see
    make_fused_engine) — the solver's discrete decisions (line-search
    acceptance, DDP convergence, AL thresholds) are evaluated in this
    dtype.  Pass jnp.float64 with dtype=float32 for the mixed-precision
    production path: f32 trajectories/linearization, f64 decisions.

    monitor: optional callback(kind: str, data: dict) invoked from the
    host-side orchestration with concrete arrays after each line search
    ('ls') and backward retry ('bwd') — used by tools/decision_slack.py to
    measure how close each accept decision sits to its threshold.

    ls_fastpath: K >= 1 probes only the first K line-search step sizes
    (cost-only rollouts), falling back to the complete candidate sweep
    when some live lane rejects all K (one scalar host sync per DDP
    iteration decides).  Semantics are EXACTLY the reference's sequential
    backtracking (MultiPhaseDDP.cpp:130-151): first-accepted-in-sequence
    is selected either way, the fallback recomputes every candidate, and
    measured decision slacks are ~1e4x the accept threshold noise
    (tools/decision_slack.py).  0 disables (always the full sweep)."""
    eng = make_fused_engine(specs, opt, vel_cmd, ground_height,
                            height_cmd, dtype, lin_chunk=lin_chunk,
                            acc_dtype=acc_dtype, scan_unroll=scan_unroll,
                            analytic_lin=analytic_lin, dynamics=dynamics,
                            structured_constraints=structured_constraints)
    adt = acc_dtype if acc_dtype is not None else dtype
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

    # channel-last mode (default): every (T, ...)-shaped per-gridpoint
    # array — linearization, cost-to-go, trajectories, references — is
    # stored (T, rows[, cols], B) with batch on the TPU lane axis.  The
    # minor two dims tile to (8 x 128) vregs, so batch-major (B, T, r, c)
    # small matrices pad 10-32x (measured: 32.7 GB for 2.8 GB of lin data,
    # OOM at B=1024; 360 MB for 40 MB of trajectory); channel-last pads
    # ~1.1x (see ops/linalg.py channel-last section / fused.backward_cl).
    # Per-lane scalars (V, viol, h, cost, reg, flags) stay (B,)-major.
    cl = backward == "cl"
    ctg_ax = -1 if cl else 0
    traj_ax = FusedTraj(x=ctg_ax, u=ctg_ax, y=ctg_ax, V=0, h=0, viol=0)

    # ------------------------------------------------------ jitted stages
    # `plan` rides through every stage as a (vmap-broadcast) argument so one
    # compiled graph serves all same-shaped plans — see make_fused_engine.
    if cl:
        # natively channel-last rollouts (vmap-inside-scan): stacked
        # trajectory outputs are (T, ., B) compact with no batch-major
        # transient — see fused._rollout_impl_cl
        rollout_b = jax.jit(eng["rollout_cl_p"])
        _rollout_V_eps = jax.vmap(
            eng["rollout_V_cl_p"],
            in_axes=(None, None, None, None, None, 0, None, None, None,
                     None))

        @jax.jit
        def rollout_V_be(plan_, x0_b, nom_x, nom_u, ctg_, eps_cand, ref_x,
                         alreb_b, reb_on_b, use_pd):
            Lc = eps_cand.shape[0]
            eps_lb = jnp.broadcast_to(
                eps_cand[:, None], (Lc, x0_b.shape[0])).astype(dtype)
            V_lb, h_lb, viol_lb = _rollout_V_eps(
                plan_, x0_b, nom_x, nom_u, ctg_, eps_lb, ref_x, alreb_b,
                reb_on_b, use_pd)
            return V_lb.T, h_lb, viol_lb.T  # (B, L) like the bm variant
    else:
        rollout_b = jax.jit(jax.vmap(
            eng["rollout_p"],
            in_axes=(None, 0, 0, 0, 0, 0, 0, 0, 0, None)))
        # (B, L) cost-only rollouts: inner vmap over eps, outer over batch
        rollout_V_be = jax.jit(jax.vmap(
            jax.vmap(eng["rollout_V_p"],
                     in_axes=(None, None, None, None, None, 0, None, None,
                              None, None)),
            in_axes=(None, 0, 0, 0, 0, None, 0, 0, 0, None)))
    if cl:
        # natively channel-last: vmap(out_axes=-1) would materialize the
        # padded batch-major intermediate before transposing (OOM at
        # B=1024) — see fused.make_linearize_cl
        _lin_fn = eng["linearize_cl_p"]
    else:
        _lin_fn = jax.vmap(
            eng["linearize_p"], in_axes=(None, traj_ax, ctg_ax, 0, 0, None))
    linearize_b = jax.jit(_lin_fn)

    def _lin_dead(plan_, tr, ref_x, alreb_b, reb_on_b, flag, dead_lin):
        del dead_lin  # donated: its buffers are reused for the output tree
        return _lin_fn(plan_, tr, ref_x, alreb_b, reb_on_b, flag)

    # DDP-iteration re-linearization DONATES the previous iteration's lin
    # tree (identical shapes/dtypes -> XLA aliases input to output): the
    # two ~5.7 GB f64 trees that coexisted at B=512 (round-3 OOM,
    # PERF.md §9.3) collapse to one + workspace.  In-order single-stream
    # TPU execution makes the aliasing safe even with the backward/LS
    # consumers of the old tree still pending at dispatch time.
    # keep_unused=True: without it jit prunes the (computationally unused)
    # dead_lin parameter and the aliasing never reaches XLA — verified via
    # the `tf.aliasing_output` attributes in the lowered HLO.
    # The aliasing is safe ONLY under in-order single-stream execution
    # (TPU, XLA:CPU): pending consumers of the old tree (backward retry,
    # line-search rollouts) must have drained before the aliased write.  An
    # out-of-order / multi-stream backend (GPU) would race, so fall back to
    # the non-donating program there (ADVICE r4).
    if jax.default_backend() in ("tpu", "cpu", "axon"):
        linearize_donate = jax.jit(_lin_dead, donate_argnums=(6,),
                                   keep_unused=True)
    else:
        linearize_donate = jax.jit(lambda plan_, tr, ref_x, alreb_b,
                                   reb_on_b, flag, dead_lin:
                                   _lin_fn(plan_, tr, ref_x, alreb_b,
                                           reb_on_b, flag))

    if cl:
        backward_b = eng["backward_cl_p"]
    else:
        backward_b = jax.vmap(eng["backward_p"], in_axes=(None, 0, 0))

    def ctg_where(mask_b, a, b):
        sel = _where_last if cl else _where_first
        return jax.tree.map(lambda x, y: sel(mask_b, x, y), a, b)

    def traj_where(mask_b, a: FusedTraj, b: FusedTraj):
        sel = _where_last if cl else _where_first
        return FusedTraj(
            x=sel(mask_b, a.x, b.x), u=sel(mask_b, a.u, b.u),
            y=sel(mask_b, a.y, b.y),
            V=jnp.where(mask_b, a.V, b.V),
            h=_where_first(mask_b, a.h, b.h),
            viol=jnp.where(mask_b, a.viol, b.viol),
        )

    _rw_stub = jnp.zeros((), dtype)

    @jax.jit
    def _result_where_core(mask_b, a: FusedSolveResult,
                           b: FusedSolveResult):
        """Jitted per-lane select (lin replaced by a scalar stub by the
        caller): ONE dispatched program instead of ~100 eager op
        dispatches per call — on the tunnel-attached TPU every eager op
        pays launch latency, and this select runs ~11x per solve."""
        wf = lambda ta, tb: jax.tree.map(
            lambda x, y: _where_first(mask_b, x, y), ta, tb)
        return FusedSolveResult(
            nominal=traj_where(mask_b, a.nominal, b.nominal),
            ctg=ctg_where(mask_b, a.ctg, b.ctg),
            lin=a.lin,
            alreb=wf(a.alreb, b.alreb),
            cost=jnp.where(mask_b, a.cost, b.cost),
            viol=jnp.where(mask_b, a.viol, b.viol),
            reg=jnp.where(mask_b, a.reg, b.reg),
            aborted=jnp.where(mask_b, a.aborted, b.aborted),
        )

    def result_where(mask_b, a: FusedSolveResult, b: FusedSolveResult,
                     lin_out=None):
        """Per-lane select over a FusedSolveResult whose nominal/alreb are
        batch-major while ctg/lin follow the backward layout.

        lin_out: the linearization to carry forward WITHOUT per-lane
        selection.  A masked-out lane's lin is never consumed (its
        subsequent backward results are discarded by the same masks), and
        the lin tree is by far the largest state (~2.8 GB at B=1024), so
        selecting it per lane would triple transient memory for nothing.
        Defaults to b.lin."""
        out = _result_where_core(mask_b, a._replace(lin=_rw_stub),
                                 b._replace(lin=_rw_stub))
        return out._replace(lin=b.lin if lin_out is None else lin_out)

    @jax.jit
    def backward_retry_jit(plan, lin_b, ctg_prev, reg0_b):
        """Regularization retry (MultiPhaseDDP.cpp:209-227) as ONE compiled
        while_loop around the backward sweep."""
        B = reg0_b.shape[0]

        def cond(c):
            reg, success, aborted, _, _ = c
            return jnp.any((~success) & (~aborted))

        def body(c):
            reg, success, aborted, ctgs, dVexp = c
            ok, dV, new_ctg = backward_b(plan, lin_b, reg)
            active = (~success) & (~aborted)
            adopt = active & ok
            new_reg = jnp.maximum(reg * opt.update_regularization, REG_MIN)
            reg_out = jnp.where(active & (~ok), new_reg, reg)
            aborted_new = aborted | (active & (~ok) & (new_reg > REG_MAX))
            ctg_out = ctg_where(adopt, new_ctg, ctgs)
            dV_out = jnp.where(adopt, dV, dVexp)
            return (reg_out, success | adopt, aborted_new, ctg_out, dV_out)

        init = (reg0_b, jnp.zeros((B,), bool), jnp.zeros((B,), bool),
                ctg_prev, jnp.zeros((B,), dtype))
        reg, success, aborted, ctg, dVexp = jax.lax.while_loop(
            cond, body, init)
        return reg, aborted, ctg, dVexp

    # decision arithmetic in the accumulator dtype (MultiPhaseDDP.cpp:146)
    eps_acc = eps_all.astype(adt)

    @jax.jit
    def ls_select(V_bl, cost_prev_b, dVexp_b):
        """First-accepted candidate index per lane + acceptance mask.

        Works for any candidate-prefix width: V_bl is (B, L') with L' <= L
        matching eps_all[:L'] (the sequential trial order of
        MultiPhaseDDP.cpp:130-151, so first-accepted == reference's)."""
        Lp = V_bl.shape[1]
        dec = (opt.gamma * eps_acc[:Lp] * (1.0 - eps_acc[:Lp] / 2.0))[None, :]
        ok = (V_bl.astype(adt)
              <= cost_prev_b.astype(adt)[:, None]
              + dec * dVexp_b.astype(adt)[:, None])
        accepted = jnp.any(ok, axis=1)
        first = jnp.argmax(ok, axis=1)
        return eps_all[first], accepted, first

    @jax.jit
    def update_al_reb_b(alreb: FusedALReB, h_b, viol_b, reb_on_b, aborted):
        sdt = alreb.sigma.dtype  # keep AL/ReB state in the engine dtype
        pen = jnp.where(viol_b < 0.03, 0.0, opt.update_penalty
                        ).astype(sdt)[:, None]
        lam = alreb.lam + alreb.sigma * h_b.astype(sdt)
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

    # structural placeholder for FusedSolveResult.lin where no real
    # linearization is live (initial carry; AL-iteration boundaries)
    _z1 = jnp.zeros((1,), dtype)
    _lin_stub = FusedLin(A=_z1, Bm=_z1, Cm=_z1, D=_z1, lx=_z1, lu=_z1,
                         ly=_z1, lxx=_z1, luu=_z1, lyy=_z1, phix=_z1,
                         phixx=_z1, Px=_z1)

    # --------------------------------------------------- solve orchestration
    def _ls_probe(plan, x0_b, nominal, ctg, ref_x, alreb_b, reb_on_b,
                  cost_prev_b, dVexp_b, eps_cand):
        """Cost-only rollouts at a candidate prefix + first-accepted select
        + ONE full rollout at each lane's selected step size."""
        zf = jnp.zeros((), dtype)
        V_bl, _, _ = rollout_V_be(plan, x0_b, nominal.x, nominal.u, ctg,
                                  eps_cand, ref_x, alreb_b, reb_on_b, zf)
        eps_sel, accepted, _ = ls_select(V_bl, cost_prev_b, dVexp_b)
        return V_bl, eps_sel, accepted

    # fused line search (channel-last production path): the K-candidate
    # probe rolls out WITH trajectories, the first-accepted trajectory is
    # gathered per lane, and the full-candidate fallback runs as the other
    # branch of a device-side lax.cond — so the steady state is ONE
    # dispatch with ZERO host syncs, vs probe + blocking-sync + rollout
    # (the round-3 path; VERDICT r3 items 3 and 7).  Semantics are exactly
    # MultiPhaseDDP.cpp:130-151 either way: first-accepted-in-sequence,
    # non-accepting lanes keep the nominal trajectory.
    if cl and 0 < int(ls_fastpath or 0) < L:
        K = int(ls_fastpath)
        _rollout_traj_eps = jax.vmap(
            eng["rollout_cl_p"],
            in_axes=(None, None, None, None, None, 0, None, None, None,
                     None))

        def _ls_fused_fn(plan_, x0_b, nominal, ctg_, ref_x, alreb_b,
                         reb_on_b, cost_prev_b, dVexp_b, aborted_b):
            B = x0_b.shape[0]
            zf = jnp.zeros((), dtype)
            eps_kb = jnp.broadcast_to(eps_all[:K, None], (K, B)).astype(dtype)
            trK = _rollout_traj_eps(plan_, x0_b, nominal.x, nominal.u, ctg_,
                                    eps_kb, ref_x, alreb_b, reb_on_b, zf)
            _, acc_k, first_k = ls_select(trK.V.T, cost_prev_b, dVexp_b)

            def fast(_):
                g4 = lambda a: jnp.take_along_axis(
                    a, first_k[None, None, None, :], axis=0)[0]
                g2 = lambda a: jnp.take_along_axis(
                    a, first_k[None, :], axis=0)[0]
                g3 = lambda a: jnp.take_along_axis(
                    a, first_k[None, :, None], axis=0)[0]
                tr = FusedTraj(x=g4(trK.x), u=g4(trK.u), y=g4(trK.y),
                               V=g2(trK.V), h=g3(trK.h), viol=g2(trK.viol))
                return tr, acc_k

            def full(_):
                # evaluate only the REMAINING candidates (the probe's K
                # trial costs are reused verbatim — the cost-only rollout
                # accumulates the identical V, so the stacked (B, L) table
                # equals the full sweep's bit for bit) then one rollout at
                # each lane's first-accepted eps.  Semantics stay exactly
                # MultiPhaseDDP.cpp:130-151 first-accepted-in-sequence.
                V_rest, _, _ = rollout_V_be(
                    plan_, x0_b, nominal.x, nominal.u, ctg_, eps_all[K:],
                    ref_x, alreb_b, reb_on_b, zf)
                V_bl = jnp.concatenate([trK.V.T, V_rest], axis=1)
                eps_s, acc, _ = ls_select(V_bl, cost_prev_b, dVexp_b)
                tr = eng["rollout_cl_p"](plan_, x0_b, nominal.x, nominal.u,
                                         ctg_, eps_s, ref_x, alreb_b,
                                         reb_on_b, zf)
                return tr, acc

            need_full = ~jnp.all(acc_k | aborted_b)
            tr, accepted = jax.lax.cond(need_full, full, fast, None)
            return traj_where(accepted, tr, nominal)

        ls_fused = jax.jit(_ls_fused_fn)
    else:
        ls_fused = None

    def line_search(plan, x0_b, nominal, ctg, ref_x, alreb_b, reb_on_b,
                    cost_prev_b, dVexp_b, aborted_b):
        K = int(ls_fastpath or 0)
        zf = jnp.zeros((), dtype)
        if ls_fused is not None and monitor is None:
            return ls_fused(plan, x0_b, nominal, ctg, ref_x, alreb_b,
                            reb_on_b, cost_prev_b, dVexp_b, aborted_b)
        if 0 < K < L:
            V_bl, eps_sel, accepted = _ls_probe(
                plan, x0_b, nominal, ctg, ref_x, alreb_b, reb_on_b,
                cost_prev_b, dVexp_b, eps_all[:K])
            # the one scalar host sync per DDP iteration: fall back to the
            # full candidate sweep only if some live lane rejected all K
            if not bool(jnp.all(accepted | aborted_b)):
                V_bl, eps_sel, accepted = _ls_probe(
                    plan, x0_b, nominal, ctg, ref_x, alreb_b, reb_on_b,
                    cost_prev_b, dVexp_b, eps_all)
        else:
            V_bl, eps_sel, accepted = _ls_probe(
                plan, x0_b, nominal, ctg, ref_x, alreb_b, reb_on_b,
                cost_prev_b, dVexp_b, eps_all)
        tr = rollout_b(plan, x0_b, nominal.x, nominal.u, ctg, eps_sel, ref_x,
                       alreb_b, reb_on_b, zf)
        if monitor is not None:
            monitor("ls", dict(V_bl=V_bl, cost_prev=cost_prev_b,
                               dVexp=dVexp_b, eps=eps_sel,
                               accepted=accepted))
        return traj_where(accepted, tr, nominal)

    def _ddp_iteration(plan, x0_b, ref_x, st: FusedSolveResult, reb_on_b,
                       need_lin=True):
        cost_prev = st.cost
        reg, aborted, ctg, dVexp = backward_retry_jit(
            plan, st.lin, st.ctg, st.reg)
        if monitor is not None:
            monitor("bwd", dict(reg=reg, aborted=aborted, dVexp=dVexp))
        reg = reg / 20.0
        reg = jnp.where(reg < 1e-6, 0.0, reg)
        tr = line_search(plan, x0_b, st.nominal, ctg, ref_x, st.alreb,
                         reb_on_b, cost_prev, dVexp, st.aborted | aborted)
        # the reference re-linearizes after every line search
        # (MultiPhaseDDP.cpp:262), including the last DDP iteration — whose
        # output is then dead: the next AL iteration re-rolls and
        # re-linearizes under the updated AL/ReB weights.  Skip the dead
        # call (pure elided computation, ~12% of solve time; bit-identical
        # results).  The old tree (st.lin) is donated into the new one.
        lin = (linearize_donate(plan, tr, ref_x, st.alreb, reb_on_b,
                                jnp.zeros((), dtype), st.lin)
               if need_lin else st.lin)
        out = st._replace(nominal=tr, ctg=ctg, lin=lin, cost=tr.V,
                          viol=tr.viol, reg=reg)
        converged = (cost_prev - tr.V) < opt.DDP_thresh
        out = result_where(
            aborted, st._replace(aborted=st.aborted | aborted), out)
        return out, converged

    def _al_iteration(plan, x0_b, ref_x, carry: FusedSolveResult, al_iter,
                      max_ddp=None):
        B = x0_b.shape[0]
        reb_on_b = (jnp.asarray(bool(opt.ReB_active))
                    & (al_iter > 1) & (carry.viol <= 0.05)).astype(dtype)
        zf = jnp.zeros((), dtype)
        tr = rollout_b(plan, x0_b, carry.nominal.x, carry.nominal.u,
                       carry.ctg, jnp.zeros((B,), dtype), ref_x, carry.alreb,
                       reb_on_b, zf)
        lin = linearize_b(plan, tr, ref_x, carry.alreb, reb_on_b,
                          jnp.ones((), dtype))
        st = carry._replace(nominal=tr, lin=lin, cost=tr.V, viol=tr.viol,
                            reg=jnp.zeros((B,), dtype))

        n_ddp = opt.max_DDP_iter if max_ddp is None else int(max_ddp)
        done = jnp.zeros((B,), bool)
        for it in range(n_ddp):
            new_st, conv = _ddp_iteration(
                plan, x0_b, ref_x, st, reb_on_b,
                need_lin=(it + 1 < n_ddp))
            active = (~done) & (~st.aborted)
            st = result_where(active, new_st, st, lin_out=new_st.lin)
            done = done | (active & (conv | new_st.aborted))
        alreb = update_al_reb_b(st.alreb, st.nominal.h, st.viol, reb_on_b,
                                st.aborted)
        # drop the linearization from the AL-iteration output: the next AL
        # iteration re-linearizes before any backward, so keeping it alive
        # pins ~2.8 GB (B=1024 f32) across the AL boundary for nothing
        return st._replace(alreb=alreb, lin=_lin_stub)

    def solve_batched(x0_b, warm_x_b=None, warm_u_b=None, plan_=None,
                      alreb0_=None, aborted0_b=None, al_iter0=0,
                      viol0_b=None, max_al=None, max_ddp=None):
        """Solve for a batch of initial states.

        warm_x_b/warm_u_b: optional nominal trajectories seeding the solve
        (receding-horizon reuse; MHPCLocomotion.cpp:200-215 runs the PD
        heuristic when absent) — channel-last (T, ., B) in the default cl
        mode, (B, T, .) otherwise.  plan_/alreb0_: alternate problem plan
        + AL/ReB init of IDENTICAL shapes (e.g. another gait rotation) —
        reuses every compiled stage graph.  aborted0_b: (B,) bool lanes to
        treat as already-aborted (MPC failure isolation: frozen lanes skip
        the line-search fastpath gate instead of forcing full sweeps).
        al_iter0: AL iteration numbering offset — a resumed solve (e.g.
        the f64 polish pass of the mixed-precision experiment) counts its
        iterations as al_iter0+1.., so the ReB activation gate
        (al_iter > 1) matches the reference's schedule for iteration 2+.
        viol0_b: (B,) terminal violation entering the resumed solve (the
        suspended solve's carry.viol) — the ReB gate also tests
        viol <= 0.05, so a resume without it replays a different
        algorithm.
        max_al/max_ddp: per-call iteration-budget overrides (default:
        opt.max_AL_iter / opt.max_DDP_iter).  The budget lives only in
        these host-side loops, so a deeper budget REUSES every compiled
        stage graph — this is what the two-tier fleet solve
        (configs.solve_two_tier) exploits: default budget for the fleet,
        the measured convergence budget (3 AL x 5 DDP, PERF.md §17) for
        the gathered tail lanes, zero extra compiles at equal batch shape.
        """
        plan = plan_ if plan_ is not None else eng["plan"]
        a0 = alreb0_ if alreb0_ is not None else alreb0
        x0_b = jnp.asarray(x0_b, dtype)
        B = x0_b.shape[0]
        ref_x = jax.vmap(lambda x: plan.ref_x.at[:, 0].add(x[0]),
                         out_axes=(-1 if cl else 0))(x0_b)
        if cl:
            zc = lambda *s: jnp.zeros((T,) + s + (B,), dtype)
            ctg0 = FusedCTG(du=zc(4), Kfb=zc(4, XDIM), G=zc(XDIM))
            z_nomx, z_nomu = zc(XDIM), zc(4)
        else:
            ctg0 = FusedCTG(du=zeros_b(B, T, 4), Kfb=zeros_b(B, T, 4, XDIM),
                            G=zeros_b(B, T, XDIM))
            z_nomx, z_nomu = zeros_b(B, T, XDIM), zeros_b(B, T, 4)
        alreb_b = jax.tree.map(
            lambda a: jnp.broadcast_to(a, (B,) + a.shape), a0)
        zf = jnp.zeros((), dtype)
        if warm_x_b is None:
            ws = rollout_b(plan, x0_b, z_nomx, z_nomu,
                           ctg0, jnp.zeros((B,), dtype), ref_x, alreb_b,
                           jnp.zeros((B,), dtype), jnp.ones((), dtype))
        else:
            # seed nominal directly (warm trajectories are re-rolled by the
            # first AL iteration's rollout, like the reference's
            # update_nominal_trajectory handoff)
            ws = FusedTraj(
                x=jnp.asarray(warm_x_b, dtype), u=jnp.asarray(warm_u_b, dtype),
                y=(zc(4) if cl else zeros_b(B, T, 4)),
                V=jnp.zeros((B,), adt),
                h=jnp.zeros((B, P), adt), viol=jnp.zeros((B,), adt),
            )
        # the carry's lin is NEVER read before each AL iteration's own
        # linearize replaces it (and result_where passes lin through
        # unselected), so a full-size zero tree here would only pin memory
        # — a stub keeps the pytree structure at zero cost
        carry = FusedSolveResult(
            nominal=ws, ctg=ctg0, lin=_lin_stub, alreb=alreb_b,
            cost=jnp.zeros((B,), adt),
            viol=(jnp.zeros((B,), adt) if viol0_b is None
                  else jnp.asarray(viol0_b, adt)),
            reg=zeros_b(B),
            aborted=(jnp.zeros((B,), bool) if aborted0_b is None
                     else jnp.asarray(aborted0_b, bool)),
        )

        done = jnp.zeros((B,), bool)
        for i in range(opt.max_AL_iter if max_al is None else int(max_al)):
            new_carry = _al_iteration(plan, x0_b, ref_x, carry,
                                      al_iter0 + i + 1, max_ddp=max_ddp)
            carry = result_where(done | carry.aborted, carry, new_carry)
            done = done | (carry.viol < opt.AL_thresh)
        return carry

    # the exact jitted stage programs the solve dispatches, for profiling
    # (tools/profile_staged_tpu.py) — timing THESE measures the production
    # path, not a re-jitted lookalike with different HLO
    eng["stages"] = dict(
        rollout_b=rollout_b, rollout_V_be=rollout_V_be,
        linearize_b=linearize_b, linearize_donate=linearize_donate,
        backward_retry=backward_retry_jit, ls_fused=ls_fused,
        eps_all=eps_all,
    )
    return solve_batched, eng
