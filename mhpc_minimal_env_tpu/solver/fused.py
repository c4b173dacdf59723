"""Fused single-scan HSDDP engine — the TPU-native solver architecture.

The per-phase engine (phase.py) maps each phase to its own scan, which
duplicates compiled graphs 8x and leaves the compiler nothing to fuse
across phases.  Here the WHOLE multi-phase problem is one gridpoint stream:

  - all P phases concatenated: T = sum_p N_p gridpoints (720 by default)
  - per-gridpoint static metadata (dynamics id, phase index, transition
    code, terminal/cost flags, weight tables, references) precomputed
    host-side into a `FusedPlan` of arrays
  - FB (6-state) phases embedded in the 14-wide WB container (zero
    padding; the padded coordinates stay exactly zero through dynamics,
    costs, and the Riccati recursion — regularization touches only the
    decoupled pad diagonal, which the WB->FB projection annihilates)
  - ONE rollout scan, ONE vmapped linearization, ONE backward scan ->
    3 compiled graphs total independent of phase count; the per-step
    dynamics switch via lax.switch over 4 branches
  - warm start runs through the same rollout scan (use_pd flag) so no
    extra graphs are compiled

Numerics match phase.py / the reference exactly (same update equations,
same calc-flag quirks); tests/test_golden_solve.py runs on this engine.
"""
from __future__ import annotations

from typing import List, NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from ..models import kinematics as K
from ..models import quadruped as Q
from ..models import floating_base as FB
from ..ops import linalg as LA
from ..types import HSDDPOptions, PhaseSpec
from . import constraints as CONSTR
from . import costs as C
from .reference_gen import reference_templates

XDIM, UDIM, YDIM, NC = 14, 4, 4, 19  # padded sizes

DYN_BS, DYN_FL, DYN_FS, DYN_FB = 0, 1, 2, 3
TR_NONE, TR_ID, TR_IMPF, TR_IMPB = 0, 1, 2, 3
TC_NONE, TC_FRONT, TC_HIND = 0, 1, 2


class FusedPlan(NamedTuple):
    is_dyn: jnp.ndarray        # (T,) dynamics step leaves this gridpoint
    is_term: jnp.ndarray       # (T,) phase-terminal gridpoint
    is_start: jnp.ndarray      # (T,) phase-start gridpoint (0 at t=0)
    dyn_id: jnp.ndarray
    trans_id: jnp.ndarray
    do_proj: jnp.ndarray
    tc_id: jnp.ndarray
    phase_idx: jnp.ndarray
    wb_mask: jnp.ndarray
    dt: jnp.ndarray
    contact: jnp.ndarray       # (T, 2)
    plan_fh: jnp.ndarray       # (T,)
    stance_time: jnp.ndarray   # (T,)
    pd_gain: jnp.ndarray       # (T,) bounding-PD stance gain (0 = flight/FB)
    qw: jnp.ndarray            # (T, 14)
    rw: jnp.ndarray            # (T, 4)
    sw: jnp.ndarray            # (T, 4)
    qfw: jnp.ndarray           # (T, 14)
    ref_x: jnp.ndarray         # (T, 14) template; add x0[0] to column 0
    ref_u: jnp.ndarray
    ref_y: jnp.ndarray
    Cx: jnp.ndarray            # (T, NC, 14)
    Cu: jnp.ndarray
    Cy: jnp.ndarray
    cb: jnp.ndarray            # (T, NC)
    c_valid: jnp.ndarray       # (T, NC)
    has_al: jnp.ndarray        # (P,)
    start_idx: jnp.ndarray     # (P,) gridpoint index of each phase start
    term_idx: jnp.ndarray      # (P,) gridpoint index of each phase terminal


class FusedALReB(NamedTuple):
    sigma: jnp.ndarray      # (P,)
    lam: jnp.ndarray        # (P,)
    delta: jnp.ndarray      # (P, NC)
    delta_min: jnp.ndarray  # (P, NC)
    eps_reb: jnp.ndarray    # (P, NC)


class FusedTraj(NamedTuple):
    x: jnp.ndarray   # (T, 14)
    u: jnp.ndarray   # (T, 4)
    y: jnp.ndarray   # (T, 4)
    V: jnp.ndarray
    h: jnp.ndarray   # (P,)
    viol: jnp.ndarray


class FusedLin(NamedTuple):
    A: jnp.ndarray
    Bm: jnp.ndarray
    Cm: jnp.ndarray
    D: jnp.ndarray
    lx: jnp.ndarray
    lu: jnp.ndarray
    ly: jnp.ndarray
    lxx: jnp.ndarray
    luu: jnp.ndarray
    lyy: jnp.ndarray
    phix: jnp.ndarray   # (T, 14), valid at terminal gridpoints
    phixx: jnp.ndarray  # (T, 14, 14)
    Px: jnp.ndarray     # (T, 14, 14), valid at phase-start gridpoints


class FusedCTG(NamedTuple):
    du: jnp.ndarray  # (T, 4)
    Kfb: jnp.ndarray # (T, 4, 14)
    G: jnp.ndarray   # (T, 14)


# --------------------------------------------------------------------------
# plan construction (host-side numpy)
# --------------------------------------------------------------------------

def build_plan(specs: List[PhaseSpec], vel_cmd, height_cmd, dtype=np.float64):
    P = len(specs)
    T = sum(s.n_steps for s in specs)
    f = dict(
        is_dyn=np.zeros(T), is_term=np.zeros(T), is_start=np.zeros(T),
        dyn_id=np.zeros(T, np.int32), trans_id=np.zeros(T, np.int32),
        do_proj=np.zeros(T), tc_id=np.zeros(T, np.int32),
        phase_idx=np.zeros(T, np.int32), wb_mask=np.zeros(T),
        dt=np.zeros(T), contact=np.zeros((T, 2)), plan_fh=np.zeros(T),
        stance_time=np.zeros(T), pd_gain=np.zeros(T),
        qw=np.zeros((T, XDIM)), rw=np.zeros((T, UDIM)), sw=np.zeros((T, YDIM)),
        qfw=np.zeros((T, XDIM)),
        ref_x=np.zeros((T, XDIM)), ref_u=np.zeros((T, UDIM)),
        ref_y=np.zeros((T, YDIM)),
        Cx=np.zeros((T, NC, XDIM)), Cu=np.zeros((T, NC, UDIM)),
        Cy=np.zeros((T, NC, YDIM)), cb=np.ones((T, NC)),
        c_valid=np.zeros((T, NC)),
    )
    has_al = np.zeros(P)
    refs = reference_templates(specs, vel_cmd, height_cmd)
    start_idx = np.zeros(P, np.int32)
    term_idx = np.zeros(P, np.int32)

    t0 = 0
    for p, s in enumerate(specs):
        n = s.n_steps
        sl = slice(t0, t0 + n)
        start_idx[p] = t0
        term_idx[p] = t0 + n - 1
        f["phase_idx"][sl] = p
        f["dt"][sl] = s.dt
        f["is_dyn"][t0 : t0 + n - 1] = 1
        f["is_term"][t0 + n - 1] = 1
        if p > 0:
            f["is_start"][t0] = 1
        f["stance_time"][sl] = s.dt * n
        if s.model == "wb":
            f["wb_mask"][sl] = 1
            f["dyn_id"][sl] = {1: DYN_BS, 2: DYN_FL, 3: DYN_FS, 4: DYN_FL}[s.mode]
            f["contact"][sl] = Q.WB_CONTACT[s.mode]
            f["pd_gain"][sl] = {1: 3.0, 3: 2.2}.get(s.mode, 0.0)
            if s.mode in (2, 4):
                f["tc_id"][t0 + n - 1] = TC_FRONT if s.mode == 2 else TC_HIND
                has_al[p] = 1
            lc = CONSTR.wb_path_constraints(s.mode)
            nc = lc.b.shape[0]
            f["Cx"][sl, :nc] = lc.Cx
            f["Cu"][sl, :nc] = lc.Cu
            f["Cy"][sl, :nc] = lc.Cy
            f["cb"][sl, :nc] = lc.b
            f["c_valid"][sl, :nc] = 1
        else:
            f["dyn_id"][sl] = DYN_FB
            f["contact"][sl] = np.asarray(FB.CONTACT_TABLE)[s.mode - 1]
            if s.mode in (1, 3):
                f["plan_fh"][t0] = 1
        if p > 0:
            prev = specs[p - 1]
            if prev.model == "wb":
                f["trans_id"][t0] = {1: TR_ID, 2: TR_IMPF, 3: TR_ID, 4: TR_IMPB}[prev.mode]
                f["do_proj"][t0] = 1.0 if s.model == "fb" else 0.0
            else:
                f["trans_id"][t0] = TR_ID
        qw, rw, sw, qfw = C.weights(s.model, s.mode)
        d = qw.shape[0]
        f["qw"][sl, :d] = qw
        f["rw"][sl] = rw
        f["sw"][sl] = sw
        f["qfw"][sl, :d] = qfw
        f["ref_x"][sl, : refs[p].x.shape[1]] = refs[p].x
        f["ref_u"][sl] = refs[p].u
        f["ref_y"][sl] = refs[p].y
        t0 += n

    out = {}
    for k, v in f.items():
        out[k] = v if v.dtype == np.int32 else np.asarray(v, dtype=dtype)
    plan = FusedPlan(
        has_al=np.asarray(has_al, dtype=dtype),
        start_idx=start_idx, term_idx=term_idx,
        **out,
    )
    # ONE batched host->device transfer: on a remote-tunneled TPU (axon)
    # per-array eager transfers cost ~0.5-4 s each, 30 leaves = minutes.
    return jax.device_put(plan)


def initial_fused_alreb(specs: List[PhaseSpec], dtype=jnp.float64) -> FusedALReB:
    P = len(specs)
    sigma = np.zeros(P)
    lam = np.zeros(P)
    delta = np.ones((P, NC))
    delta_min = np.full((P, NC), 0.01)
    eps = np.zeros((P, NC))
    for p, s in enumerate(specs):
        d = CONSTR.initial_al_reb(s.model, s.mode)
        sigma[p] = d["sigma"]
        n = d["delta"].shape[0]
        if n:
            delta[p, :n] = d["delta"]
            delta_min[p, :n] = d["delta_min"]
            eps[p, :n] = d["eps_reb"]
    np_dtype = np.float64 if dtype == jnp.float64 else np.float32
    return jax.device_put(FusedALReB(
        sigma=np.asarray(sigma, dtype=np_dtype),
        lam=np.asarray(lam, dtype=np_dtype),
        delta=np.asarray(delta, dtype=np_dtype),
        delta_min=np.asarray(delta_min, dtype=np_dtype),
        eps_reb=np.asarray(eps, dtype=np_dtype),
    ))


# --------------------------------------------------------------------------
# per-step primitives
# --------------------------------------------------------------------------

def _pad14(x6):
    return jnp.concatenate([x6, jnp.zeros(8, dtype=x6.dtype)])


def _step_dynamics(dyn_id, x, u, fh, ct, dt, wb_fn=Q.wb_xdot_masked):
    """One Euler step.  WB contact modes share ONE mode-unified masked-KKT
    graph (wb_fn — bit-identical to the per-mode dynamics); only the FB
    model needs a separate branch.  Halving the branch count halves the
    compile-dominating scan-body graph.  wb_fn selects the model-term
    evaluation: Q.wb_xdot_masked (AD over kinematics) or
    Q.wb_xdot_masked_sym (generated closed form, the default engine
    path)."""
    def wb(x, u, fh, ct):
        xdot, y = wb_fn(x, u, ct[0], ct[1])
        return x + xdot * dt, y

    def fb(x, u, fh, ct):
        x6 = x[:6]
        xdot = FB.fb_continuous_dynamics(x6, u, fh, ct)
        return _pad14(x6 + xdot * dt), jnp.zeros(4, dtype=x.dtype)

    return jax.lax.cond(dyn_id == DYN_FB, fb, wb, x, u, fh, ct)


def _transition(trans_id, x):
    """Reset map at a phase seam: foot-gated plastic impact.  Gates of
    (0, 0) are EXACTLY the identity (lam = 0), so no branch is needed for
    the identity/no-op codes — one graph serves all four codes."""
    cf = (trans_id == TR_IMPF).astype(x.dtype)
    ch = (trans_id == TR_IMPB).astype(x.dtype)
    return Q.impact_map_masked(x, cf, ch)[0]


def _proj_matrix(dtype):
    S = jnp.zeros((XDIM, XDIM), dtype)
    S = S.at[0:3, 0:3].set(jnp.eye(3, dtype=dtype))
    S = S.at[3:6, 7:10].set(jnp.eye(3, dtype=dtype))
    return S


def _project(x, do_proj):
    proj = jnp.concatenate([x[:3], x[7:10], jnp.zeros(8, dtype=x.dtype)])
    return jnp.where(do_proj > 0, proj, x)


def _plan_foothold_fused(x, stance_time, contact, vel_cmd, ground_height):
    """Raibert foothold from the FB phase-start state (FootholdPlan.h:27-50)."""
    q = jnp.concatenate([x[:3], jnp.zeros(4, dtype=x.dtype)])
    hip_h = K.hip_position(q, 1)
    hip_f = K.hip_position(q, 0)
    z = jnp.zeros((), x.dtype)
    gz = jnp.asarray(ground_height, dtype=x.dtype)
    fh_hind = jnp.stack([z, z, hip_h[0] + vel_cmd * stance_time / 2, gz])
    fh_front = jnp.stack([hip_f[0] + vel_cmd * stance_time / 2, gz, z, z])
    return jnp.where(contact[1] > 0, fh_hind, fh_front)


def _touchdown(tc_id, x, ground_height):
    q = x[:7]
    h_f = K.front_foot_position(q)[1] - ground_height
    h_h = K.hind_foot_position(q)[1] - ground_height
    return jnp.where(tc_id == TC_FRONT, h_f,
                     jnp.where(tc_id == TC_HIND, h_h, jnp.zeros((), x.dtype)))


def _pd_policy(x, ct, pd_gain, wb_mask):
    """Bounding PD warm-start law (boundingPDControl.cpp), mode-unified:
    contact gates select the leg-spring stance term, pd_gain carries the
    per-mode stance gain, wb_mask zeroes FB gridpoints (bit-identical to
    the old 4-branch switch)."""
    from .warmstart import pd_control_masked

    return pd_control_masked(x, ct[0], ct[1], pd_gain) * wb_mask


# --------------------------------------------------------------------------
# the engine
# --------------------------------------------------------------------------

def _chunk_size(T: int, target: int) -> int:
    """Largest divisor of T that is <= target (for time-chunked maps)."""
    for c in range(min(target, T), 0, -1):
        if T % c == 0:
            return c
    return 1


def _validate_constraint_structure(specs: List[PhaseSpec]) -> bool:
    """True iff every phase's constraint block has the layout the
    structured barrier path exploits (wb_path_constraints' invariant):

      rows 0:8   torque limits  — Cu = [-I; I], Cx = Cy = 0
      rows 8:16  joint limits   — eps_reb = 0 (weightless: they contribute
                                  EXACTLY zero to cost and derivatives)
      rows 16:   GRF rows       — Cy only, Cx = Cu = 0

    FB phases are constraint-free.  Verified host-side so the structured
    fast path (bit-identical elision of exact-zero terms) can never be
    silently applied to a constraint set with different structure."""
    eye4 = np.eye(4)
    for s in specs:
        if s.model != "wb":
            continue
        lc = CONSTR.wb_path_constraints(s.mode)
        al = CONSTR.initial_al_reb(s.model, s.mode)
        n = lc.b.shape[0]
        if n < 16:
            return False
        ok = (
            np.array_equal(lc.Cu[0:8], np.vstack([-eye4, eye4]))
            and not lc.Cx[0:8].any() and not lc.Cy[0:8].any()
            and not al["eps_reb"][8:16].any()
            and not lc.Cx[16:].any() and not lc.Cu[16:].any()
        )
        if not ok:
            return False
    return True


def make_fused_engine(specs: List[PhaseSpec], opt: HSDDPOptions,
                      vel_cmd: float, ground_height: float,
                      height_cmd: float = 0.0, dtype=jnp.float64,
                      lin_chunk: int = 48, acc_dtype=None,
                      scan_unroll: int = 1, analytic_lin: bool = True,
                      dynamics: str = "sym",
                      structured_constraints: bool = True):
    """acc_dtype: dtype for the COST / violation ACCUMULATORS (V, hacc) in
    the rollout.  The solver's discrete decisions — line-search acceptance
    (MultiPhaseDDP.cpp:130-151), DDP convergence, AL thresholds — all
    compare these scalars; accumulating them in f64 while trajectories stay
    f32 removes the O(T*eps_f32) summation drift that flips accept
    decisions (the round-2 f32 bench's 0.32 control deviation).  Cost per
    step is ~3 scalar adds — negligible even with TPU f64 emulation.
    Default None = same as dtype (unchanged behavior)."""
    if acc_dtype is None:
        acc_dtype = dtype
    # structured barrier path (r5): the constraint blocks are STRUCTURED —
    # torque rows are +-I over u, joint-limit rows are weightless
    # (eps_reb = 0 -> their barrier terms are EXACTLY 0.0 in float), GRF
    # rows touch only y.  Skipping exact-zero contributions and spelling
    # the +-I products as selections is BIT-IDENTICAL to the dense
    # 19-row algebra (IEEE x + 0.0 == x; all elided products are 0 * finite)
    # while cutting ~30% of the linearizer's FLOPs and several ops from
    # every issue-bound scan step.  Host-validated; falls back to the dense
    # path for any constraint layout it does not recognize.
    structured = structured_constraints and _validate_constraint_structure(
        specs)
    np_dtype = np.float64 if dtype == jnp.float64 else np.float32
    # model-term evaluation: "sym" = generated closed-form trig code
    # (models/sym_dynamics.py, several times fewer ops per scan step);
    # "ad" = jacfwd/jvp over the kinematics (the differential-test oracle)
    wb_xdot_fn = (Q.wb_xdot_masked_sym if dynamics == "sym"
                  else Q.wb_xdot_masked)
    wb_jac_fn = (Q.wb_jac_masked_sym if dynamics == "sym"
                 else Q.wb_jac_masked)
    plan = build_plan(specs, vel_cmd, height_cmd, dtype=np_dtype)
    P = len(specs)
    T = int(sum(s.n_steps for s in specs))
    # terminal AL machinery obeys HSDDP_OPTION.AL_active
    # (SinglePhase.cpp:110,141,178); static at build time so the disabled
    # branch constant-folds out of the compiled graphs.
    al_gate = 1.0 if getattr(opt, "AL_active", True) else 0.0

    # --------------------------------------------------------------- rollout
    # Every stage function takes `plan` as its FIRST argument (a pytree of
    # per-gridpoint arrays).  All plans of a problem family share shapes
    # (e.g. the 4 gait-mode rotations of the default problem), so ONE
    # compiled stage graph serves all of them — the receding-horizon MPC
    # driver swaps plans per cycle without recompiling.  The engine dict
    # also exposes partial-bound versions (this problem's plan) under the
    # unsuffixed names for single-problem use.
    def _lane_step(x, fh, V, hacc, eps, reb_on, alreb, t_refx,
                   t_nomx, t_nomu, t_du, t_K, psl, has_al_t, use_pd):
        """One per-lane gridpoint step of the forward sweep (the body of
        SinglePhase::forward_sweep, SinglePhase.cpp:62-180 + the phase
        seams of MultiPhaseDDP.cpp:350-379).  Pure function of one lane's
        state so the channel-last rollout can vmap it over lanes inside
        the scan (batch on the trailing axis)."""
        (t_isdyn, t_isterm, t_isstart, t_dynid, t_transid, t_doproj,
         t_tcid, t_pidx, t_wb, t_dt, t_contact, t_planfh, t_stime,
         t_pdgain, t_qw, t_rw, t_sw, t_qfw, t_refu, t_refy,
         t_Cx, t_Cu, t_Cy, t_cb, t_cvalid) = psl

        # phase-start: reset map + projection
        x = jax.lax.cond(
            t_isstart > 0,
            lambda xx: _project(_transition(t_transid, xx), t_doproj),
            lambda xx: xx,
            x,
        )
        # foothold planning (FB stance phase starts)
        fh_new = _plan_foothold_fused(x, t_stime, t_contact, vel_cmd,
                                      ground_height)
        fh = jnp.where(t_planfh > 0, fh_new, fh)

        # control
        u_pol = t_nomu + eps * t_du + LA.mv(t_K, x - t_nomx)
        u = jnp.where(use_pd > 0,
                      _pd_policy(x, t_contact, t_pdgain, t_wb), u_pol)
        u = u * t_isdyn

        # dynamics
        x_next, y = _step_dynamics(t_dynid, x, u, fh, t_contact, t_dt,
                                   wb_fn=wb_xdot_fn)
        y = y * t_isdyn

        # running cost + ReB barrier
        l = C.running_cost(x, u, y, t_refx, t_refu, t_refy,
                           t_qw, t_rw, t_sw, t_dt)
        delta_p = alreb.delta[t_pidx]
        eps_p = alreb.eps_reb[t_pidx]
        if structured:
            # structured barrier (see make_fused_engine): torque rows
            # g = -+u + 33 directly, GRF rows from the 3 Cy rows; the
            # weightless joint rows contribute exactly 0.0 and are elided
            gt = jnp.concatenate([-u, u]) + t_cb[0:8]
            gt = jnp.where(t_cvalid[0:8] > 0, gt, jnp.ones_like(gt))
            gy = LA.mv(t_Cy[16:], y) + t_cb[16:]
            gy = jnp.where(t_cvalid[16:] > 0, gy, jnp.ones_like(gy))
            Bt, _, _ = CONSTR.reduced_barrier(gt, delta_p[0:8])
            By, _, _ = CONSTR.reduced_barrier(gy, delta_p[16:])
            bsum = jnp.sum(jnp.concatenate(
                [eps_p[0:8] * Bt * t_cvalid[0:8],
                 eps_p[16:] * By * t_cvalid[16:]]))
        else:
            g = LA.mv(t_Cx, x) + LA.mv(t_Cu, u) + LA.mv(t_Cy, y) + t_cb
            g = jnp.where(t_cvalid > 0, g, jnp.ones_like(g))
            Bv, _, _ = CONSTR.reduced_barrier(g, delta_p)
            bsum = jnp.sum(eps_p * Bv * t_cvalid)
        l = l + reb_on * bsum * t_dt
        V = V + (t_isdyn * l).astype(acc_dtype)

        # terminal cost + AL penalty + switching constraint
        phi = C.terminal_cost(x, t_refx, t_qfw)
        h = _touchdown(t_tcid, x, ground_height)
        sig, lam = alreb.sigma[t_pidx], alreb.lam[t_pidx]
        phi = phi + has_al_t * (50.0 * al_gate) * (
            (sig * h / 2.0) ** 2 + lam * h
        )
        V = V + (t_isterm * phi).astype(acc_dtype)
        hacc = hacc + jnp.zeros_like(hacc).at[t_pidx].set(
            (t_isterm * h).astype(acc_dtype))

        x_store = x * jnp.where(use_pd > 0, t_wb, jnp.ones((), x.dtype))
        x_carry = jnp.where(t_isdyn > 0, x_next, x)
        return x_carry, fh, V, hacc, (x_store, u, y)

    def _plan_scan_fields(plan):
        return (
            plan.is_dyn, plan.is_term, plan.is_start, plan.dyn_id,
            plan.trans_id, plan.do_proj, plan.tc_id, plan.phase_idx,
            plan.wb_mask, plan.dt, plan.contact, plan.plan_fh,
            plan.stance_time, plan.pd_gain,
            plan.qw, plan.rw, plan.sw, plan.qfw,
            plan.ref_u, plan.ref_y,
            plan.Cx, plan.Cu, plan.Cy, plan.cb, plan.c_valid,
        )

    def _rollout_impl(plan, x0, nom_x, nom_u, ctg: FusedCTG, eps, ref_x,
                      alreb: FusedALReB, reb_on, use_pd, with_traj=True):
        def body(carry, inp):
            x, fh, V, hacc = carry
            t_refx, t_nomx, t_nomu, t_du, t_K, psl, t_hasal = inp
            x_carry, fh, V, hacc, outs = _lane_step(
                x, fh, V, hacc, eps, reb_on, alreb, t_refx,
                t_nomx, t_nomu, t_du, t_K, psl, t_hasal, use_pd)
            return (x_carry, fh, V, hacc), (outs if with_traj else None)

        inputs = (ref_x, nom_x, nom_u, ctg.du, ctg.Kfb,
                  _plan_scan_fields(plan), plan.has_al[plan.phase_idx])
        init = (x0, jnp.zeros(4, dtype=x0.dtype),
                jnp.zeros((), dtype=acc_dtype), jnp.zeros(P, dtype=acc_dtype))
        (_, _, V, hacc), outs = jax.lax.scan(body, init, inputs)
        if not with_traj:
            # cost/violation-only variant (line-search trials): no stacked
            # trajectory outputs -> O(1) memory per candidate step size
            return V, hacc, jnp.sqrt(jnp.sum(hacc**2))
        xs, us, ys = outs
        return FusedTraj(x=xs, u=us, y=ys, V=V, h=hacc,
                         viol=jnp.sqrt(jnp.sum(hacc**2)))

    def rollout(plan, x0, nom_x, nom_u, ctg, eps, ref_x, alreb, reb_on,
                use_pd):
        return _rollout_impl(plan, x0, nom_x, nom_u, ctg, eps, ref_x, alreb,
                             reb_on, use_pd, with_traj=True)

    def rollout_V(plan, x0, nom_x, nom_u, ctg, eps, ref_x, alreb, reb_on,
                  use_pd):
        return _rollout_impl(plan, x0, nom_x, nom_u, ctg, eps, ref_x, alreb,
                             reb_on, use_pd, with_traj=False)

    # batch-trailing vmap of the lane step, for the channel-last rollout:
    # lane state / per-lane operands on axis -1 (or 0 for (B,)-major
    # scalars and the AL/ReB tree), plan scalars shared
    _lane_step_v = jax.vmap(
        _lane_step,
        in_axes=(-1, -1, 0, 0, 0, 0, 0, -1, -1, -1, -1, -1, None, None,
                 None),
        out_axes=(-1, -1, 0, 0, (-1, -1, -1)))

    def _rollout_impl_cl(plan, x0_b, nom_x, nom_u, ctg: FusedCTG, eps_b,
                         ref_x, alreb_b, reb_on_b, use_pd, with_traj=True):
        """Batched rollout with CHANNEL-LAST trajectories natively:
        x0_b (B, 14); nom_x/ref_x (T, 14, B); nom_u/ctg.du (T, 4, B);
        ctg.Kfb (T, 4, 14, B); eps_b/reb_on_b (B,); alreb_b lane-major.
        vmap-inside-scan, so the stacked outputs are (T, ., B) compact —
        vmap(rollout, out_axes=-1) would stack batch-major (9-32x tile
        padding) and transpose after (see make_linearize_cl)."""
        B = x0_b.shape[0]

        def body(carry, inp):
            x, fh, V, hacc = carry
            t_refx, t_nomx, t_nomu, t_du, t_K, psl, t_hasal = inp
            x_carry, fh, V, hacc, outs = _lane_step_v(
                x, fh, V, hacc, eps_b, reb_on_b, alreb_b, t_refx,
                t_nomx, t_nomu, t_du, t_K, psl, t_hasal, use_pd)
            return (x_carry, fh, V, hacc), (outs if with_traj else None)

        inputs = (ref_x, nom_x, nom_u, ctg.du, ctg.Kfb,
                  _plan_scan_fields(plan), plan.has_al[plan.phase_idx])
        init = (x0_b.T, jnp.zeros((4, B), dtype=x0_b.dtype),
                jnp.zeros((B,), dtype=acc_dtype),
                jnp.zeros((B, P), dtype=acc_dtype))
        (_, _, V, hacc), outs = jax.lax.scan(body, init, inputs,
                                             unroll=scan_unroll)
        viol = jnp.sqrt(jnp.sum(hacc**2, axis=-1))
        if not with_traj:
            return V, hacc, viol
        xs, us, ys = outs
        return FusedTraj(x=xs, u=us, y=ys, V=V, h=hacc, viol=viol)

    def rollout_cl(plan, x0_b, nom_x, nom_u, ctg, eps_b, ref_x, alreb_b,
                   reb_on_b, use_pd):
        return _rollout_impl_cl(plan, x0_b, nom_x, nom_u, ctg, eps_b, ref_x,
                                alreb_b, reb_on_b, use_pd, with_traj=True)

    def rollout_V_cl(plan, x0_b, nom_x, nom_u, ctg, eps_b, ref_x, alreb_b,
                     reb_on_b, use_pd):
        return _rollout_impl_cl(plan, x0_b, nom_x, nom_u, ctg, eps_b, ref_x,
                                alreb_b, reb_on_b, use_pd, with_traj=False)

    # ------------------------------------------------------------- linearize
    def _terminal_al_grads(x, t_tcid, t_hasal, sig, lam, include_al_grad):
        """AL terminal-constraint gradient/Hessian contribution
        (SinglePhase.cpp:257-275 under the calc-flag quirk): nested AD of
        the touchdown height.  Split out so the channel-last linearizer
        can evaluate it at the P phase-terminal gridpoints only instead of
        all T (it is exactly zero elsewhere: tc_id=0 makes _touchdown a
        constant 0)."""
        hfun = lambda xx: _touchdown(t_tcid, xx, ground_height)
        h = hfun(x)
        hx = jax.grad(hfun)(x)
        hxx = jax.jacfwd(jax.grad(hfun))(x)
        al_on = t_hasal * include_al_grad * al_gate
        dphix = al_on * 50.0 * (sig * sig / 2.0 * hx * h + lam * hx)
        dphixx = al_on * 50.0 * (
            sig * sig / 2.0 * (LA.outer(hx, hx) + h * hxx) + lam * hxx
        )
        return dphix, dphixx

    def _lin_step_base(x, u, y, fh, t_dynid, t_pidx, t_dt, t_contact,
                       t_qw, t_rw, t_sw, t_qfw, t_refx, t_refu, t_refy,
                       t_Cx, t_Cu, t_Cy, t_cb, t_cvalid,
                       alreb, reb_on):
        if analytic_lin:
            # Closed-form masked-KKT Jacobians (Q.wb_jac_masked — the
            # Dyn_*_par analog): reuses the primal contact factorization
            # as multi-RHS solves instead of 18 forward tangents through
            # the dynamics (round-3 jacfwd path = 55% of solve time).
            # The FB branch keeps a cheap 6-state jacfwd; like the old
            # lax.cond under vmap, both branches evaluate and a select
            # keeps the right one (the WB math is finite on embedded FB
            # states — M(q) is SPD for every configuration).
            dxdx, dxdu, dFdx, dFdu = wb_jac_fn(
                x, u, t_contact[0], t_contact[1])
            A_wb = jnp.eye(XDIM, dtype=x.dtype) + dxdx * t_dt
            Bm_wb = dxdu * t_dt

            def fb_step(x6, uu):
                return x6 + FB.fb_continuous_dynamics(
                    x6, uu, fh, t_contact) * t_dt

            A6 = jax.jacfwd(lambda x6: fb_step(x6, u))(x[:6])
            B6 = jax.jacfwd(lambda uu: fb_step(x[:6], uu))(u)
            A_fb = jnp.zeros((XDIM, XDIM), x.dtype).at[:6, :6].set(A6)
            Bm_fb = jnp.zeros((XDIM, UDIM), x.dtype).at[:6, :].set(B6)
            is_fb = t_dynid == DYN_FB
            A = jnp.where(is_fb, A_fb, A_wb)
            Bm = jnp.where(is_fb, Bm_fb, Bm_wb)
            Cm = jnp.where(is_fb, jnp.zeros((YDIM, XDIM), x.dtype), dFdx)
            D = jnp.where(is_fb, jnp.zeros((YDIM, UDIM), x.dtype), dFdu)
        else:
            step = lambda xx, uu: _step_dynamics(
                t_dynid, xx, uu, fh, t_contact, t_dt, wb_fn=wb_xdot_fn)
            A, Cm = jax.jacfwd(lambda xx: step(xx, u))(x)  # discrete A, dy/dx
            Bm, D = jax.jacfwd(lambda uu: step(x, uu))(u)
        lx, lu, ly = C.running_cost_grads(
            x, u, y, t_refx, t_refu, t_refy, t_qw, t_rw, t_sw, t_dt
        )
        lxx = jnp.diag(2.0 * t_dt * t_qw)
        luu = jnp.diag(2.0 * t_dt * t_rw)
        lyy = jnp.diag(2.0 * t_dt * t_sw)
        delta_p = alreb.delta[t_pidx]
        eps_p = alreb.eps_reb[t_pidx]
        if structured:
            # structured barrier derivatives (see make_fused_engine):
            # lx/lxx are untouched (Cx lives only on the weightless joint
            # rows), Cu^T diag(w) Cu is the diagonal w_lo + w_hi, the GRF
            # block is the 3 Cy rows — bit-identical elision of exact-zero
            # terms, ~30% of the dense linearizer's barrier FLOPs removed
            gt = jnp.concatenate([-u, u]) + t_cb[0:8]
            gt = jnp.where(t_cvalid[0:8] > 0, gt, jnp.ones_like(gt))
            Cy3 = t_Cy[16:]
            gy = LA.mv(Cy3, y) + t_cb[16:]
            gy = jnp.where(t_cvalid[16:] > 0, gy, jnp.ones_like(gy))
            _, Bzt, Bzzt = CONSTR.reduced_barrier(gt, delta_p[0:8])
            _, Bzy, Bzzy = CONSTR.reduced_barrier(gy, delta_p[16:])
            w1t = reb_on * eps_p[0:8] * Bzt * t_cvalid[0:8] * t_dt
            w2t = reb_on * eps_p[0:8] * Bzzt * t_cvalid[0:8] * t_dt
            w1y = reb_on * eps_p[16:] * Bzy * t_cvalid[16:] * t_dt
            w2y = reb_on * eps_p[16:] * Bzzy * t_cvalid[16:] * t_dt
            lu = lu + (-w1t[0:4] + w1t[4:8])
            ly = ly + LA.mv(Cy3.T, w1y)
            luu = luu + jnp.diag(w2t[0:4] + w2t[4:8])
            lyy = lyy + LA.mm(Cy3.T, w2y[:, None] * Cy3)
        else:
            g = LA.mv(t_Cx, x) + LA.mv(t_Cu, u) + LA.mv(t_Cy, y) + t_cb
            g = jnp.where(t_cvalid > 0, g, jnp.ones_like(g))
            _, Bz, Bzz = CONSTR.reduced_barrier(g, delta_p)
            w1 = reb_on * eps_p * Bz * t_cvalid * t_dt
            w2 = reb_on * eps_p * Bzz * t_cvalid * t_dt
            lx = lx + LA.mv(t_Cx.T, w1)
            lu = lu + LA.mv(t_Cu.T, w1)
            ly = ly + LA.mv(t_Cy.T, w1)
            lxx = lxx + LA.mm(t_Cx.T, w2[:, None] * t_Cx)
            luu = luu + LA.mm(t_Cu.T, w2[:, None] * t_Cu)
            lyy = lyy + LA.mm(t_Cy.T, w2[:, None] * t_Cy)
        # terminal cost gradient (AL terms added by the caller / _lin_step)
        phix = t_qfw * (x - t_refx)
        phixx = jnp.diag(t_qfw)
        return A, Bm, Cm, D, lx, lu, ly, lxx, luu, lyy, phix, phixx

    def _lin_step(x, u, y, fh, t_dynid, t_pidx, t_dt, t_contact,
                  t_qw, t_rw, t_sw, t_qfw, t_refx, t_refu, t_refy,
                  t_Cx, t_Cu, t_Cy, t_cb, t_cvalid, t_tcid, t_hasal,
                  alreb, reb_on, include_al_grad):
        outs = _lin_step_base(
            x, u, y, fh, t_dynid, t_pidx, t_dt, t_contact, t_qw, t_rw,
            t_sw, t_qfw, t_refx, t_refu, t_refy, t_Cx, t_Cu, t_Cy, t_cb,
            t_cvalid, alreb, reb_on)
        (A, Bm, Cm, D, lx, lu, ly, lxx, luu, lyy, phix, phixx) = outs
        sig, lam = alreb.sigma[t_pidx], alreb.lam[t_pidx]
        dphix, dphixx = _terminal_al_grads(x, t_tcid, t_hasal, sig, lam,
                                           include_al_grad)
        return (A, Bm, Cm, D, lx, lu, ly, lxx, luu, lyy,
                phix + dphix, phixx + dphixx)

    def make_linearize():
        CH = _chunk_size(T, lin_chunk)

        def lin(plan, traj: FusedTraj, ref_x, alreb: FusedALReB, reb_on,
                include_al_grad):
            x_starts = traj.x[plan.start_idx]
            fh_p = jax.vmap(
                lambda x, st, ct: _plan_foothold_fused(
                    x, st, ct, vel_cmd, ground_height)
            )(x_starts, plan.stance_time[plan.start_idx],
              plan.contact[plan.start_idx])
            fh_t = fh_p[plan.phase_idx]

            # Time-chunked jacfwd: one vmap over all T gridpoints would
            # materialize O(T * tangent-width) intermediates (tens of GB at
            # batch 256 on a 16 GB chip); lax.map over T/CH chunks bounds
            # them while each chunk still exposes CH (x batch) lanes.
            per_t = (traj.x, traj.u, traj.y, fh_t,
                     plan.dyn_id, plan.phase_idx, plan.dt, plan.contact,
                     plan.qw, plan.rw, plan.sw, plan.qfw,
                     ref_x, plan.ref_u, plan.ref_y,
                     plan.Cx, plan.Cu, plan.Cy, plan.cb, plan.c_valid,
                     plan.tc_id, plan.has_al[plan.phase_idx])
            chunked = jax.tree.map(
                lambda a: a.reshape((T // CH, CH) + a.shape[1:]), per_t
            )
            outs = jax.lax.map(
                lambda ch: jax.vmap(
                    _lin_step, in_axes=(0,) * 22 + (None, None, None)
                )(*ch, alreb, reb_on, include_al_grad),
                chunked,
            )
            outs = jax.tree.map(
                lambda a: a.reshape((T,) + a.shape[2:]), outs
            )
            A, Bm, Cm, D, lx, lu, ly, lxx, luu, lyy, phix, phixx = outs

            # transition jacobians at the pre-reset terminal states,
            # composed with the projection; stored at next-phase starts
            def trans_jac(x, trans_id, do_proj):
                Px = jax.jacfwd(lambda xx: _transition(trans_id, xx))(x)
                SPx = LA.mm(_proj_matrix(x.dtype), Px)
                return jnp.where(do_proj > 0, SPx, Px)

            sidx_next = plan.start_idx[1:]
            x_terms = traj.x[plan.term_idx[:-1]]
            Px_p = jax.vmap(trans_jac)(
                x_terms, plan.trans_id[sidx_next], plan.do_proj[sidx_next]
            )
            Px = jnp.zeros((T, XDIM, XDIM), traj.x.dtype)
            Px = Px.at[sidx_next].set(Px_p)
            return FusedLin(A=A, Bm=Bm, Cm=Cm, D=D, lx=lx, lu=lu, ly=ly,
                            lxx=lxx, luu=luu, lyy=lyy, phix=phix,
                            phixx=phixx, Px=Px)

        return lin

    def make_linearize_cl():
        """Batched linearization producing CHANNEL-LAST (T, ..., B) output
        NATIVELY.  vmap(linearize, out_axes=-1) computes batch-major and
        transposes at the end — the transiently materialized batch-major
        (B, T, 14, 14) arrays tile-pad 10-32x and OOM a 16 GB chip at
        B=1024 (2.8 GB of data -> ~30 GB padded).  Here the loop order is
        exchanged: chunked lax.map over TIME outside, vmap over gridpoints
        then vmap over batch-TRAILING inside, so every intermediate is
        (CH, ..., B) with the batch on the lane axis — compact end to end.
        """
        CH = _chunk_size(T, lin_chunk)
        # batch axis (trailing) vmap of the per-(gridpoint, lane) step:
        # traj/foothold/ref_x are per-lane (-1), plan-derived operands are
        # lane-independent (None), AL/ReB state is lane-major (0).  The
        # main sweep runs WITHOUT the terminal-AL nested AD (zero at all
        # non-terminal gridpoints); that part is evaluated separately at
        # the P phase-terminal gridpoints below — 8 evaluations instead of
        # 720 of a grad + forward-over-reverse Hessian.
        step_b = jax.vmap(
            _lin_step_base,
            in_axes=(-1, -1, -1, -1) + (None,) * 8 + (-1,) + (None,) * 7
            + (0, 0),
            out_axes=-1)
        # gridpoint axis vmap (within a time chunk)
        step_cb = jax.vmap(
            step_b, in_axes=(0,) * 20 + (None, None), out_axes=0)
        term_b = jax.vmap(  # over lanes (trailing) at one terminal point
            _terminal_al_grads, in_axes=(-1, None, None, 0, 0, None),
            out_axes=-1)
        term_pb = jax.vmap(  # over the P phases
            term_b, in_axes=(0, 0, 0, -1, -1, None), out_axes=0)

        def lin_cl(plan, traj: FusedTraj, ref_x, alreb_b, reb_on_b,
                   include_al_grad):
            # traj leaves (T, ., B); ref_x (T, 14, B); alreb_b (B, ...)
            Bb = traj.x.shape[-1]
            x_starts = traj.x[plan.start_idx]      # (P, 14, B)
            fh_p = jax.vmap(jax.vmap(
                lambda x, st, ct: _plan_foothold_fused(
                    x, st, ct, vel_cmd, ground_height),
                in_axes=(-1, None, None), out_axes=-1,
            ))(x_starts, plan.stance_time[plan.start_idx],
               plan.contact[plan.start_idx])
            fh_t = fh_p[plan.phase_idx]            # (T, 4, B)

            per_t = (traj.x, traj.u, traj.y, fh_t,
                     plan.dyn_id, plan.phase_idx, plan.dt, plan.contact,
                     plan.qw, plan.rw, plan.sw, plan.qfw,
                     ref_x, plan.ref_u, plan.ref_y,
                     plan.Cx, plan.Cu, plan.Cy, plan.cb, plan.c_valid)
            chunked = jax.tree.map(
                lambda a: a.reshape((T // CH, CH) + a.shape[1:]), per_t
            )
            outs = jax.lax.map(
                lambda ch: step_cb(*ch, alreb_b, reb_on_b),
                chunked,
            )
            outs = jax.tree.map(
                lambda a: a.reshape((T,) + a.shape[2:]), outs
            )
            A, Bm, Cm, D, lx, lu, ly, lxx, luu, lyy, phix, phixx = outs

            # terminal-AL gradient/Hessian at the P phase-terminal
            # gridpoints (exact zero everywhere else)
            x_term = traj.x[plan.term_idx]         # (P, 14, B)
            dphix, dphixx = term_pb(
                x_term, plan.tc_id[plan.term_idx], plan.has_al,
                alreb_b.sigma, alreb_b.lam, include_al_grad)
            phix = phix.at[plan.term_idx].add(dphix)
            phixx = phixx.at[plan.term_idx].add(dphixx)

            def trans_jac(x, trans_id, do_proj):
                Px = jax.jacfwd(lambda xx: _transition(trans_id, xx))(x)
                SPx = LA.mm(_proj_matrix(x.dtype), Px)
                return jnp.where(do_proj > 0, SPx, Px)

            sidx_next = plan.start_idx[1:]
            x_terms = traj.x[plan.term_idx[:-1]]   # (P-1, 14, B)
            Px_p = jax.vmap(jax.vmap(
                trans_jac, in_axes=(-1, None, None), out_axes=-1,
            ))(x_terms, plan.trans_id[sidx_next], plan.do_proj[sidx_next])
            Px = jnp.zeros((T, XDIM, XDIM, Bb), traj.x.dtype)
            Px = Px.at[sidx_next].set(Px_p)
            return FusedLin(A=A, Bm=Bm, Cm=Cm, D=D, lx=lx, lu=lu, ly=ly,
                            lxx=lxx, luu=luu, lyy=lyy, phix=phix,
                            phixx=phixx, Px=Px)

        return lin_cl

    # -------------------------------------------------------------- backward
    # Stacked-operand Riccati step (r5): the body is ISSUE-bound (~60
    # dependency-chained small ops per step, PERF.md §16), so the lever is
    # op COUNT, not FLOPs.  Column-stacking Z = [A | B] (14 x 18) and
    # W = [C | D] (4 x 18) merges the 14 separate Q-expansion contractions
    # into 6, and stacking [Qu | Qux] (4 x 15) merges the gain/CTG products
    # into 2 more — 21 contractions/step -> 10.  Every output element is
    # the SAME multiply-reduce over the SAME contraction axis in the same
    # order (stacking only extends non-contracted axes; QuxT_Quu_inv
    # reuses -Kk^T, exact because Quu_inv is explicitly symmetrized), so
    # results are BIT-IDENTICAL to the unstacked form on CPU f64 — the
    # cross-engine equivalence tests pin this.
    def backward(plan, lin: FusedLin, reg):
        eye_x = jnp.eye(XDIM, dtype=lin.A.dtype)
        eye_u = jnp.eye(UDIM, dtype=lin.A.dtype)

        def body(carry, inp):
            G1, H1, dV, ok = carry
            (AB, CD, lx, lu, ly, lxx, luu, lyy, phix, phixx, Px,
             t_isdyn, t_isterm, t_isstart) = inp

            # terminal gridpoint: initialize from terminal cost
            G1 = jnp.where(t_isterm > 0, phix + G1, G1)
            H1 = jnp.where(t_isterm > 0, phixx + H1, H1)

            # Riccati step (MHPC_CompoundTypes.h:117-144), stacked operands
            ABtG1 = LA.mv(AB.T, G1)              # [A^T G1 | B^T G1]
            CDtly = LA.mv(CD.T, ly)              # [C^T ly | D^T ly]
            Qx = lx + ABtG1[:XDIM] + CDtly[:XDIM]
            Qu = lu + ABtG1[XDIM:] + CDtly[XDIM:]
            lyyCD = LA.mm(lyy, CD)
            H1AB = LA.mm(H1, AB)
            CDq = LA.mm(CD.T, lyyCD)             # [C|D]^T lyy [C|D]
            ABq = LA.mm(AB.T, H1AB)              # [A|B]^T H1  [A|B]
            Qxx = lxx + CDq[:XDIM, :XDIM] + ABq[:XDIM, :XDIM] + eye_x * reg
            Quu = luu + CDq[XDIM:, XDIM:] + ABq[XDIM:, XDIM:] + eye_u * reg
            Qux = CDq[XDIM:, :XDIM] + ABq[XDIM:, :XDIM]
            ok_k = LA.is_pd_chol(Quu, shift=1e-9) | (t_isdyn <= 0)
            Quu_raw_inv = LA.inv4(Quu)
            Quu_inv = (Quu_raw_inv + Quu_raw_inv.T) / 2.0
            Qxx = (Qxx + Qxx.T) / 2.0
            QuQux = jnp.concatenate([Qu[:, None], Qux], axis=1)  # (4, 15)
            duK = -LA.mm(Quu_inv, QuQux)         # [du | Kfb]
            du = duK[:, 0]
            Kk = duK[:, 1:]
            QuxT_Quu_inv = -Kk.T                 # == Qux^T Quu_inv (sym)
            GH = jnp.concatenate([Qx[:, None], Qxx], axis=1) - LA.mm(
                QuxT_Quu_inv, QuQux)             # [G_new | H_new]
            G_new = GH[:, 0]
            H_new = GH[:, 1:]
            dV_k = -LA.vdot(Qu, LA.mv(Quu_raw_inv, Qu))

            G_out = jnp.where(t_isdyn > 0, G_new, G1)
            H_out = jnp.where(t_isdyn > 0, H_new, H1)
            dV = dV + t_isdyn * dV_k
            # phase handoff AFTER this gridpoint's Riccati step: the seam
            # transform (impact-aware step, MultiPhaseDDP.cpp:299-341) sits
            # between this phase's start and the previous phase's terminal;
            # the stored CTG keeps the pre-handoff value (reference CTG[0]).
            # lax.cond (not where): evaluated at only P-1 of T steps.
            G_carry, H_carry = jax.lax.cond(
                t_isstart > 0,
                lambda g, h, p: (LA.mv(p.T, g), LA.mm(p.T, LA.mm(h, p))),
                lambda g, h, p: (g, h),
                G_out, H_out, Px)
            return (G_carry, H_carry, dV, ok & ok_k), (
                du * t_isdyn, Kk * t_isdyn, G_out
            )

        # stack once outside the scan (same bytes as A/Bm/Cm/D separately)
        AB_all = jnp.concatenate([lin.A, lin.Bm], axis=-1)
        CD_all = jnp.concatenate([lin.Cm, lin.D], axis=-1)
        inputs = (AB_all, CD_all, lin.lx, lin.lu, lin.ly,
                  lin.lxx, lin.luu, lin.lyy, lin.phix, lin.phixx, lin.Px,
                  plan.is_dyn, plan.is_term, plan.is_start)
        dt_ = lin.A.dtype
        init = (jnp.zeros(XDIM, dt_), jnp.zeros((XDIM, XDIM), dt_),
                jnp.zeros((), dt_), jnp.asarray(True))
        (_, _, dV, ok), (dus, Ks, Gs) = jax.lax.scan(
            body, init, inputs, reverse=True
        )
        return ok, dV, FusedCTG(du=dus, Kfb=Ks, G=Gs)

    # ---------------------------------------------- backward (channel-last)
    def backward_cl(plan, lin: FusedLin, reg_b):
        """Batched Riccati backward sweep on CHANNEL-LAST operands.

        lin leaves are (T, rows, cols, B) with the batch on the minor
        (lane) axis; reg_b is (B,).  Numerically the same recursion as
        `backward` (MHPC_CompoundTypes.h:117-144 + the impact-aware seam of
        MultiPhaseDDP.cpp:299-341), but every per-step (r, c, B) array
        tiles the TPU's (8 x 128) vregs with B on lanes — ~1.1x padding vs
        the 10-32x a (B, r, c) layout pays, which is the difference between
        a bandwidth-bound sweep and one that moves 30 GB of padding per
        call (measured: the B=1024 batch-major sweep OOMs at 32.7 GB for
        2.8 GB of data).  Returns (ok (B,) bool, dV (B,), FusedCTG with
        (T, ..., B) leaves).
        """
        B = reg_b.shape[0]
        dt_ = lin.A.dtype
        eye_x = jnp.eye(XDIM, dtype=dt_)[:, :, None]
        eye_u = jnp.eye(UDIM, dtype=dt_)[:, :, None]
        regx = reg_b[None, None, :]

        def body(carry, inp):
            G1, H1, dV, ok = carry
            (AB, CD, lx, lu, ly, lxx, luu, lyy, phix, phixx, Px,
             t_isdyn, t_isterm, t_isstart) = inp

            G1 = jnp.where(t_isterm > 0, phix + G1, G1)
            H1 = jnp.where(t_isterm > 0, phixx + H1, H1)

            # stacked Q-expansion (see `backward`: bit-identical sums,
            # 21 -> 10 contractions on the issue-bound critical path)
            ABtG1 = LA.mtv_cl(AB, G1)            # (18, B)
            CDtly = LA.mtv_cl(CD, ly)            # (18, B)
            Qx = lx + ABtG1[:XDIM] + CDtly[:XDIM]
            Qu = lu + ABtG1[XDIM:] + CDtly[XDIM:]
            lyyCD = LA.mm_cl(lyy, CD)            # (4, 18, B)
            H1AB = LA.mm_cl(H1, AB)              # (14, 18, B)
            CDq = LA.mtm_cl(CD, lyyCD)           # (18, 18, B)
            ABq = LA.mtm_cl(AB, H1AB)            # (18, 18, B)
            Qxx = lxx + CDq[:XDIM, :XDIM] + ABq[:XDIM, :XDIM] + eye_x * regx
            Quu = luu + CDq[XDIM:, XDIM:] + ABq[XDIM:, XDIM:] + eye_u * regx
            Qux = CDq[XDIM:, :XDIM] + ABq[XDIM:, :XDIM]
            ok_k = LA.is_pd_chol_cl(Quu, shift=1e-9) | (t_isdyn <= 0)
            Quu_raw_inv = LA.inv4_cl(Quu)
            Quu_inv = LA.sym_cl(Quu_raw_inv)
            Qxx = LA.sym_cl(Qxx)
            QuQux = jnp.concatenate([Qu[:, None], Qux], axis=1)  # (4,15,B)
            duK = -LA.mm_cl(Quu_inv, QuQux)      # [du | Kfb]
            du = duK[:, 0]
            Kk = duK[:, 1:]
            QuxT_Quu_inv = -jnp.swapaxes(Kk, 0, 1)  # == Qux^T Quu_inv (sym)
            GH = jnp.concatenate([Qx[:, None], Qxx], axis=1) - LA.mm_cl(
                QuxT_Quu_inv, QuQux)             # [G_new | H_new]
            G_new = GH[:, 0]
            H_new = GH[:, 1:]
            dV_k = -LA.vdot_cl(Qu, LA.mv_cl(Quu_raw_inv, Qu))

            G_out = jnp.where(t_isdyn > 0, G_new, G1)
            H_out = jnp.where(t_isdyn > 0, H_new, H1)
            dV = dV + t_isdyn * dV_k
            # seam handoff as a REAL lax.cond (predicate is a per-step
            # plan scalar, so XLA executes one branch): the two 14^3
            # CL products are needed at only P-1 of T steps, and a
            # jnp.where would evaluate them at every step — measured
            # ~35% of the whole backward sweep's FLOPs (r4).
            G_carry, H_carry = jax.lax.cond(
                t_isstart > 0,
                lambda g, h, p: (LA.mtv_cl(p, g),
                                 LA.mtm_cl(p, LA.mm_cl(h, p))),
                lambda g, h, p: (g, h),
                G_out, H_out, Px)
            return (G_carry, H_carry, dV, ok & ok_k), (
                du * t_isdyn, Kk * t_isdyn, G_out
            )

        # stack once outside the scan: (T, 14, 18, B) / (T, 4, 18, B)
        # transients (same bytes as the four inputs; ~0.9 GB at B=512 f64,
        # within the measured headroom — B=768 f64 fits with the old form)
        AB_all = jnp.concatenate([lin.A, lin.Bm], axis=2)
        CD_all = jnp.concatenate([lin.Cm, lin.D], axis=2)
        inputs = (AB_all, CD_all, lin.lx, lin.lu, lin.ly,
                  lin.lxx, lin.luu, lin.lyy, lin.phix, lin.phixx, lin.Px,
                  plan.is_dyn, plan.is_term, plan.is_start)
        init = (jnp.zeros((XDIM, B), dt_), jnp.zeros((XDIM, XDIM, B), dt_),
                jnp.zeros((B,), dt_), jnp.ones((B,), bool))
        (_, _, dV, ok), (dus, Ks, Gs) = jax.lax.scan(
            body, init, inputs, reverse=True, unroll=scan_unroll
        )
        return ok, dV, FusedCTG(du=dus, Kfb=Ks, G=Gs)

    def _hp(f):
        """Pin every dot in the engine graphs to true-f32 multiplies.

        TPU MXU matmuls default to bf16xbf16 passes for f32 operands; with
        the stiff KKT contact solves and the Riccati recursion that costs
        ~3 decimal digits and (measured, round 2) corrupts the f32 solve
        to O(1e2) control error vs golden.  `highest` restores full f32
        multiplies (3-pass) — measured FASTER end-to-end on v5e (4.0s vs
        5.9s per B=256 solve batch) and exact on CPU/f64 (no-op there).
        """
        def g(*a, **k):
            with jax.default_matmul_precision("highest"):
                return f(*a, **k)
        return g

    import functools

    linearize = make_linearize()
    return dict(
        plan=plan,
        # partial-bound to this problem's plan (single-problem use)
        rollout=_hp(functools.partial(rollout, plan)),
        rollout_V=_hp(functools.partial(rollout_V, plan)),
        linearize=_hp(functools.partial(linearize, plan)),
        backward=_hp(functools.partial(backward, plan)),
        # plan-as-first-argument versions: one compiled graph serves every
        # plan of identical shapes (the 4 gait-mode rotations in MPC)
        rollout_p=_hp(rollout), rollout_V_p=_hp(rollout_V),
        linearize_p=_hp(linearize), backward_p=_hp(backward),
        backward_cl_p=_hp(backward_cl),
        linearize_cl_p=_hp(make_linearize_cl()),
        rollout_cl_p=_hp(rollout_cl), rollout_V_cl_p=_hp(rollout_V_cl),
        specs=specs, n_phases=P, T=T)
