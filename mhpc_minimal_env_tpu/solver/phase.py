"""Single-phase engine: rollout, linearization, backward Riccati sweep.

Maps the reference's SinglePhase<T,X,U,Y> (HSDDPSolver/source/SinglePhase.cpp)
onto lax.scan over the time axis.  Three entry points per phase, built
statically from a PhaseSpec:

  rollout     = forward_sweep_dynamics_only (SinglePhase.cpp:117-144)
  linearize   = forward_sweep_partials_only (SinglePhase.cpp:147-180)
                (the full forward_sweep == rollout + linearize on the same
                 states; the AL terminal-gradient quirk is the
                 `include_al_grad` flag, see below)
  backward    = backward_sweep (SinglePhase.cpp:183-216) with the CTG
                recursion from MHPC_CompoundTypes.h:117-144

Reference quirk reproduced deliberately (SURVEY.md 2.5.3):
`update_terminal_cost_with_tconstr` gates its gradient branch on
CALC_DYNAMICS_ONLY||CALC_DYN_AND_PAR (SinglePhase.cpp:265-273), so a
partials-only sweep refreshes Phix/Phixx *without* the AL terms.  Hence
backward sweeps in DDP iterations >= 2 see plain terminal gradients
(include_al_grad=False), while the first backward of each AL iteration sees
AL-augmented ones (include_al_grad=True).
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..models import quadruped as Q
from ..models import floating_base as FB
from ..models import kinematics as K
from ..ops import linalg as LA
from ..types import PhaseSpec
from . import costs as C
from . import constraints as CONSTR


class PhaseTraj(NamedTuple):
    x: jnp.ndarray   # (N, xs)
    u: jnp.ndarray   # (N, us)
    y: jnp.ndarray   # (N, ys)
    V: jnp.ndarray   # scalar phase cost (incl. ReB/AL as gated)
    h: jnp.ndarray   # (n_tc,) terminal constraint values


class PhaseLin(NamedTuple):
    A: jnp.ndarray    # (N-1, xs, xs)
    B: jnp.ndarray    # (N-1, xs, us)
    Cm: jnp.ndarray   # (N-1, ys, xs)
    D: jnp.ndarray    # (N-1, ys, us)
    lx: jnp.ndarray   # (N-1, xs)
    lu: jnp.ndarray   # (N-1, us)
    ly: jnp.ndarray   # (N-1, ys)
    lxx: jnp.ndarray  # (N-1, xs, xs)
    luu: jnp.ndarray  # (N-1, us, us)
    lyy: jnp.ndarray  # (N-1, ys, ys)
    phix: jnp.ndarray   # (xs,)
    phixx: jnp.ndarray  # (xs, xs)


class PhaseCTG(NamedTuple):
    du: jnp.ndarray  # (N, us)
    Kfb: jnp.ndarray # (N, us, xs)
    G: jnp.ndarray   # (N, xs)


def _plan_foothold(x0, spec: PhaseSpec, vel_cmd, ground_height):
    """FootholdPlanner::get_foothold_location (Dynamics/header/FootholdPlan.h:27-50).

    Raibert heuristic from the phase's initial (x, z, pitch); only stance
    modes plan (flight modes return zeros, and contact gating ignores it)."""
    stance_time = spec.dt * spec.n_steps
    pos = jnp.concatenate([x0[:3], jnp.zeros(4, dtype=x0.dtype)])
    if spec.mode == 1:   # back stance -> hind foothold in slots 2,3
        hip = K.hip_position(pos, 1)
        return jnp.stack(
            [jnp.zeros((), x0.dtype), jnp.zeros((), x0.dtype),
             hip[0] + vel_cmd * stance_time / 2, jnp.asarray(ground_height, x0.dtype)]
        )
    if spec.mode == 3:   # front stance -> front foothold in slots 0,1
        hip = K.hip_position(pos, 0)
        return jnp.stack(
            [hip[0] + vel_cmd * stance_time / 2, jnp.asarray(ground_height, x0.dtype),
             jnp.zeros((), x0.dtype), jnp.zeros((), x0.dtype)]
        )
    return jnp.zeros(4, dtype=x0.dtype)


def _step_fn(spec: PhaseSpec):
    """(x, u, foothold) -> (x_next, y) for this phase's model/mode."""
    if spec.model == "wb":
        return lambda x, u, fh: Q.wb_step(x, u, spec.mode, spec.dt)
    contact = FB.CONTACT_TABLE[spec.mode - 1]

    def fb(x, u, fh):
        xdot = FB.fb_continuous_dynamics(x, u, fh, contact.astype(x.dtype))
        return x + xdot * spec.dt, jnp.zeros(4, dtype=x.dtype)

    return fb


def _terminal_constraint(spec: PhaseSpec, ground_height):
    if spec.model == "wb" and spec.mode in (2, 4):
        return lambda x: Q.touchdown_constraint(x, spec.mode, ground_height)[None]
    return lambda x: jnp.zeros(0, dtype=x.dtype)


def make_phase(spec: PhaseSpec, vel_cmd: float, ground_height: float):
    """Build the jittable per-phase functions for a static PhaseSpec."""
    q_w, r_w, s_w, qf_w = (jnp.asarray(w) for w in C.weights(spec.model, spec.mode))
    dt = spec.dt
    n = spec.n_steps
    step = _step_fn(spec)
    tconstr = _terminal_constraint(spec, ground_height)
    has_al = spec.model == "wb" and spec.mode in (2, 4)
    if spec.model == "wb":
        lc = CONSTR.wb_path_constraints(spec.mode)
        Cx, Cu, Cy, cb = (jnp.asarray(a) for a in lc)
        has_reb = True
    else:
        has_reb = False

    # ------------------------------------------------------------ rollout
    def rollout(x0, nom_x, nom_u, ctg, eps, ref, alreb, reb_on):
        """forward_sweep_dynamics_only: control update + rollout + cost."""
        foothold = _plan_foothold(x0, spec, vel_cmd, ground_height)

        def body(x, inp):
            nx, nu, ddu, Kk, rx, ru, ry = inp
            u = nu + eps * ddu + Kk @ (x - nx)        # SinglePhase.cpp:76
            x_next, y = step(x, u, foothold)
            l = C.running_cost(x, u, y, rx, ru, ry, q_w, r_w, s_w, dt)
            if has_reb:
                g = Cx @ x + Cu @ u + Cy @ y + cb
                B, _, _ = CONSTR.reduced_barrier(g, alreb.delta)
                l = l + reb_on * jnp.sum(alreb.eps_reb * B) * dt
            return x_next, (x, u, y, l)

        inputs = (nom_x[:-1], nom_u[:-1], ctg.du[:-1], ctg.Kfb[:-1],
                  ref.x[:-1], ref.u[:-1], ref.y[:-1])
        x_last, (xs, us, ys, ls) = jax.lax.scan(body, x0, inputs)
        xs = jnp.concatenate([xs, x_last[None]], axis=0)
        us = jnp.concatenate([us, jnp.zeros((1, 4), dtype=us.dtype)], axis=0)
        ys = jnp.concatenate([ys, jnp.zeros((1, 4), dtype=ys.dtype)], axis=0)
        V = jnp.sum(ls)
        phi = C.terminal_cost(x_last, ref.x[-1], qf_w)
        h = tconstr(x_last)
        if has_al:
            # AL penalty: Phi += 50((sigma h/2)^2 + lambda h) (SinglePhase.cpp:267)
            phi = phi + 50.0 * jnp.sum((alreb.sigma * h / 2.0) ** 2 + alreb.lam * h)
        return PhaseTraj(x=xs, u=us, y=ys, V=V + phi, h=h)

    # ---------------------------------------------------------- linearize
    def linearize(traj: PhaseTraj, ref, alreb, reb_on, include_al_grad):
        """forward_sweep_partials_only at the trajectory's states."""
        foothold = _plan_foothold(traj.x[0], spec, vel_cmd, ground_height)

        def dyn_jac(x, u):
            f = lambda xx, uu: step(xx, uu, foothold)
            (A_, Cy_) = jax.jacfwd(lambda xx: f(xx, u))(x)
            (B_, D_) = jax.jacfwd(lambda uu: f(x, uu))(u)
            return A_, B_, Cy_, D_

        def body(x, u, y, rx, ru, ry):
            A, B, Cm, D = dyn_jac(x, u)
            lx, lu, ly = C.running_cost_grads(x, u, y, rx, ru, ry, q_w, r_w, s_w, dt)
            lxx = jnp.diag(2.0 * dt * q_w)
            luu = jnp.diag(2.0 * dt * r_w)
            lyy = jnp.diag(2.0 * dt * s_w)
            if has_reb:
                g = Cx @ x + Cu @ u + Cy @ y + cb
                _, Bz, Bzz = CONSTR.reduced_barrier(g, alreb.delta)
                w1 = reb_on * alreb.eps_reb * Bz * dt
                w2 = reb_on * alreb.eps_reb * Bzz * dt
                lx = lx + Cx.T @ w1
                lu = lu + Cu.T @ w1
                ly = ly + Cy.T @ w1
                lxx = lxx + Cx.T @ (w2[:, None] * Cx)
                luu = luu + Cu.T @ (w2[:, None] * Cu)
                lyy = lyy + Cy.T @ (w2[:, None] * Cy)
            return A, B, Cm, D, lx, lu, ly, lxx, luu, lyy

        A, B, Cm, D, lx, lu, ly, lxx, luu, lyy = jax.vmap(body)(
            traj.x[:-1], traj.u[:-1], traj.y[:-1],
            ref.x[:-1], ref.u[:-1], ref.y[:-1],
        )
        phix = C.terminal_cost_grads(traj.x[-1], ref.x[-1], qf_w)
        phixx = jnp.diag(qf_w)
        if has_al:
            def tc_jac(x):
                f = lambda xx: tconstr(xx)[0]
                return tconstr(x)[0], jax.grad(f)(x), jax.hessian(f)(x)

            h, hx, hxx = tc_jac(traj.x[-1])
            s_, lam = alreb.sigma, alreb.lam[0]
            # SinglePhase.cpp:271-272 (only when the calc flag permits)
            phix_al = phix + 50.0 * (s_ * s_ / 2.0 * hx * h + lam * hx)
            phixx_al = phixx + 50.0 * (
                s_ * s_ / 2.0 * (jnp.outer(hx, hx) + h * hxx) + lam * hxx
            )
            phix = jnp.where(include_al_grad, phix_al, phix)
            phixx = jnp.where(include_al_grad, phixx_al, phixx)
        return PhaseLin(A, B, Cm, D, lx, lu, ly, lxx, luu, lyy, phix, phixx)

    # ----------------------------------------------------------- backward
    def backward(lin: PhaseLin, Gnext, Hnext, dVnext, reg):
        """backward_sweep: returns (success, dV_total, PhaseCTG, G0, H0)."""
        xs = spec.xsize
        GN = lin.phix + Gnext
        HN = lin.phixx + Hnext
        eye_x = jnp.eye(xs, dtype=GN.dtype)
        eye_u = jnp.eye(4, dtype=GN.dtype)

        def body(carry, inp):
            G1, H1, dV, ok = carry
            A, B, Cm, D, lx, lu, ly, lxx, luu, lyy = inp
            # Q expansion (MHPC_CompoundTypes.h:117-126)
            Qx = lx + A.T @ G1 + Cm.T @ ly
            Qu = lu + B.T @ G1 + D.T @ ly
            Qxx = lxx + Cm.T @ lyy @ Cm + A.T @ H1 @ A
            Quu = luu + D.T @ lyy @ D + B.T @ H1 @ B
            Qux = D.T @ lyy @ Cm + B.T @ H1 @ A     # lux == 0 (CostBase.cpp:32)
            # regularization (SinglePhase.cpp:199-200)
            Qxx = Qxx + eye_x * reg
            Quu = Quu + eye_u * reg
            # PSD check on Quu - 1e-9 I (SinglePhase.cpp:202-209)
            ok_k = LA.is_pd_chol(Quu, shift=1e-9)
            # gains & value update (MHPC_CompoundTypes.h:128-144); inv4 is the
            # same cofactor expansion Eigen uses for fixed-size 4x4 inverse()
            Quu_raw_inv = LA.inv4(Quu)
            Quu_inv = (Quu_raw_inv + Quu_raw_inv.T) / 2.0
            Qxx = (Qxx + Qxx.T) / 2.0
            du = -Quu_inv @ Qu
            Kk = -Quu_inv @ Qux
            G = Qx - Qux.T @ Quu_inv @ Qu
            H = Qxx - Qux.T @ Quu_inv @ Qux
            dV_k = -Qu @ (Quu_raw_inv @ Qu)
            return (G, H, dV + dV_k, ok & ok_k), (du, Kk, G)

        inputs = (lin.A, lin.B, lin.Cm, lin.D, lin.lx, lin.lu, lin.ly,
                  lin.lxx, lin.luu, lin.lyy)
        (G0, H0, dV, ok), (dus, Ks, Gs) = jax.lax.scan(
            body, (GN, HN, dVnext, jnp.asarray(True)), inputs, reverse=True
        )
        zero_u = jnp.zeros((1, 4), dtype=GN.dtype)
        ctg = PhaseCTG(
            du=jnp.concatenate([dus, zero_u], axis=0),
            Kfb=jnp.concatenate([Ks, jnp.zeros((1, 4, xs), dtype=GN.dtype)], axis=0),
            G=jnp.concatenate([Gs, GN[None]], axis=0),
        )
        return ok, dV, ctg, G0, H0

    # -------------------------------------------------- phase transitions
    def transition_state(x_end):
        """resetmap at end of phase (MultiPhaseDDP.cpp:350-379)."""
        if spec.model == "fb":
            return x_end
        return Q.resetmap(x_end, spec.mode)[0]

    def transition_jac(x_end):
        if spec.model == "fb":
            return jnp.eye(6, dtype=x_end.dtype)
        return Q.resetmap_jac(x_end, spec.mode)

    return dict(
        spec=spec,
        rollout=rollout,
        linearize=linearize,
        backward=backward,
        transition_state=transition_state,
        transition_jac=transition_jac,
        has_al=has_al,
        has_reb=has_reb,
    )
