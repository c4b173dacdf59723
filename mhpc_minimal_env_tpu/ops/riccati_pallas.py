"""Fused Pallas TPU kernel for the batched Riccati backward sweep.

The HSDDP backward pass (fused.py `backward`, mirroring the reference's
SinglePhase::backward_sweep + MHPC_CompoundTypes.h:117-144) is a strictly
sequential recursion over T gridpoints of tiny (14x14 / 4x14 / 4x4) matrix
algebra.  Under XLA this lowers to a `lax.scan` whose per-step body is a
chain of small batched dots with HBM round-trips between them; at batch
sizes of interest the sweep is launch- and bandwidth-bound, not
compute-bound.

This kernel runs the whole recursion for a contiguous phase segment inside
ONE `pallas_call`:

  - batch lanes live on the minor (lane) dimension: every array is
    (..., rows, cols, B_tile) so each 14x14 matrix op is a short unrolled
    sequence of VPU ops over B_tile lanes;
  - the value-function carry (G: (14,B), H: (14,14,B)) stays resident in
    VMEM scratch across the whole segment — zero HBM traffic for the
    recursion state;
  - per-step linearization data streams HBM->VMEM through the Pallas grid
    pipeline (double-buffered automatically), iterated in reverse time via
    the BlockSpec index_map;
  - the PSD gate (reference SinglePhase.cpp:202-209) is an in-kernel
    unrolled 4x4 LDL pivot-positivity test, accumulated per lane.

Phase seams (terminal-cost injection and the impact-aware handoff
G <- Px^T G, H <- Px^T H Px of MultiPhaseDDP.cpp:299-341) are applied
between segment calls in plain XLA — they touch 8 gridpoints total and
don't merit kernel residency.

float32 only: TPU Pallas (Mosaic) has no f64.  This is the throughput
(«production MPC») path; the f64 XLA engine remains the golden-fidelity
path (see README «Fidelity»).
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

XDIM, UDIM = 14, 4


# --------------------------------------------------------------------------
# channel-last small linear algebra (shapes (..., r, c, B) with B minor)
# --------------------------------------------------------------------------

def _mtm(X, Y):
    """X^T @ Y: X (K,I,B), Y (K,J,B) -> (I,J,B)."""
    K = X.shape[0]
    acc = X[0][:, None, :] * Y[0][None, :, :]
    for k in range(1, K):
        acc = acc + X[k][:, None, :] * Y[k][None, :, :]
    return acc


def _mm(X, Y):
    """X @ Y: X (I,K,B), Y (K,J,B) -> (I,J,B)."""
    K = Y.shape[0]
    acc = X[:, 0, None, :] * Y[0][None, :, :]
    for k in range(1, K):
        acc = acc + X[:, k, None, :] * Y[k][None, :, :]
    return acc


def _mtv(X, v):
    """X^T @ v: X (K,I,B), v (K,B) -> (I,B)."""
    K = X.shape[0]
    acc = X[0] * v[0][None, :]
    for k in range(1, K):
        acc = acc + X[k] * v[k][None, :]
    return acc


def _mv(X, v):
    """X @ v: X (I,K,B), v (K,B) -> (I,B)."""
    K = v.shape[0]
    acc = X[:, 0, :] * v[0][None, :]
    for k in range(1, K):
        acc = acc + X[:, k, :] * v[k][None, :]
    return acc


def _sym(M):
    """(M + M^T)/2 on (n,n,B)."""
    return 0.5 * (M + jnp.swapaxes(M, 0, 1))


def _inv4_cl(a):
    """4x4 inverse by cofactor expansion, channel-last (4,4,B).

    Same 2x2-minor structure as ops/linalg.py `inv4` (Eigen fixed-size
    inverse, the reference's Quu path MHPC_CompoundTypes.h:133)."""
    s0 = a[0, 0] * a[1, 1] - a[1, 0] * a[0, 1]
    s1 = a[0, 0] * a[1, 2] - a[1, 0] * a[0, 2]
    s2 = a[0, 0] * a[1, 3] - a[1, 0] * a[0, 3]
    s3 = a[0, 1] * a[1, 2] - a[1, 1] * a[0, 2]
    s4 = a[0, 1] * a[1, 3] - a[1, 1] * a[0, 3]
    s5 = a[0, 2] * a[1, 3] - a[1, 2] * a[0, 3]
    c5 = a[2, 2] * a[3, 3] - a[3, 2] * a[2, 3]
    c4 = a[2, 1] * a[3, 3] - a[3, 1] * a[2, 3]
    c3 = a[2, 1] * a[3, 2] - a[3, 1] * a[2, 2]
    c2 = a[2, 0] * a[3, 3] - a[3, 0] * a[2, 3]
    c1 = a[2, 0] * a[3, 2] - a[3, 0] * a[2, 2]
    c0 = a[2, 0] * a[3, 1] - a[3, 0] * a[2, 1]
    det = s0 * c5 - s1 * c4 + s2 * c3 + s3 * c2 - s4 * c1 + s5 * c0
    inv_det = 1.0 / det
    b00 = (a[1, 1] * c5 - a[1, 2] * c4 + a[1, 3] * c3) * inv_det
    b01 = (-a[0, 1] * c5 + a[0, 2] * c4 - a[0, 3] * c3) * inv_det
    b02 = (a[3, 1] * s5 - a[3, 2] * s4 + a[3, 3] * s3) * inv_det
    b03 = (-a[2, 1] * s5 + a[2, 2] * s4 - a[2, 3] * s3) * inv_det
    b10 = (-a[1, 0] * c5 + a[1, 2] * c2 - a[1, 3] * c1) * inv_det
    b11 = (a[0, 0] * c5 - a[0, 2] * c2 + a[0, 3] * c1) * inv_det
    b12 = (-a[3, 0] * s5 + a[3, 2] * s2 - a[3, 3] * s1) * inv_det
    b13 = (a[2, 0] * s5 - a[2, 2] * s2 + a[2, 3] * s1) * inv_det
    b20 = (a[1, 0] * c4 - a[1, 1] * c2 + a[1, 3] * c0) * inv_det
    b21 = (-a[0, 0] * c4 + a[0, 1] * c2 - a[0, 3] * c0) * inv_det
    b22 = (a[3, 0] * s4 - a[3, 1] * s2 + a[3, 3] * s0) * inv_det
    b23 = (-a[2, 0] * s4 + a[2, 1] * s2 - a[2, 3] * s0) * inv_det
    b30 = (-a[1, 0] * c3 + a[1, 1] * c1 - a[1, 2] * c0) * inv_det
    b31 = (a[0, 0] * c3 - a[0, 1] * c1 + a[0, 2] * c0) * inv_det
    b32 = (-a[3, 0] * s3 + a[3, 1] * s1 - a[3, 2] * s0) * inv_det
    b33 = (a[2, 0] * s3 - a[2, 1] * s1 + a[2, 2] * s0) * inv_det
    rows = [
        jnp.stack([b00, b01, b02, b03]),
        jnp.stack([b10, b11, b12, b13]),
        jnp.stack([b20, b21, b22, b23]),
        jnp.stack([b30, b31, b32, b33]),
    ]
    return jnp.stack(rows)


def _pd_gate4(Q, shift):
    """Positivity of all LDL pivots of (Q - shift I): the reference's LDLT
    isPositive gate, sqrt-free.  Q: (4,4,B) -> (B,) float 1/0."""
    eps = jnp.asarray(1e-30, Q.dtype)
    d0 = Q[0, 0] - shift
    ok = d0 > 0
    l10 = Q[1, 0] / jnp.where(ok, d0, eps)
    l20 = Q[2, 0] / jnp.where(ok, d0, eps)
    l30 = Q[3, 0] / jnp.where(ok, d0, eps)
    d1 = Q[1, 1] - shift - l10 * l10 * d0
    ok = ok & (d1 > 0)
    l21 = (Q[2, 1] - l20 * l10 * d0) / jnp.where(ok, d1, eps)
    l31 = (Q[3, 1] - l30 * l10 * d0) / jnp.where(ok, d1, eps)
    d2 = Q[2, 2] - shift - l20 * l20 * d0 - l21 * l21 * d1
    ok = ok & (d2 > 0)
    l32 = (Q[3, 2] - l30 * l20 * d0 - l31 * l21 * d1) / jnp.where(ok, d2, eps)
    d3 = Q[3, 3] - shift - l30 * l30 * d0 - l31 * l31 * d1 - l32 * l32 * d2
    ok = ok & (d3 > 0)
    return ok.astype(Q.dtype)


# --------------------------------------------------------------------------
# the segment kernel
# --------------------------------------------------------------------------

def _riccati_step(A, Bm, Cm, D, lx, lu, ly, lxx, luu, lyy, G1, H1, reg):
    """One Riccati recursion step on (r,c,B)-shaped tiles.

    Exactly the update of fused.py `backward.body` / the reference's
    compute_Qfunction + valuefunction_update (MHPC_CompoundTypes.h:117-144).
    """
    dtype = G1.dtype
    lyC = _mm(lyy, Cm)                      # (4,14,B)
    HA = _mm(H1, A)                         # (14,14,B)
    HB = _mm(H1, Bm)                        # (14,4,B)
    Qx = lx + _mtv(A, G1) + _mtv(Cm, ly)
    Qu = lu + _mtv(Bm, G1) + _mtv(D, ly)
    Qxx = lxx + _mtm(Cm, lyC) + _mtm(A, HA)
    Quu = luu + _mtm(D, _mm(lyy, D)) + _mtm(Bm, HB)
    Qux = _mtm(D, lyC) + _mtm(Bm, HA)       # (4,14,B)

    eye_x = jnp.eye(XDIM, dtype=dtype)[:, :, None]
    eye_u = jnp.eye(UDIM, dtype=dtype)[:, :, None]
    Qxx = Qxx + eye_x * reg[None, None, :]
    Quu = Quu + eye_u * reg[None, None, :]

    ok_k = _pd_gate4(Quu, jnp.asarray(1e-9, dtype))
    Quu_raw_inv = _inv4_cl(Quu)
    Quu_inv = _sym(Quu_raw_inv)
    Qxx = _sym(Qxx)
    du = -_mv(Quu_inv, Qu)                  # (4,B)
    Kk = -_mm(Quu_inv, Qux)                 # (4,14,B)
    QuxT_Quu_inv = _mtm(Qux, Quu_inv)       # (14,4,B)
    G_new = Qx - _mv(QuxT_Quu_inv, Qu)
    H_new = Qxx - _mm(QuxT_Quu_inv, Qux)
    dV_k = -jnp.sum(Qu * _mv(Quu_raw_inv, Qu), axis=0)
    return du, Kk, G_new, H_new, ok_k, dV_k


def _segment_kernel(n_steps, A_ref, Bm_ref, Cm_ref, D_ref, lx_ref, lu_ref,
                    ly_ref, lxx_ref, luu_ref, lyy_ref, G0_ref, H0_ref,
                    reg_ref, du_ref, K_ref, Gs_ref, Gc_ref, Hc_ref, ok_ref,
                    dV_ref, G_sc, H_sc, ok_sc, dV_sc):
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _init():
        G_sc[...] = G0_ref[...]
        H_sc[...] = H0_ref[...]
        ok_sc[...] = jnp.ones_like(ok_sc)
        dV_sc[...] = jnp.zeros_like(dV_sc)

    du, Kk, G_new, H_new, ok_k, dV_k = _riccati_step(
        A_ref[0], Bm_ref[0], Cm_ref[0], D_ref[0], lx_ref[0], lu_ref[0],
        ly_ref[0], lxx_ref[0], luu_ref[0], lyy_ref[0],
        G_sc[...], H_sc[...], reg_ref[0],
    )
    du_ref[0] = du
    K_ref[0] = Kk
    Gs_ref[0] = G_new
    G_sc[...] = G_new
    H_sc[...] = H_new
    ok_sc[...] = ok_sc[...] * ok_k[None, :]
    dV_sc[...] = dV_sc[...] + dV_k[None, :]

    @pl.when(t == n_steps - 1)
    def _finish():
        Gc_ref[...] = G_new
        Hc_ref[...] = H_new
        ok_ref[...] = ok_sc[...]
        dV_ref[...] = dV_sc[...]


@functools.partial(jax.jit, static_argnames=("b_tile", "interpret"))
def riccati_segment(A, Bm, Cm, D, lx, lu, ly, lxx, luu, lyy, G0, H0, reg,
                    b_tile: int = 512, interpret: bool = False):
    """Run N Riccati steps in reverse time over a phase segment.

    Args (all float32, batch minor):
      A (N,14,14,B), Bm (N,14,4,B), Cm (N,4,14,B), D (N,4,4,B),
      lx (N,14,B), lu (N,4,B), ly (N,4,B),
      lxx (N,14,14,B), luu (N,4,4,B), lyy (N,4,4,B),
      G0 (14,B), H0 (14,14,B)  — value-function carry entering the segment
      reg (B,) — per-lane regularization
    Returns:
      du (N,4,B), K (N,4,14,B), Gs (N,14,B) — per-gridpoint results
      Gc (14,B), Hc (14,14,B) — carry after the earliest step
      ok (B,) float 1/0 — all-steps PSD gate
      dV (B,) — expected cost decrease accumulator
    The recursion runs t = N-1 .. 0 (reverse time), i.e. step N-1 consumes
    (G0, H0) and step 0 produces (Gc, Hc).
    """
    N, _, _, B = A.shape
    if interpret:
        bt = B  # no physical lane constraint in interpreter mode
    else:
        assert B % 128 == 0, f"batch {B} must be a multiple of 128"
        bt = min(b_tile, B)
        while B % bt:
            bt //= 2
    n_btiles = B // bt
    dtype = A.dtype
    reg2 = reg.reshape(1, B)

    def stream(spec_rc):
        # block = one reverse-time step, one batch tile
        return pl.BlockSpec(
            (1,) + spec_rc + (bt,),
            lambda b, t, _rc=spec_rc: (N - 1 - t,) + (0,) * len(_rc) + (b,),
            memory_space=pltpu.VMEM,
        )

    def fixed(spec_rc):
        return pl.BlockSpec(
            spec_rc + (bt,),
            lambda b, t, _rc=spec_rc: (0,) * len(_rc) + (b,),
            memory_space=pltpu.VMEM,
        )

    grid = (n_btiles, N)
    out_shape = (
        jax.ShapeDtypeStruct((N, UDIM, B), dtype),          # du
        jax.ShapeDtypeStruct((N, UDIM, XDIM, B), dtype),    # K
        jax.ShapeDtypeStruct((N, XDIM, B), dtype),          # Gs
        jax.ShapeDtypeStruct((XDIM, B), dtype),             # Gc
        jax.ShapeDtypeStruct((XDIM, XDIM, B), dtype),       # Hc
        jax.ShapeDtypeStruct((1, B), dtype),                # ok
        jax.ShapeDtypeStruct((1, B), dtype),                # dV
    )
    out_specs = (
        stream((UDIM,)),
        stream((UDIM, XDIM)),
        stream((XDIM,)),
        fixed((XDIM,)),
        fixed((XDIM, XDIM)),
        pl.BlockSpec((1, bt), lambda b, t: (0, b), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, bt), lambda b, t: (0, b), memory_space=pltpu.VMEM),
    )
    in_specs = [
        stream((XDIM, XDIM)),   # A
        stream((XDIM, UDIM)),   # Bm
        stream((UDIM, XDIM)),   # Cm
        stream((UDIM, UDIM)),   # D
        stream((XDIM,)),        # lx
        stream((UDIM,)),        # lu
        stream((UDIM,)),        # ly
        stream((XDIM, XDIM)),   # lxx
        stream((UDIM, UDIM)),   # luu
        stream((UDIM, UDIM)),   # lyy
        fixed((XDIM,)),         # G0
        fixed((XDIM, XDIM)),    # H0
        pl.BlockSpec((1, bt), lambda b, t: (0, b), memory_space=pltpu.VMEM),
    ]
    scratch = [
        pltpu.VMEM((XDIM, bt), dtype),
        pltpu.VMEM((XDIM, XDIM, bt), dtype),
        pltpu.VMEM((1, bt), dtype),
        pltpu.VMEM((1, bt), dtype),
    ]
    kernel = functools.partial(_segment_kernel, N)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(A, Bm, Cm, D, lx, lu, ly, lxx, luu, lyy, G0, H0, reg2)


# --------------------------------------------------------------------------
# multi-phase glue: full backward sweep = segments + XLA seam transforms
# --------------------------------------------------------------------------

class SegmentPlan(NamedTuple):
    start_idx: tuple      # python ints, per phase
    term_idx: tuple
    T: int


def segment_plan_of(plan) -> SegmentPlan:
    """Extract static per-phase gridpoint ranges from a FusedPlan."""
    return SegmentPlan(
        start_idx=tuple(int(i) for i in np.asarray(plan.start_idx)),
        term_idx=tuple(int(i) for i in np.asarray(plan.term_idx)),
        T=int(np.asarray(plan.is_dyn).shape[0]),
    )


def backward_batched_pallas(seg: SegmentPlan, lin_b, reg_b,
                            b_tile: int = 512, interpret: bool = False):
    """Full impact-aware backward sweep over a batch, Pallas segments.

    lin_b: FusedLin with batched leaves (B, T, ...) (as produced by
    vmap(linearize)); reg_b: (B,).  Returns (ok (B,) bool, dV (B,),
    FusedCTG with (B, T, ...) leaves) — same contract as
    vmap(fused.backward) modulo f32 vs the engine dtype.
    """
    P = len(seg.start_idx)
    T = seg.T
    B = lin_b.A.shape[0]
    f32 = jnp.float32

    def ll(x):  # (B, T, ...) -> (T, ..., B), f32
        return jnp.moveaxis(x, 0, -1).astype(f32)

    A, Bm, Cm, D = ll(lin_b.A), ll(lin_b.Bm), ll(lin_b.Cm), ll(lin_b.D)
    lx, lu, ly = ll(lin_b.lx), ll(lin_b.lu), ll(lin_b.ly)
    lxx, luu, lyy = ll(lin_b.lxx), ll(lin_b.luu), ll(lin_b.lyy)
    phix, phixx, Px = ll(lin_b.phix), ll(lin_b.phixx), ll(lin_b.Px)
    reg = reg_b.astype(f32)

    G = jnp.zeros((XDIM, B), f32)
    H = jnp.zeros((XDIM, XDIM, B), f32)
    ok = jnp.ones((B,), f32)
    dV = jnp.zeros((B,), f32)
    du_out = jnp.zeros((T, UDIM, B), f32)
    K_out = jnp.zeros((T, UDIM, XDIM, B), f32)
    G_out = jnp.zeros((T, XDIM, B), f32)

    for p in reversed(range(P)):
        t0, t1 = seg.start_idx[p], seg.term_idx[p]
        # terminal gridpoint: inject terminal cost (fused.py backward.body
        # `is_term` branch); stored G at the terminal is the post-injection
        # carry, du/K stay zero there.
        G = phix[t1] + G
        H = phixx[t1] + H
        G_out = G_out.at[t1].set(G)
        n_dyn = t1 - t0
        if n_dyn > 0:
            sl = slice(t0, t1)
            du_s, K_s, G_s, G, H, ok_p, dV_p = riccati_segment(
                A[sl], Bm[sl], Cm[sl], D[sl], lx[sl], lu[sl], ly[sl],
                lxx[sl], luu[sl], lyy[sl], G, H, reg,
                b_tile=b_tile, interpret=interpret,
            )
            du_out = du_out.at[sl].set(du_s)
            K_out = K_out.at[sl].set(K_s)
            G_out = G_out.at[sl].set(G_s)
            ok = ok * ok_p[0]
            dV = dV + dV_p[0]
        if p > 0:
            # impact-aware seam (MultiPhaseDDP.cpp:299-341): carry transforms
            # by the stored (projection-composed) reset Jacobian at this
            # phase's start gridpoint.
            Pxp = Px[t0]  # (14,14,B)
            G = jnp.einsum("kiB,kB->iB", Pxp, G)
            H = jnp.einsum("kiB,klB,ljB->ijB", Pxp, H, Pxp)

    def bl(x):  # (T, ..., B) -> (B, T, ...)
        return jnp.moveaxis(x, -1, 0)

    from ..solver.fused import FusedCTG

    ctg = FusedCTG(du=bl(du_out), Kfb=bl(K_out), G=bl(G_out))
    return ok > 0.5, dV, ctg
