#!/usr/bin/env python3
"""Generate closed-form planar-quadruped model terms with sympy.

Produces mhpc_minimal_env_tpu/models/sym_dynamics.py: straight-line,
CSE-compressed jnp code for

  model_terms(q, qd)     -> (M, c, J, Jd)           [rollout hot path]
  model_terms_lin(q, qd) -> (M, c, J, Jd, dM, dcq, dcqd, dJ, dgq)
                                                    [linearizer hot path]

This is the same move the reference makes with CasADi (116 kLoC of
generated C in CasadiGen/source/Dyn_*.c): the rigid-body model terms are
symbolic trig polynomials, and evaluating the pre-differentiated,
common-subexpression-eliminated closed form is several times cheaper than
re-deriving them through AD (jacfwd of link kinematics + nested
jvp/grad) at every gridpoint of every rollout step.  Derived HERE from
the repo's own Lagrangian formulation (models/kinematics.py geometry +
models/params.py identified inertial parameters) — nothing is copied
from the reference's generated code; equivalence to the AD path is
asserted to roundoff by tests/test_dynamics.py.

Conventions match models/quadruped.py exactly:
  M     = sum_i m Jo^T Jo + Jo^T dRc Jw + (.)^T + io Jw^T Jw
  c     = Mdot qd - 1/2 d/dq(qd^T M qd) + dPE/dq      (bias)
  J     (4,7) stacked (front, hind) foot Jacobian; Jd its time derivative
  dM    (7,7,7) with dM[i,j,k] = dM_ij/dq_k
  dcq   (7,7) dc/dq;  dcqd (7,7) dc/dqd
  dJ    (4,7,7) dJ_ij/dq_k;  dgq (4,7) d(Jd qd)/dq
"""
import os
import sys

import sympy as sp

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from mhpc_minimal_env_tpu.models.kinematics import (  # noqa: E402
    BODY_LENGTH, HIP_LINK_LENGTH, KNEE_LINK_LENGTH, HIP_LOC_X,
)
from mhpc_minimal_env_tpu.models.params import GRAVITY, PI_STANDARD  # noqa


def rotv(theta, v):
    c, s = sp.cos(theta), sp.sin(theta)
    return sp.Matrix([c * v[0] + s * v[1], -s * v[0] + c * v[1]])


def build():
    q = sp.Matrix(sp.symbols("q0:7", real=True))
    dq = sp.Matrix(sp.symbols("dq0:7", real=True))

    x, z, pitch = q[0], q[1], q[2]
    th_b = pitch
    th_fh = pitch + q[3]
    th_fk = th_fh + q[4]
    th_hh = pitch + q[5]
    th_hk = th_hh + q[6]

    p_body = sp.Matrix([x, z])
    p_fhip = p_body + rotv(th_b, [HIP_LOC_X, 0.0])
    p_hhip = p_body + rotv(th_b, [-HIP_LOC_X, 0.0])
    p_fknee = p_fhip + rotv(th_fh, [0.0, -HIP_LINK_LENGTH])
    p_hknee = p_hhip + rotv(th_hh, [0.0, -HIP_LINK_LENGTH])
    p_ffoot = p_fknee + rotv(th_fk, [0.0, -KNEE_LINK_LENGTH])
    p_hfoot = p_hknee + rotv(th_hk, [0.0, -KNEE_LINK_LENGTH])

    # link frames in the PI_STANDARD row order: body, F_hip, F_knee,
    # H_hip, H_knee (quadruped._link_origin_angle takes frames[:5])
    origins = [p_body, p_fhip, p_fknee, p_hhip, p_hknee]
    angles = [th_b, th_fh, th_fk, th_hh, th_hk]

    PI = [[float(v) for v in row] for row in PI_STANDARD]

    M = sp.zeros(7, 7)
    PE = sp.S(0)
    for i in range(5):
        m, mcx, mcz, io = PI[i]
        Jo = origins[i].jacobian(q)                      # (2,7)
        Jw = sp.Matrix([[sp.diff(angles[i], qk) for qk in q]])  # (1,7)
        c_, s_ = sp.cos(angles[i]), sp.sin(angles[i])
        dRc = sp.Matrix([-s_ * mcx + c_ * mcz, -c_ * mcx - s_ * mcz])  # (2,)
        M += m * (Jo.T * Jo)
        X = Jo.T * dRc * Jw                              # (7,7)
        M += X + X.T
        M += io * (Jw.T * Jw)
        PE += GRAVITY * (m * origins[i][1] + (-s_ * mcx + c_ * mcz))
    M = sp.expand(M)

    gvec = sp.Matrix([sp.diff(PE, qk) for qk in q])
    Mdot = sum((sp.diff(M, q[k]) * dq[k] for k in range(7)), sp.zeros(7, 7))
    quad = (dq.T * M * dq)[0]
    cvec = Mdot * dq - sp.Rational(1, 2) * sp.Matrix(
        [sp.diff(quad, qk) for qk in q]) + gvec
    cvec = sp.expand(cvec)

    feet = sp.Matrix([p_ffoot[0], p_ffoot[1], p_hfoot[0], p_hfoot[1]])
    Jmat = feet.jacobian(q)                              # (4,7)
    Jd = sum((sp.diff(Jmat, q[k]) * dq[k] for k in range(7)),
             sp.zeros(4, 7))
    gamma = Jd * dq                                      # (4,)

    dM = [sp.expand(sp.diff(M, q[k])) for k in range(7)]     # k-list of 7x7
    dcq = sp.expand(cvec.jacobian(q))
    dcqd = sp.expand(cvec.jacobian(dq))
    dJ = [sp.diff(Jmat, q[k]) for k in range(7)]             # k-list of 4x7
    dgq = gamma.jacobian(q)

    return dict(M=M, c=cvec, J=Jmat, Jd=Jd, dM=dM, dcq=dcq, dcqd=dcqd,
                dJ=dJ, dgq=dgq)


def _pyexpr(e, wrap_const):
    s = sp.pycode(e)
    s = s.replace("math.sin", "jnp.sin").replace("math.cos", "jnp.cos")
    s = s.replace("math.pi", "3.141592653589793")
    if wrap_const and not e.free_symbols:
        # constants must be (B,)-shaped under vmap: broadcast via _one
        return f"({s})*_one"
    return s


def emit_function(name, outputs, f):
    """outputs: list of (varname, matrix-or-list-of-matrices, kind)."""
    exprs, layout = [], []
    for vname, obj, kind in outputs:
        if kind == "mat":
            r, cdim = obj.shape
            idx = [(i, j) for i in range(r) for j in range(cdim)]
            layout.append((vname, "mat", (r, cdim)))
            exprs.extend(obj[i, j] for i, j in idx)
        elif kind == "tens":  # list over k of (r,c) -> (r,c,K)
            K = len(obj)
            r, cdim = obj[0].shape
            layout.append((vname, "tens", (r, cdim, K)))
            exprs.extend(obj[k][i, j] for i in range(r)
                         for j in range(cdim) for k in range(K))
        else:  # vec
            n = obj.shape[0]
            layout.append((vname, "vec", (n,)))
            exprs.extend(obj[i] for i in range(n))

    repl, reduced = sp.cse(exprs, symbols=sp.numbered_symbols("_t"),
                           order="none")
    f.write(f"\n\ndef {name}(q, qd):\n")
    f.write('    """Generated by tools/symgen_dynamics.py — do not edit.'
            '"""\n')
    for i in range(7):
        f.write(f"    q{i} = q[{i}]\n")
    for i in range(7):
        f.write(f"    dq{i} = qd[{i}]\n")
    f.write("    _one = jnp.ones_like(q0)\n")
    for sym, e in repl:
        f.write(f"    {sym} = {_pyexpr(e, False)}\n")

    pos = 0
    ret = []
    for vname, kind, shape in layout:
        if kind == "mat":
            r, cdim = shape
            rows = []
            for i in range(r):
                row = ", ".join(
                    _pyexpr(reduced[pos + i * cdim + j], True)
                    for j in range(cdim))
                rows.append(f"jnp.stack([{row}])")
            f.write(f"    {vname} = jnp.stack([\n        "
                    + ",\n        ".join(rows) + "])\n")
            pos += r * cdim
        elif kind == "tens":
            r, cdim, K = shape
            rows = []
            for i in range(r):
                cols = []
                for j in range(cdim):
                    ks = ", ".join(_pyexpr(reduced[pos], True)
                                   for pos in range(pos, pos + K))
                    pos += K
                    cols.append(f"jnp.stack([{ks}])")
                rows.append("jnp.stack([" + ", ".join(cols) + "])")
            f.write(f"    {vname} = jnp.stack([\n        "
                    + ",\n        ".join(rows) + "])\n")
        else:
            n = shape[0]
            row = ", ".join(_pyexpr(reduced[pos + i], True)
                            for i in range(n))
            f.write(f"    {vname} = jnp.stack([{row}])\n")
            pos += n
        ret.append(vname)
    f.write(f"    return {', '.join(ret)}\n")


def main():
    print("[symgen] building symbolic model...", flush=True)
    m = build()
    out_path = os.path.join(ROOT, "mhpc_minimal_env_tpu", "models",
                            "sym_dynamics.py")
    with open(out_path, "w") as f:
        f.write('"""Closed-form planar-quadruped model terms — GENERATED '
                'by tools/symgen_dynamics.py.\n\nThe TPU-native analog of '
                'the reference\'s CasADi-generated kernels\n'
                '(CasadiGen/source/Dyn_BS.c etc.), re-derived '
                'symbolically from this\nrepo\'s own Lagrangian model '
                '(models/kinematics.py, models/params.py).\nSee the '
                'generator for the derivation; equivalence to the AD '
                'path is\nasserted by tests/test_dynamics.py.  '
                'Straight-line scalar code: vmaps\nover a trailing batch '
                'axis and contains no dot_general (f64-safe on\nTPU, '
                'ops/linalg.py).\n"""\n')
        f.write("import jax.numpy as jnp\n")
        print("[symgen] emitting model_terms...", flush=True)
        emit_function("model_terms", [
            ("M", m["M"], "mat"), ("c", m["c"], "vec"),
            ("J", m["J"], "mat"), ("Jd", m["Jd"], "mat"),
        ], f)
        print("[symgen] emitting model_terms_lin...", flush=True)
        emit_function("model_terms_lin", [
            ("M", m["M"], "mat"), ("c", m["c"], "vec"),
            ("J", m["J"], "mat"), ("Jd", m["Jd"], "mat"),
            ("dM", m["dM"], "tens"), ("dcq", m["dcq"], "mat"),
            ("dcqd", m["dcqd"], "mat"), ("dJ", m["dJ"], "tens"),
            ("dgq", m["dgq"], "mat"),
        ], f)
    n = sum(1 for _ in open(out_path))
    print(f"[symgen] wrote {out_path}: {n} lines", flush=True)


if __name__ == "__main__":
    main()
