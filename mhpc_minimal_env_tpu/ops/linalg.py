"""Small-matrix linear algebra as pure arithmetic (no lax.linalg).

Why: TPU XLA implements LU/Cholesky/eig only for f32, but the solver's
fidelity envelope (<=1e-3 control deviation vs the f64 Eigen reference,
BASELINE.md) requires f64.  These routines unroll tiny factorizations
(n <= 16) into scalar arithmetic that lowers on TPU in any dtype, vmaps
cleanly over batch lanes, and fuses into surrounding computation.

Also: `inv4` uses the cofactor expansion like Eigen's fixed-size 4x4
`inverse()` (the reference's Quu path, MHPC_CompoundTypes.h:133), keeping us
structurally closer to the reference than LAPACK LU.
"""
from __future__ import annotations

import jax.numpy as jnp


import jax


# --------------------------------------------------------------------------
# dot-free small matmuls.
#
# XLA-TPU emulates float64 `dot_general` (the MXU is f32/bf16 only), and the
# emulation pass exhibits pathological COMPILE times when a graph contains
# many small f64 dots: measured in this environment, a single jitted 7x7
# mass matrix with two tiny f64 einsums takes 97 s to compile vs 1.6 s in
# f32 and 4.2 s with the dots spelled as broadcast-multiply-reduce (the
# round-1 bench never finished compiling for exactly this reason —
# VERDICT.md round 1, BENCH_r01.json rc=124).  For the <=16-wide matrices
# in this framework the MXU is irrelevant in f64 anyway, so in f64 we lower
# every contraction to explicit multiply+sum; in f32 and below we keep real
# dots so XLA can use the MXU for the large batched cases.
# --------------------------------------------------------------------------

def _nodot(dtype) -> bool:
    return dtype == jnp.float64


def mm(a, b):
    """a @ b for (..., m, k) x (..., k, n) without f64 dot_general."""
    if _nodot(a.dtype):
        return (a[..., :, :, None] * b[..., None, :, :]).sum(-2)
    return a @ b


def mv(a, v):
    """a @ v for (..., m, k) x (..., k) without f64 dot_general."""
    if _nodot(a.dtype):
        return (a * v[..., None, :]).sum(-1)
    return a @ v


def vdot(u, v):
    """u . v along the last axis without f64 dot_general."""
    return (u * v).sum(-1)


def outer(u, v):
    """Outer product (..., m) x (..., n) -> (..., m, n) (never a dot)."""
    return u[..., :, None] * v[..., None, :]


def quad_form(v, M, w):
    """v^T M w along trailing axes without f64 dot_general."""
    return (v[..., :, None] * M * w[..., None, :]).sum((-1, -2))


def cholesky_unrolled(A):
    """Lower Cholesky of a static-size SPD matrix, unrolled in column-vector
    form (O(n) XLA ops per column, not O(n^2) scalars — keeps the HLO small,
    which matters enormously for TPU compile times).

    Returns L with A = L L^T.  For non-PD input some diagonal sqrt arguments
    go negative -> NaN, which callers use as the PSD test (matching the
    reference's LDLT isPositive gate, SinglePhase.cpp:202-209).
    """
    n = A.shape[-1]
    cols = []  # each (..., n): column j of L, zero above diagonal
    for j in range(n):
        # a_j = A[:, j] minus contributions of previous columns
        v = A[..., :, j]
        for k in range(j):
            v = v - cols[k] * cols[k][..., j : j + 1]
        d = jnp.sqrt(v[..., j])
        col = v / d[..., None]
        # zero out the strictly-upper part of this column
        mask = jnp.arange(n) >= j
        cols.append(jnp.where(mask, col, jnp.zeros_like(col)))
    return jnp.stack(cols, axis=-1)


def solve_tril(L, b, lower=True):
    """Triangular solve, unrolled row-vector form; b is (..., n) or (..., n, m)."""
    n = L.shape[-1]
    vec = b.ndim == L.ndim - 1
    if vec:
        b = b[..., None]
    x = [None] * n
    rng = range(n) if lower else range(n - 1, -1, -1)
    for i in rng:
        s = b[..., i, :]
        if lower:
            for k in range(i):
                s = s - L[..., i, k, None] * x[k]
        else:
            for k in range(i + 1, n):
                s = s - L[..., i, k, None] * x[k]
        x[i] = s / L[..., i, i, None]
    out = jnp.stack(x, axis=-2)
    return out[..., 0] if vec else out


@jax.custom_jvp
def cho_solve(L, b):
    """Solve A x = b given lower Cholesky L (A = L L^T)."""
    y = solve_tril(L, b, lower=True)
    return solve_tril(jnp.swapaxes(L, -1, -2), y, lower=False)


@cho_solve.defjvp
def _cho_solve_jvp(primals, tangents):
    # d x = A^-1 (db - (dL L^T + L dL^T) x); reuses the factorization so
    # jacfwd of the dynamics costs one factorization + batched solves.
    L, b = primals
    dL, db = tangents
    x = cho_solve(L, b)
    Lt = jnp.swapaxes(L, -1, -2)
    dLt = jnp.swapaxes(dL, -1, -2)
    if x.ndim == L.ndim - 1:
        dA_x = mv(dL, mv(Lt, x)) + mv(L, mv(dLt, x))
        dx = cho_solve(L, db - dA_x)
    else:
        dA_x = mm(dL, mm(Lt, x)) + mm(L, mm(dLt, x))
        dx = cho_solve(L, db - dA_x)
    return x, dx


@jax.custom_jvp
def spd_solve(A, b):
    """Solve SPD system via unrolled Cholesky."""
    return cho_solve(cholesky_unrolled(A), b)


@spd_solve.defjvp
def _spd_solve_jvp(primals, tangents):
    # dx = A^-1 (db - dA x): one factorization shared by all tangents.
    A, b = primals
    dA, db = tangents
    L = cholesky_unrolled(A)
    x = cho_solve(L, b)
    if x.ndim == A.ndim - 1:
        rhs = db - mv(dA, x)
    else:
        rhs = db - mm(dA, x)
    return x, cho_solve(L, rhs)


def inv4(A):
    """4x4 inverse by cofactor expansion (Eigen's fixed-size `inverse()`).

    Mirrors Eigen/src/LU/InverseImpl.h's compute_inverse_size4 structure:
    2x2-minor based cofactors / determinant.
    """
    a = A
    # 2x2 sub-determinants of rows (0,1) and (2,3)
    s0 = a[..., 0, 0] * a[..., 1, 1] - a[..., 1, 0] * a[..., 0, 1]
    s1 = a[..., 0, 0] * a[..., 1, 2] - a[..., 1, 0] * a[..., 0, 2]
    s2 = a[..., 0, 0] * a[..., 1, 3] - a[..., 1, 0] * a[..., 0, 3]
    s3 = a[..., 0, 1] * a[..., 1, 2] - a[..., 1, 1] * a[..., 0, 2]
    s4 = a[..., 0, 1] * a[..., 1, 3] - a[..., 1, 1] * a[..., 0, 3]
    s5 = a[..., 0, 2] * a[..., 1, 3] - a[..., 1, 2] * a[..., 0, 3]
    c5 = a[..., 2, 2] * a[..., 3, 3] - a[..., 3, 2] * a[..., 2, 3]
    c4 = a[..., 2, 1] * a[..., 3, 3] - a[..., 3, 1] * a[..., 2, 3]
    c3 = a[..., 2, 1] * a[..., 3, 2] - a[..., 3, 1] * a[..., 2, 2]
    c2 = a[..., 2, 0] * a[..., 3, 3] - a[..., 3, 0] * a[..., 2, 3]
    c1 = a[..., 2, 0] * a[..., 3, 2] - a[..., 3, 0] * a[..., 2, 2]
    c0 = a[..., 2, 0] * a[..., 3, 1] - a[..., 3, 0] * a[..., 2, 1]
    det = s0 * c5 - s1 * c4 + s2 * c3 + s3 * c2 - s4 * c1 + s5 * c0
    invdet = 1.0 / det

    b00 = a[..., 1, 1] * c5 - a[..., 1, 2] * c4 + a[..., 1, 3] * c3
    b01 = -a[..., 0, 1] * c5 + a[..., 0, 2] * c4 - a[..., 0, 3] * c3
    b02 = a[..., 3, 1] * s5 - a[..., 3, 2] * s4 + a[..., 3, 3] * s3
    b03 = -a[..., 2, 1] * s5 + a[..., 2, 2] * s4 - a[..., 2, 3] * s3

    b10 = -a[..., 1, 0] * c5 + a[..., 1, 2] * c2 - a[..., 1, 3] * c1
    b11 = a[..., 0, 0] * c5 - a[..., 0, 2] * c2 + a[..., 0, 3] * c1
    b12 = -a[..., 3, 0] * s5 + a[..., 3, 2] * s2 - a[..., 3, 3] * s1
    b13 = a[..., 2, 0] * s5 - a[..., 2, 2] * s2 + a[..., 2, 3] * s1

    b20 = a[..., 1, 0] * c4 - a[..., 1, 1] * c2 + a[..., 1, 3] * c0
    b21 = -a[..., 0, 0] * c4 + a[..., 0, 1] * c2 - a[..., 0, 3] * c0
    b22 = a[..., 3, 0] * s4 - a[..., 3, 1] * s2 + a[..., 3, 3] * s0
    b23 = -a[..., 2, 0] * s4 + a[..., 2, 1] * s2 - a[..., 2, 3] * s0

    b30 = -a[..., 1, 0] * c3 + a[..., 1, 1] * c1 - a[..., 1, 2] * c0
    b31 = a[..., 0, 0] * c3 - a[..., 0, 1] * c1 + a[..., 0, 2] * c0
    b32 = -a[..., 3, 0] * s3 + a[..., 3, 1] * s1 - a[..., 3, 2] * s0
    b33 = a[..., 2, 0] * s3 - a[..., 2, 1] * s1 + a[..., 2, 2] * s0

    rows = [
        jnp.stack([b00, b01, b02, b03], axis=-1),
        jnp.stack([b10, b11, b12, b13], axis=-1),
        jnp.stack([b20, b21, b22, b23], axis=-1),
        jnp.stack([b30, b31, b32, b33], axis=-1),
    ]
    return jnp.stack(rows, axis=-2) * invdet[..., None, None]


def is_pd_chol(A, shift=0.0):
    """PSD gate: Cholesky of (A - shift I) succeeds (all finite)."""
    n = A.shape[-1]
    L = cholesky_unrolled(A - shift * jnp.eye(n, dtype=A.dtype))
    return jnp.all(jnp.isfinite(L), axis=(-1, -2))


# --------------------------------------------------------------------------
# channel-last small linear algebra: shapes (rows, cols, B) with the BATCH
# on the minor axis.
#
# Why: XLA-TPU tiles the two minor dims to (8, 128) sublanes x lanes.  With
# batch-major (B, 14, 14) arrays the 14x14 face pads to 16x128 — a measured
# 10-32x memory expansion (and the same factor in wasted bandwidth) that
# OOMs the B=1024 backward sweep and dominates its runtime.  Putting B on
# the lane axis makes every (r, c, B) array tile exactly ((r*c) sublanes x
# B lanes), ~1.1x padding.  The multiply pairings and reduction axes below
# mirror the batch-major f64 paths above so CPU f64 results stay
# bit-comparable.
# --------------------------------------------------------------------------

def mm_cl(X, Y):
    """X @ Y: (i, k, B) x (k, j, B) -> (i, j, B)."""
    return (X[:, :, None, :] * Y[None, :, :, :]).sum(1)


def mtm_cl(X, Y):
    """X^T @ Y: (k, i, B) x (k, j, B) -> (i, j, B)."""
    return (X[:, :, None, :] * Y[:, None, :, :]).sum(0)


def mv_cl(X, v):
    """X @ v: (i, k, B) x (k, B) -> (i, B)."""
    return (X * v[None, :, :]).sum(1)


def mtv_cl(X, v):
    """X^T @ v: (k, i, B) x (k, B) -> (i, B)."""
    return (X * v[:, None, :]).sum(0)


def vdot_cl(u, v):
    """u . v along the leading axis: (k, B) x (k, B) -> (B,)."""
    return (u * v).sum(0)


def sym_cl(M):
    """(M + M^T)/2 on (n, n, B)."""
    return 0.5 * (M + jnp.swapaxes(M, 0, 1))


def inv4_cl(a):
    """4x4 inverse by cofactor expansion on (4, 4, B) (same minor structure
    as `inv4` / Eigen's fixed-size inverse, MHPC_CompoundTypes.h:133)."""
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
    invdet = 1.0 / det
    b00 = a[1, 1] * c5 - a[1, 2] * c4 + a[1, 3] * c3
    b01 = -a[0, 1] * c5 + a[0, 2] * c4 - a[0, 3] * c3
    b02 = a[3, 1] * s5 - a[3, 2] * s4 + a[3, 3] * s3
    b03 = -a[2, 1] * s5 + a[2, 2] * s4 - a[2, 3] * s3
    b10 = -a[1, 0] * c5 + a[1, 2] * c2 - a[1, 3] * c1
    b11 = a[0, 0] * c5 - a[0, 2] * c2 + a[0, 3] * c1
    b12 = -a[3, 0] * s5 + a[3, 2] * s2 - a[3, 3] * s1
    b13 = a[2, 0] * s5 - a[2, 2] * s2 + a[2, 3] * s1
    b20 = a[1, 0] * c4 - a[1, 1] * c2 + a[1, 3] * c0
    b21 = -a[0, 0] * c4 + a[0, 1] * c2 - a[0, 3] * c0
    b22 = a[3, 0] * s4 - a[3, 1] * s2 + a[3, 3] * s0
    b23 = -a[2, 0] * s4 + a[2, 1] * s2 - a[2, 3] * s0
    b30 = -a[1, 0] * c3 + a[1, 1] * c1 - a[1, 2] * c0
    b31 = a[0, 0] * c3 - a[0, 1] * c1 + a[0, 2] * c0
    b32 = -a[3, 0] * s3 + a[3, 1] * s1 - a[3, 2] * s0
    b33 = a[2, 0] * s3 - a[2, 1] * s1 + a[2, 2] * s0
    rows = [
        jnp.stack([b00, b01, b02, b03], axis=0),
        jnp.stack([b10, b11, b12, b13], axis=0),
        jnp.stack([b20, b21, b22, b23], axis=0),
        jnp.stack([b30, b31, b32, b33], axis=0),
    ]
    return jnp.stack(rows, axis=0) * invdet[None, None, :]


def is_pd_chol_cl(A, shift=0.0):
    """PSD gate on (n, n, B): Cholesky of (A - shift I) all-finite, same
    unrolled column algorithm (and NaN semantics) as `is_pd_chol`."""
    n = A.shape[0]
    eye = jnp.eye(n, dtype=A.dtype)[:, :, None]
    M = A - shift * eye
    cols = []  # each (n, B)
    finite = None
    for j in range(n):
        v = M[:, j, :]
        for k in range(j):
            v = v - cols[k] * cols[k][j : j + 1, :]
        d = jnp.sqrt(v[j, :])
        col = v / d[None, :]
        mask = (jnp.arange(n) >= j)[:, None]
        col = jnp.where(mask, col, jnp.zeros_like(col))
        cols.append(col)
        ok_j = jnp.all(jnp.isfinite(col), axis=0)
        finite = ok_j if finite is None else (finite & ok_j)
    return finite
