#!/usr/bin/env python3
"""Spike: parallel-in-time (associative-scan) Riccati vs sequential scan.

The backward value recursion is inherently sequential in time (720 steps
for the default problem; `wb_only_extended` stresses it with 10 DDP
iterations x 3 AL).  Each step is a linear-fractional (Moebius) map on
the value Hessian

    H_k = Q_k + A_k^T H_{k+1} (I + Phi_k H_{k+1})^-1 A_k,
    Phi_k = B_k R_k^-1 B_k^T,

and Moebius maps compose associatively: in the graph representation
H = Y X^-1 the step acts linearly on [X; Y] via the 2n x 2n generator

    M_k = [[A_k^-1,       A_k^-1 Phi_k        ],
           [Q_k A_k^-1,   Q_k A_k^-1 Phi_k + A_k^T]],

so `lax.associative_scan` over matrix PRODUCTS evaluates every suffix
composition in O(log T) depth; H_k is recovered by applying the suffix
composite to (X, Y) = (I, H_T).

This spike measures that reformulation on the QUADRATIC LQR core (n=14,
m=4; affine terms / output channels / seams extend the generator by one
column+row and don't change the scaling), and checks its numerics
against the sequential recursion.  Known caveat, measured here: raw
28 x 28 products accumulate the symplectic blow-up, so f32 needs the
solve-stabilized combine (Saerkkae & Garcia-Fernandez 2020) — the f64
error quantifies the headroom.

Run:  python tools/assoc_riccati_spike.py [B] [T] [f32|f64]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    T = int(sys.argv[2]) if len(sys.argv) > 2 else 720
    want64 = len(sys.argv) > 3 and sys.argv[3] == "f64"

    import jax

    jax.config.update("jax_enable_x64", True)
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    on_cpu = jax.devices()[0].platform == "cpu"
    cache = os.path.join(root, ".jax_cache" if on_cpu else ".jax_cache_tpu")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    dtype = jnp.float64 if want64 else jnp.float32
    n, m = 14, 4
    print(f"device={jax.devices()[0]} B={B} T={T} n={n} m={m} "
          f"dtype={dtype.__name__}", flush=True)

    import jax.random as jr

    k1, k2, k3 = jr.split(jr.key(0), 3)
    A = jnp.eye(n, dtype=dtype) + 0.003 * jr.normal(k1, (B, T, n, n), dtype)
    Bm = 0.01 * jr.normal(k2, (B, T, n, m), dtype)
    Qr = 0.03 * jr.normal(k3, (B, T, n, n), dtype)
    Q = jnp.einsum("btij,btkj->btik", Qr, Qr) + 1e-4 * jnp.eye(n, dtype=dtype)
    Rinv = jnp.eye(m, dtype=dtype) / 5e-3  # R = 5e-3 I
    Phi = jnp.einsum("btim,mk,btjk->btij", Bm, Rinv, Bm)
    HT = jnp.eye(n, dtype=dtype)
    eye = jnp.eye(n, dtype=dtype)

    def seq_backward(A, Phi, Q):
        # scan over TIME with the batch inside the carry
        sw = lambda x: jnp.swapaxes(x, -1, -2)

        def body(H, inp):
            Ak, Pk, Qk = inp  # (B, n, n)
            S = sw(jnp.linalg.solve(sw(eye + Pk @ H), sw(H)))
            Hk = Qk + sw(Ak) @ (S @ Ak)
            Hk = 0.5 * (Hk + sw(Hk))
            return Hk, Hk

        H0 = jnp.broadcast_to(HT, (A.shape[0], n, n))
        _, Hs = jax.lax.scan(
            body, H0,
            (jnp.moveaxis(A, 1, 0), jnp.moveaxis(Phi, 1, 0),
             jnp.moveaxis(Q, 1, 0)),
            reverse=True)
        return jnp.moveaxis(Hs, 0, 1)  # (B, T, n, n)

    def assoc_backward(A, Phi, Q):
        Ainv = jnp.linalg.inv(A)
        QAinv = Q @ Ainv
        AT = jnp.swapaxes(A, -1, -2)
        # generator blocks -> one (B, T, 2n, 2n) array
        top = jnp.concatenate([Ainv, Ainv @ Phi], axis=-1)
        bot = jnp.concatenate([QAinv, QAinv @ Phi + AT], axis=-1)
        M = jnp.concatenate([top, bot], axis=-2)
        # suffix composition: comp[k] = M_k @ M_{k+1} @ ... @ M_{T-1}.
        # reverse=True flips the operand order (the left argument is the
        # LATER time index), so the combine must multiply right-to-left.
        comp = jax.lax.associative_scan(
            lambda x, y: y @ x, M, axis=1, reverse=True)
        P, Qb = comp[..., :n, :n], comp[..., :n, n:]
        R, S = comp[..., n:, :n], comp[..., n:, n:]
        X = P + Qb @ HT
        Y = R + S @ HT
        Hs = jnp.linalg.solve(jnp.swapaxes(X, -1, -2), jnp.swapaxes(Y, -1, -2))
        Hs = jnp.swapaxes(Hs, -1, -2)
        return 0.5 * (Hs + jnp.swapaxes(Hs, -1, -2))

    seq_j = jax.jit(seq_backward)
    asc_j = jax.jit(assoc_backward)

    t0 = time.time()
    Hs = jax.block_until_ready(seq_j(A, Phi, Q))
    print(f"sequential compile+run {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    Ha = jax.block_until_ready(asc_j(A, Phi, Q))
    print(f"assoc      compile+run {time.time()-t0:.1f}s", flush=True)

    err = float(jnp.max(jnp.abs(Hs - Ha)) / jnp.max(jnp.abs(Hs)))
    print(f"max rel |H_seq - H_assoc| = {err:.3e}", flush=True)

    for name, fn in (("sequential", seq_j), ("assoc", asc_j)):
        ts = []
        for _ in range(5):
            t0 = time.time()
            jax.block_until_ready(fn(A, Phi, Q))
            ts.append(time.time() - t0)
        print(f"{name:10s} best {min(ts)*1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
