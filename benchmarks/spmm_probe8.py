"""Probe 8: interleaved panel-algebra formulations (Gram / combination).

probe6/7: the jitted block-CG iteration is panel-algebra bound (~1 ms
per Gram/combination op vs 1.6 ms SpMM at k=4).  The einsum forms
reshape to (Sy, k, 128) — a second-minor dim of k (<8) that XLA pads to
the (8, 128) tile, costing relayouts.  Candidates that stay in native
2-D layouts:

  gram:  G[a,b] = sum_{s,l} X[s,a,l] Y[s,b,l]
    A. einsum('sal,sbl->ab') on (Sy,k,128) views        [shipped]
    B. free view (Sy, k*128): Z = X2.T @ Y2 (k*128 x k*128 MXU GEMM),
       then G[a,b] = trace of the (128,128) diagonal block — compute
       ~128x the needed work, but on the MXU with zero relayout
  comb:  C[s,b,l] = sum_a X[s,a,l] W[a,b]
    A. einsum('sal,ab->sbl')                            [shipped]
    B. X2 @ kron(W, I_128): one (Sy,k*128)x(k*128,k*128) MXU GEMM

Usage: python benchmarks/spmm_probe8.py [--nx 216] [--k 8]

MEASURED (one session, nx=216, k=8): comb einsum 1.96 ms vs MXU-kron
2.56 ms — the GEMM form's 128x redundant FLOPs scale with k^2 and lose
from k=8 up; the shipped einsum forms stand.  (The gram chain's
scalar-feedback loop was hoisted by XLA — gram rows read 0 ms and are
not valid; comb carries the panel through the loop and is.)
"""

import argparse
import os
import sys

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
)

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nx", type=int, default=216)
    ap.add_argument("--k", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax

    print("devices:", jax.devices(), flush=True)

    from bench import laplacian_3d_dia, timeit_loop

    nx, k = args.nx, args.k
    n = nx**3
    Sy = n // 128
    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.standard_normal((Sy * k, 128)).astype(np.float32))
    Y = jnp.asarray(rng.standard_normal((Sy * k, 128)).astype(np.float32))
    W = jnp.asarray(rng.standard_normal((k, k)).astype(np.float32)) * 0.01

    def gram_a(Xp, Yp):
        return jnp.einsum(
            "sal,sbl->ab", Xp.reshape(Sy, k, 128), Yp.reshape(Sy, k, 128)
        )

    def gram_b(Xp, Yp):
        Z = Xp.reshape(Sy, k * 128).T @ Yp.reshape(Sy, k * 128)
        # block trace: G[a,b] = sum_l Z[a*128+l, b*128+l]
        Z4 = Z.reshape(k, 128, k, 128)
        return jnp.einsum("albl->ab", Z4)

    def comb_a(Xp, C):
        return jnp.einsum(
            "sal,ab->sbl", Xp.reshape(Sy, k, 128), C
        ).reshape(Sy * k, 128)

    def comb_b(Xp, C):
        Wk = jnp.kron(C, jnp.eye(128, dtype=C.dtype))
        return (Xp.reshape(Sy, k * 128) @ Wk).reshape(Sy * k, 128)

    # correctness cross-checks
    ga = gram_a(X, Y)
    gb = gram_b(X, Y)
    print(
        "gram B vs A rel err:",
        float(jnp.max(jnp.abs(ga - gb)) / jnp.max(jnp.abs(ga))),
        flush=True,
    )
    ca = comb_a(X, W)
    cb = comb_b(X, W)
    print(
        "comb B vs A rel err:",
        float(jnp.max(jnp.abs(ca - cb)) / jnp.max(jnp.abs(ca))),
        flush=True,
    )

    def chain_gram(g):
        @jax.jit
        def many(X, Y, K):
            def body(i, c):
                return c * (1.0 + 1e-12 * g(X, Y)[0, 0])

            return lax.fori_loop(0, K, body, jnp.float32(1.0))

        def make(K):
            Kj = jnp.asarray(K, jnp.int32)
            return lambda X, Y: many(X, Y, Kj)

        return make

    def chain_comb(c):
        @jax.jit
        def many(X, W, K):
            def body(i, v):
                return c(v, W) * jnp.float32(0.999)

            return lax.fori_loop(0, K, body, X)

        def make(K):
            Kj = jnp.asarray(K, jnp.int32)
            return lambda X, W: many(X, W, Kj)

        return make

    for name, make, a, b in (
        ("gram einsum (A)", chain_gram(gram_a), X, Y),
        ("gram MXU GEMM (B)", chain_gram(gram_b), X, Y),
        ("comb einsum (A)", chain_comb(comb_a), X, W),
        ("comb MXU kron (B)", chain_comb(comb_b), X, W),
    ):
        t = timeit_loop(make, a, b, reps=3, K1=20, K2=100)
        print(f"{name:20s} {t*1e3:8.3f} ms/op", flush=True)


if __name__ == "__main__":
    main()
