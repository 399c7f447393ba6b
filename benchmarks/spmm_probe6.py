"""Probe 6: where does the interleaved block-CG iteration time go?

probe5 measured the resident interleaved SpMM at 1.7 ms (k=4, 10M rows)
but the block-CG iteration at ~480 ms.  This times each panel-algebra
component as a jitted fori_loop chain in the interleaved layout.

Usage: python benchmarks/spmm_probe6.py [--nx 216] [--k 4]
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
    ap.add_argument("--k", type=int, default=4)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax

    print("devices:", jax.devices(), flush=True)

    from bench import laplacian_3d_dia, timeit_loop
    from sigma_tpu import DIAMatrix
    from sigma_tpu.graph.graph import DIAGraph
    from sigma_tpu.ops.spmv_pallas import interleave_panels

    nx, s = args.nx, args.k
    n, offsets, data, nnz = laplacian_3d_dia(nx)
    g = DIAGraph(offsets=offsets, shape=(n, n), nnz=nnz)
    A = DIAMatrix(graph=g, data=jnp.asarray(data.reshape(7, -1, 128)))
    Sy = -(-n // 128)
    rng = np.random.default_rng(0)
    P = interleave_panels(
        jnp.asarray(rng.standard_normal((s, n)).astype(np.float32)), n
    )
    Q = interleave_panels(
        jnp.asarray(rng.standard_normal((s, n)).astype(np.float32)), n
    )
    C0 = jnp.asarray(rng.standard_normal((s, s)).astype(np.float32)) * 0.01

    def gram(Xp, Yp):
        return jnp.einsum(
            "ral,rbl->ab", Xp.reshape(Sy, s, 128), Yp.reshape(Sy, s, 128)
        )

    def comb(Xp, C):
        return jnp.einsum(
            "ral,ab->rbl", Xp.reshape(Sy, s, 128), C.astype(Xp.dtype)
        ).reshape(Sy * s, 128)

    def chain(step):
        # A is a pytree ARGUMENT (closing over it bakes the 322 MB data
        # array into the HLO as a constant — the remote compile service
        # rejects the request body)
        @jax.jit
        def many(A, P, Q, K):
            def body(i, carry):
                return step(A, carry, Q)

            return lax.fori_loop(0, K, body, P)

        def make(K):
            Kj = jnp.asarray(K, jnp.int32)
            return lambda A, PQ: many(A, PQ[0], PQ[1], Kj)

        return make

    rows = [
        (
            "spmm (reference)",
            chain(lambda A, P, Q: A.matmat_interleaved(P) * 0.1),
        ),
        (
            "gram+feedback",
            chain(lambda A, P, Q: P * (1.0 + 1e-12 * gram(P, Q)[0, 0])),
        ),
        ("comb", chain(lambda A, P, Q: comb(P, C0 * 0.01) + Q * 0.1)),
        (
            "axpy (scale ref)",
            chain(lambda A, P, Q: P * 0.999 + Q * 1e-6),
        ),
        (
            "norm+feedback",
            chain(lambda A, P, Q: P * (1.0 + 1e-12 * jnp.linalg.norm(P))),
        ),
        (
            "cholesky+trisolve",
            chain(
                lambda A, P, Q: P
                * (
                    1.0
                    + 1e-12
                    * jax.scipy.linalg.solve_triangular(
                        jnp.linalg.cholesky(
                            gram(P, P) + jnp.eye(s, dtype=P.dtype)
                        ),
                        jnp.eye(s, dtype=P.dtype),
                        lower=True,
                    )[0, 0]
                )
            ),
        ),
        (
            "linalg.solve",
            chain(
                lambda A, P, Q: P
                * (
                    1.0
                    + 1e-12
                    * jnp.linalg.solve(
                        gram(P, P) + jnp.eye(s, dtype=P.dtype),
                        jnp.eye(s, dtype=P.dtype),
                    )[0, 0]
                )
            ),
        ),
    ]
    for name, make in rows:
        t = timeit_loop(make, A, (P, Q), reps=3, K1=10, K2=50)
        print(f"{name:20s} {t*1e3:9.3f} ms/step", flush=True)


if __name__ == "__main__":
    main()
