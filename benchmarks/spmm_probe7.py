"""Probe 7: why is the block-CG call 30x slower than its parts?

probe6: SpMM 1.6 ms + Gram/comb/cholesky all <1.2 ms => ~15 ms/iter
expected; probe5 measured ~480 ms/iter through the eager
`block_cg_solve` call.  This times the SAME solve with the whole call
jitted (A as a pytree argument, fixed iteration count) vs the eager
form, for both panel layouts.

Usage: python benchmarks/spmm_probe7.py [--nx 216] [--k 4] [--iters 18]
"""

import argparse
import functools
import os
import sys
import time

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
)

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nx", type=int, default=216)
    ap.add_argument("--k", type=int, default=4)
    ap.add_argument("--iters", type=int, default=18)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    print("devices:", jax.devices(), flush=True)

    from bench import laplacian_3d_dia
    from sigma_tpu import DIAMatrix
    from sigma_tpu.graph.graph import DIAGraph
    from sigma_tpu.solvers import block_cg_solve

    nx, k = args.nx, args.k
    n, offsets, data, nnz = laplacian_3d_dia(nx)
    g = DIAGraph(offsets=offsets, shape=(n, n), nnz=nnz)
    A = DIAMatrix(graph=g, data=jnp.asarray(data.reshape(7, -1, 128)))
    rng = np.random.default_rng(0)
    B = A.matmat(jnp.asarray(rng.standard_normal((n, k)).astype(np.float32)))

    for panels in ("interleaved", "cols"):
        solve = jax.jit(
            functools.partial(
                block_cg_solve,
                tol=0.0,
                rtol=0.0,
                maxiter=args.iters,
                panels=panels,
            )
        )
        X, info = solve(A, B)
        r = float(info.residual_norm)  # sync
        t0 = time.perf_counter()
        X, info = solve(A, B)
        r = float(info.residual_norm)
        t = time.perf_counter() - t0
        print(
            f"jitted  [{panels:11s}] iters={int(info.iterations)} "
            f"res={r:.3e} warm={t:.3f}s  ({t/args.iters*1e3:.1f} ms/iter)",
            flush=True,
        )

    for panels in ("interleaved",):
        X, info = block_cg_solve(
            A, B, tol=0.0, rtol=0.0, maxiter=args.iters, panels=panels
        )
        r = float(info.residual_norm)
        t0 = time.perf_counter()
        X, info = block_cg_solve(
            A, B, tol=0.0, rtol=0.0, maxiter=args.iters, panels=panels
        )
        r = float(info.residual_norm)
        t = time.perf_counter() - t0
        print(
            f"eager   [{panels:11s}] iters={int(info.iterations)} "
            f"res={r:.3e} warm={t:.3f}s",
            flush=True,
        )


if __name__ == "__main__":
    main()
