"""Probe 5: production interleaved SpMM dispatch on the real chip.

End-to-end check of the shipped paths (`DIAMatrix.matmat_interleaved`,
`SymmetricDIAMatrix.matmat_interleaved`, and `block_cg_solve`'s resident
interleaved panels) at the 10M-row north star.  Operators are built
directly in DIA layout (no COO sort) so the run is timing-dominated.

Usage: python benchmarks/spmm_probe5.py [--nx 216] [--ks 4,8]
"""

import argparse
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
    ap.add_argument("--ks", type=str, default="4,8")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax

    print("devices:", jax.devices(), flush=True)

    from bench import laplacian_3d_dia, timeit_loop
    from sigma_tpu import DIAMatrix
    from sigma_tpu.graph.graph import DIAGraph
    from sigma_tpu.matrix.symmetric import SymmetricDIAMatrix
    from sigma_tpu.ops.spmv_pallas import interleave_panels

    nx = args.nx
    n, offsets, data, nnz = laplacian_3d_dia(nx)
    g = DIAGraph(offsets=offsets, shape=(n, n), nnz=nnz)
    A = DIAMatrix(graph=g, data=jnp.asarray(data.reshape(7, -1, 128)))
    keep = [d for d, o in enumerate(offsets) if o >= 0]
    A_sym = SymmetricDIAMatrix(
        data=jnp.asarray(data[keep].reshape(len(keep), -1, 128)),
        offsets=tuple(offsets[d] for d in keep),
        n=n,
    )
    rng = np.random.default_rng(0)

    def resident_chain(mat, k):
        XI = interleave_panels(
            jnp.asarray(rng.standard_normal((k, n)).astype(np.float32)), n
        )

        @jax.jit
        def many(mat, XI, K):
            def body(i, V):
                return mat.matmat_interleaved(V) * jnp.asarray(0.1, V.dtype)

            return lax.fori_loop(0, K, body, XI)

        def make(K):
            Kj = jnp.asarray(K, jnp.int32)
            return lambda mat, _: many(mat, XI, Kj)

        return make

    for k in [int(s) for s in args.ks.split(",")]:
        for name, mat in (("full", A), ("sym ", A_sym)):
            assert mat.interleaved_profitable(k), (name, k)
            s = []
            t = timeit_loop(
                resident_chain(mat, k), mat, None, reps=5, K1=20, K2=100,
                samples=s,
            )
            print(
                f"{name} interleaved k={k}   {t*1e3:8.3f} ms  "
                f"{k*nnz/t/1e9:7.1f} G-eff  {t/k*1e3:6.3f} ms/RHS  "
                f"spread {[round(k*nnz/x/1e9,1) for x in s]}",
                flush=True,
            )

    # spmv scale reference
    x0 = jnp.asarray(rng.standard_normal(n).astype(np.float32))

    @jax.jit
    def spmv_many(A, x, K):
        def body(i, v):
            return A.matvec(v) * jnp.asarray(0.1, v.dtype)

        return lax.fori_loop(0, K, body, x)

    for name, mat in (("full", A), ("sym ", A_sym)):
        def mk(K, mat=mat):
            Kj = jnp.asarray(K, jnp.int32)
            return lambda m_, _: spmv_many(m_, x0, Kj)

        t = timeit_loop(mk, mat, None, reps=3, K1=20, K2=100)
        print(
            f"{name} spmv              {t*1e3:8.3f} ms  "
            f"{nnz/t/1e9:7.1f} Gnnz/s",
            flush=True,
        )

    # block CG end-to-end: auto panels must pick interleaved on TPU
    from sigma_tpu.solvers import block_cg_solve

    k = 4
    B = A.matmat(
        jnp.asarray(rng.standard_normal((n, k)).astype(np.float32))
    )
    t0 = time.perf_counter()
    X, info = block_cg_solve(A, B, tol=0.0, rtol=1e-5, maxiter=30)
    resn = float(info.residual_norm)
    t_cold = time.perf_counter() - t0
    t0 = time.perf_counter()
    X, info = block_cg_solve(A, B, tol=0.0, rtol=1e-5, maxiter=30)
    resn = float(info.residual_norm)
    t_warm = time.perf_counter() - t0
    print(
        f"block CG k=4 (auto)   iters={int(info.iterations)} "
        f"res={resn:.3e} cold={t_cold:.2f}s warm={t_warm:.2f}s",
        flush=True,
    )
    t0 = time.perf_counter()
    Xc, ic = block_cg_solve(A, B, tol=0.0, rtol=1e-5, maxiter=30, panels="cols")
    rc = float(ic.residual_norm)
    _ = time.perf_counter() - t0
    t0 = time.perf_counter()
    Xc, ic = block_cg_solve(A, B, tol=0.0, rtol=1e-5, maxiter=30, panels="cols")
    rc = float(ic.residual_norm)
    tc_warm = time.perf_counter() - t0
    print(
        f"block CG k=4 (cols)   iters={int(ic.iterations)} "
        f"res={rc:.3e} warm={tc_warm:.2f}s",
        flush=True,
    )
    err = float(jnp.max(jnp.abs(X - Xc)) / jnp.max(jnp.abs(Xc)))
    print(f"interleaved vs cols solution rel err: {err:.2e}", flush=True)


if __name__ == "__main__":
    main()
