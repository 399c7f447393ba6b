#!/usr/bin/env python
"""Elasticity-like 3x3-block north star: a coupled 3-field (vector)
operator at 10M dof on one chip, stored FIELD-BLOCKED — a BlockMatrix of
9 DIA stencil blocks — so every block runs the gather-free blocked
kernel.

Operator: A = C ⊗ L + I, with L the 7-point 3-D Laplacian and C a dense
SPD 3x3 coupling (Lamé-like cross-field terms).  This is the TPU-native
layout decision for multi-DOF PDE: the reference's composite block
matrix (sparse_matrix_composites.f90:41-162, "the primary means by which
parallelism is enabled") carries the FIELDS, and each block keeps its
scalar stencil structure — versus node-major (3,3)-block BSR, whose tiny
blocks waste the 128-wide lanes.  Measures SpMV, multi-RHS SpMM, and a
block-Jacobi-preconditioned CG solve with manufactured solution.

Prints one JSON line per measurement.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nx", type=int, default=150, help="grid (3*nx^3 dof)")
    ap.add_argument("--iters", type=int, default=150)
    ap.add_argument("--nrhs", type=int, default=4)
    args = ap.parse_args()

    try:
        from sigma_tpu.utils.util import enable_transparent_hugepages, enable_warm_heap

        enable_transparent_hugepages()
        enable_warm_heap()
    except Exception:
        pass

    import jax
    import jax.numpy as jnp
    from jax import lax

    from bench import laplacian_3d_dia, timeit_loop
    from sigma_tpu import DIAMatrix
    from sigma_tpu.graph.graph import DIAGraph
    from sigma_tpu.matrix.composite import BlockMatrix
    from sigma_tpu.solvers import cg_solve

    nx = args.nx
    n, offsets, data, nnz_blk = laplacian_3d_dia(nx)
    # laplacian_3d_dia returns Lap + I on the center diagonal; strip the
    # shift to get the pure Laplacian stencil
    ctr = offsets.index(0)
    data[ctr, :n] -= 1.0

    C = np.array([[2.0, 0.5, 0.3], [0.5, 2.0, 0.4], [0.3, 0.4, 2.0]])
    assert np.all(np.linalg.eigvalsh(C) > 0)

    g = DIAGraph(offsets=offsets, shape=(n, n), nnz=nnz_blk)

    def blk_exact(i, j):
        d = C[i, j] * np.asarray(data)
        if i == j:
            d[ctr, :n] += 1.0
        return DIAMatrix(
            graph=g, data=jnp.asarray(d.reshape(len(offsets), -1, 128))
        )

    t0 = time.time()
    A = BlockMatrix.from_blocks(
        [[blk_exact(i, j) for j in range(3)] for i in range(3)]
    )
    N = A.shape[0]
    nnz = 9 * nnz_blk
    print(
        f"# elasticity-like block operator: 3x{n} = {N} dof, "
        f"{nnz} nnz in 9 DIA blocks  [build {time.time()-t0:.1f}s]",
        file=sys.stderr,
    )

    x = jnp.ones((N,), jnp.float32)

    def mk(K):
        @jax.jit
        def f(A, x):
            def body(i, vv):
                return A.matvec(vv) * jnp.asarray(0.1, vv.dtype)

            return lax.fori_loop(0, K, body, x)

        return f

    t = timeit_loop(mk, A, x, K1=5, K2=25)
    ok = t > 1e-9  # clamp floor => workload below launch jitter
    print(json.dumps({
        "metric": "elasticity_block_spmv",
        "dof": N,
        "nnz": int(nnz),
        "gnnz_s": round(nnz / t / 1e9, 2) if ok else None,
        "achieved_gbps_values_stream": (
            round(nnz * 4 / t / 1e9, 1) if ok else None
        ),
        "ms_per_spmv": round(t * 1e3, 3) if ok else None,
        "layout": "BlockMatrix of 9 DIA stencil blocks (field-blocked)",
    }))

    # multi-RHS through the composite (block-wise matmat)
    X = jnp.ones((N, args.nrhs), jnp.float32)

    def mkm(K):
        @jax.jit
        def f(A, X):
            def body(i, V):
                return A.matmat(V) * jnp.asarray(0.1, V.dtype)

            return lax.fori_loop(0, K, body, X)

        return f

    tm = timeit_loop(mkm, A, X, K1=3, K2=15)
    okm = tm > 1e-9
    print(json.dumps({
        "metric": "elasticity_block_spmm",
        "nrhs": args.nrhs,
        "eff_gnnz_s": (
            round(args.nrhs * nnz / tm / 1e9, 2) if okm else None
        ),
        "ms_per_apply": round(tm * 1e3, 3) if okm else None,
    }))

    # CG with the field-diagonal Jacobi preconditioner
    xstar = jnp.asarray(
        np.tile(np.sin(np.arange(n) * 0.001), 3).astype(np.float32)
    )
    b = A.matvec(xstar)
    dinv = 1.0 / jnp.concatenate(
        [jnp.full((n,), C[i, i] * 6.0 + 1.0, jnp.float32) for i in range(3)]
    )
    from sigma_tpu.operators.linear_operator import MatvecOperator

    M = MatvecOperator(
        params=dinv, mv=lambda d, r: d * r, rmv=None, shape=(N, N)
    )
    solve = jax.jit(
        lambda A, b, M: cg_solve(
            A, b, tol=0.0, rtol=1e-6, maxiter=args.iters, M=M
        )
    )
    xs, info = solve(A, b, M)
    float(info.residual_norm)
    t1 = time.time()
    xs, info = solve(A, b, M)
    resn = float(info.residual_norm)
    t_warm = time.time() - t1
    err = float(jnp.max(jnp.abs(xs - xstar)))
    print(json.dumps({
        "metric": "elasticity_block_cg",
        "iterations": int(info.iterations),
        "relative_residual": f"{resn / float(jnp.linalg.norm(b)):.2e}",
        "max_err_vs_manufactured": f"{err:.2e}",
        "wall_s_warm": round(t_warm, 2),
        "s_per_iteration": round(t_warm / max(int(info.iterations), 1), 4),
    }))


if __name__ == "__main__":
    main()
