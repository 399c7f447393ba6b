"""North-star eigensolve: lowest eigenpairs of the 10M-row 3-D Dirichlet
Poisson operator on one chip, LOBPCG + structured multigrid, validated
against the ANALYTIC spectrum.

The Dirichlet Laplacian's eigenvalues on an nx^3 grid are known in
closed form: lambda(i,j,k) = sum over the three indices of
4 sin^2(pi q / (2 (nx+1))) — so this is an end-to-end eigensolver
accuracy check at a scale no dense method can touch (the reference's
eigensolver tests cap at a few hundred rows).

Usage: python benchmarks/eigen3d.py [--nx 216] [--m 4] [--tol 1e-4]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
)

import numpy as np


def analytic_lowest(nx, count):
    """Lowest `count` eigenvalues of the 3-D Dirichlet Laplacian."""
    q = np.arange(1, nx + 1)
    w = 4.0 * np.sin(np.pi * q / (2.0 * (nx + 1))) ** 2
    # lowest sums come from small indices; a small corner block suffices
    c = min(nx, 8)
    block = (
        w[:c, None, None] + w[None, :c, None] + w[None, None, :c]
    ).ravel()
    return np.sort(block)[:count]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nx", type=int, default=216)
    ap.add_argument("--m", type=int, default=4)
    ap.add_argument("--tol", type=float, default=1e-4)
    ap.add_argument("--maxiter", type=int, default=120)
    ap.add_argument("--inverse-step", action="store_true",
                    help="with --refine-rq: one f64-refined inverse-"
                    "iteration step per vector + f64 Rayleigh-Ritz")
    ap.add_argument("--refine-rq", action="store_true",
                    help="recompute the final Rayleigh quotients in "
                    "(emulated) float64: removes the f32 arithmetic floor "
                    "(eps*||A|| ~ lambda_min/100 at this scale), leaving "
                    "only the quadratic eigenvector-angle term")
    args = ap.parse_args()

    import jax

    if args.refine_rq:
        jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    print("devices:", jax.devices(), file=sys.stderr, flush=True)

    from bench import laplacian_3d_dia
    from sigma_tpu import DIAMatrix
    from sigma_tpu.graph.graph import DIAGraph
    from sigma_tpu.eigen.lobpcg import lobpcg
    from sigma_tpu.solvers import structured_pair_amg

    nx, m = args.nx, args.m
    n, offsets, data, nnz = laplacian_3d_dia(nx)
    data[3, :n] = 6.0  # pure Dirichlet Laplacian
    g = DIAGraph(offsets=offsets, shape=(n, n), nnz=nnz)
    A = DIAMatrix(graph=g, data=jnp.asarray(data.reshape(7, -1, 128)))

    t0 = time.perf_counter()
    M = structured_pair_amg(
        A, (nx, nx, nx), pairs_per_level=3, host_data=data
    )
    t_setup = time.perf_counter() - t0

    solve = jax.jit(
        lambda A, X0, M: lobpcg(
            A, X0, M=M, tol=args.tol, maxiter=args.maxiter
        )
    )
    X0 = jnp.asarray(
        np.random.default_rng(0).standard_normal((n, m)).astype(np.float32)
    )
    t0 = time.perf_counter()
    res = solve(A, X0, M)
    lam = np.sort(np.asarray(res.eigenvalues))
    t_cold = time.perf_counter() - t0
    t0 = time.perf_counter()
    res = solve(A, X0, M)
    lam = np.sort(np.asarray(res.eigenvalues))
    t_warm = time.perf_counter() - t0

    exact = analytic_lowest(nx, m)
    rel_err = np.abs(lam - exact) / exact
    out = {
        "metric": "poisson_lobpcg_gmg",
        "m": m,
        "iterations": int(res.iterations),
        "eigenvalues": [float(f"{v:.6e}") for v in lam],
        "analytic": [float(f"{v:.6e}") for v in exact],
        "rel_err": [float(f"{v:.2e}") for v in rel_err],
        "gmg_setup_s": round(t_setup, 2),
        "wall_s_warm": round(t_warm, 2),
    }

    if args.refine_rq:
        t0 = time.perf_counter()
        A64 = DIAMatrix(
            graph=g,
            data=jnp.asarray(data.astype(np.float64).reshape(7, -1, 128)),
        )
        V = res.eigenvectors.astype(jnp.float64)
        # jit the f64 block product: eager emulated-f64 matmat dispatches
        # per-diagonal with 300 MB intermediates (measured ~30 s eager vs
        # sub-second jitted at 10.1M rows)
        rq_f = jax.jit(
            lambda A_, V_: jnp.einsum("nj,nj->j", V_, A_.matmat(V_))
            / jnp.einsum("nj,nj->j", V_, V_)
        )
        lam_rq = np.sort(np.asarray(rq_f(A64, V)))
        out["rq_f64_eigenvalues"] = [float(f"{v:.8e}") for v in lam_rq]
        out["rq_f64_rel_err"] = [
            float(f"{v:.2e}") for v in np.abs(lam_rq - exact) / exact
        ]
        out["rq_f64_s"] = round(time.perf_counter() - t0, 2)

        if args.inverse_step:
            # one f64-refined inverse-iteration step per vector + f64
            # Rayleigh-Ritz: the packaged pipeline
            # (sigma_tpu.eigen.refine_eigenpairs)
            from sigma_tpu.eigen import refine_eigenpairs

            t0 = time.perf_counter()
            ref = refine_eigenpairs(A64, res.eigenvectors, M_lo=M)
            lam_ii = ref.eigenvalues
            out["inverse_step_s_incl_compile"] = round(
                time.perf_counter() - t0, 2
            )
            t0 = time.perf_counter()
            ref = refine_eigenpairs(A64, res.eigenvectors, M_lo=M)
            lam_ii = ref.eigenvalues
            out["inverse_step_eigenvalues"] = [
                float(f"{v:.10e}") for v in lam_ii
            ]
            out["inverse_step_rel_err"] = [
                float(f"{v:.2e}") for v in np.abs(lam_ii - exact) / exact
            ]
            out["inverse_step_s_warm"] = round(time.perf_counter() - t0, 2)

    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
