"""Nonsymmetric north star: 3-D advection-diffusion at nx^3 (default
216 -> 10.1M rows), f32, one chip.

The reference's nonsymmetric coverage is a 1-D upwinded operator at
n=1024 (solver_test_advection_diffusion_1d.f90, reproduced in
tests/test_solvers.py); this scales the same physics to 10M rows on
hardware: -div(grad u) + beta . grad u with first-order upwinding
(row-wise diagonally dominant, still a 7-point DIA stencil), solved
with BiCG-stab and GMRES against a manufactured solution.

Usage: python benchmarks/adv3d.py [--nx 216] [--beta 10] [--rtol 1e-6]
"""

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
)

import numpy as np


def advection_diffusion_dia(nx, beta):
    """7-point upwinded advection-diffusion on an nx^3 grid, DIA layout.

    Diffusion: standard 7-point Laplacian.  Advection: velocity
    (beta, beta, beta) * h with first-order upwinding — the downwind
    off-diagonals stay -1, the upwind ones become -(1 + beta_h) and the
    diagonal 6 + 3*beta_h, keeping row-wise diagonal dominance (the 1-D
    construction of the reference's test, per axis).
    """
    n = nx * nx * nx
    stride = -(-n // 128) * 128
    offsets = (-nx * nx, -nx, -1, 0, 1, nx, nx * nx)
    data = np.zeros((7, stride), np.float32)
    i = np.arange(n)
    iz, iy, ix = i % nx, (i // nx) % nx, i // (nx * nx)
    bh = float(beta) / (nx + 1)  # beta * h
    data[3, :n] = 6.0 + 3.0 * bh
    # upwind (negative-direction) neighbors carry the advective flux
    data[2, :n] = np.where(iz > 0, -(1.0 + bh), 0.0)
    data[4, :n] = np.where(iz < nx - 1, -1.0, 0.0)
    data[1, :n] = np.where(iy > 0, -(1.0 + bh), 0.0)
    data[5, :n] = np.where(iy < nx - 1, -1.0, 0.0)
    data[0, :n] = np.where(ix > 0, -(1.0 + bh), 0.0)
    data[6, :n] = np.where(ix < nx - 1, -1.0, 0.0)
    nnz = int(np.count_nonzero(data))
    return n, offsets, data, nnz


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nx", type=int, default=216)
    ap.add_argument("--beta", type=float, default=10.0)
    ap.add_argument("--rtol", type=float, default=1e-6)
    ap.add_argument("--maxiter", type=int, default=2000)
    ap.add_argument("--gmg", action="store_true",
                    help="also run BiCG-stab preconditioned by the "
                    "structured pair-aggregation multigrid (the Galerkin "
                    "coarsening handles the nonsymmetric upwinded stencil "
                    "directly)")
    ap.add_argument("--skip-gmres", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    print("devices:", jax.devices(), file=sys.stderr, flush=True)

    from sigma_tpu import DIAMatrix
    from sigma_tpu.graph.graph import DIAGraph
    from sigma_tpu.solvers import bicgstab_solve, gmres_solve, jacobi

    nx = args.nx
    n, offsets, data, nnz = advection_diffusion_dia(nx, args.beta)
    g = DIAGraph(offsets=offsets, shape=(n, n), nnz=nnz)
    A = DIAMatrix(graph=g, data=jnp.asarray(data.reshape(7, -1, 128)))

    xstar = jnp.asarray(
        np.random.default_rng(0).standard_normal(n).astype(np.float32)
    )
    b = A.matvec(xstar)
    nb = float(jnp.linalg.norm(b))
    M = jacobi().setup(A)

    def timed(solve, *extra):
        t0 = time.perf_counter()
        x, info = solve(A, b, *extra)
        resn = float(info.residual_norm)
        _ = time.perf_counter() - t0  # cold (compile)
        t0 = time.perf_counter()
        x, info = solve(A, b, *extra)
        resn = float(info.residual_norm)
        return x, info, resn, time.perf_counter() - t0

    bicg = jax.jit(
        lambda A, b, M: bicgstab_solve(
            A, b, tol=0.0, rtol=args.rtol, maxiter=args.maxiter, M=M
        )
    )
    x0, i0, r0, w0 = timed(bicg, M)
    print(
        json.dumps(
            {
                "metric": "adv3d_bicgstab_jacobi",
                "nnz": nnz,
                "beta": args.beta,
                "iterations": int(i0.iterations),
                "relative_residual": f"{r0 / nb:.3e}",
                "wall_s_warm": round(w0, 3),
            }
        ),
        flush=True,
    )

    if args.gmg:
        from sigma_tpu.solvers import structured_pair_amg

        t0 = time.perf_counter()
        Mg = structured_pair_amg(
            A, (nx, nx, nx), pairs_per_level=3, host_data=data
        )
        t_setup = time.perf_counter() - t0
        xg, ig, rg, wg = timed(bicg, Mg)
        print(
            json.dumps(
                {
                    "metric": "adv3d_bicgstab_gmg",
                    "iterations": int(ig.iterations),
                    "relative_residual": f"{rg / nb:.3e}",
                    "wall_s_warm": round(wg, 3),
                    "setup_s": round(t_setup, 1),
                    "speedup_vs_jacobi": round(w0 / wg, 2),
                }
            ),
            flush=True,
        )

    if not args.skip_gmres:
        gm = jax.jit(
            functools.partial(
                gmres_solve,
                tol=0.0,
                rtol=args.rtol,
                restart=32,
                maxiter=args.maxiter,
            )
        )
        x1, i1, r1, w1 = timed(gm)
        print(
            json.dumps(
                {
                    "metric": "adv3d_gmres32",
                    "iterations": int(i1.iterations),
                    "relative_residual": f"{r1 / nb:.3e}",
                    "wall_s_warm": round(w1, 3),
                }
            ),
            flush=True,
        )

    err = float(jnp.max(jnp.abs(x0 - xstar)) / jnp.max(jnp.abs(xstar)))
    print(f"# bicgstab solution rel err vs xstar: {err:.3e}",
          file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()
