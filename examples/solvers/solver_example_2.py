#!/usr/bin/env python
"""Beyond the reference: the solver extensions working together.

On one 2-D Poisson problem: smoothed-aggregation AMG (V-cycle pc),
Chebyshev polynomial preconditioning, block CG for 8 right-hand sides at
once, and LOBPCG for the lowest eigenpairs — all composed from the same
operator/preconditioner protocols the reference pioneered.
"""

import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
import _common  # noqa: F401

import jax.numpy as jnp
import numpy as np

from sigma_tpu import CSRMatrix, lobpcg
from sigma_tpu.solvers import (
    block_cg_solve,
    cg_solve,
    chebyshev,
    smoothed_aggregation_amg,
)


def laplacian_2d(nx):
    n = nx * nx
    idx = np.arange(n).reshape(nx, nx)
    d = 4 * np.eye(n)
    for ax in range(2):
        s = np.take(idx, np.arange(nx - 1), axis=ax).ravel()
        t = np.take(idx, np.arange(1, nx), axis=ax).ravel()
        d[s, t] = -1
        d[t, s] = -1
    return d


def main():
    rng = np.random.default_rng(0)
    nx = 32
    dense = laplacian_2d(nx)
    n = nx * nx
    A = CSRMatrix.from_dense(dense)
    xstar = rng.standard_normal(n)
    b = jnp.asarray(dense @ xstar)

    _, plain = cg_solve(A, b, tol=1e-11)
    print(f"plain CG:        {int(plain.iterations):4d} iterations")

    amg = smoothed_aggregation_amg(A)
    _, info = cg_solve(A, b, tol=1e-11, M=amg)
    print(f"AMG-CG:          {int(info.iterations):4d} iterations "
          f"({len(amg.levels) + 1} levels)")

    ev = np.linalg.eigvalsh(dense)
    cheb = chebyshev(A, degree=8, lmax=ev.max() * 1.05, lmin=ev.min())
    _, info = cg_solve(A, b, tol=1e-11, M=cheb)
    print(f"Chebyshev(8)-CG: {int(info.iterations):4d} iterations")

    B = jnp.asarray(dense @ rng.standard_normal((n, 8)))
    _, info = block_cg_solve(A, B, tol=1e-10, M=amg)
    print(f"block CG (8 rhs):{int(info.iterations):4d} iterations "
          "(one SpMM each)")

    res = lobpcg(A, m=4, M=amg, tol=1e-7, maxiter=200)
    lam = np.sort(np.asarray(res.eigenvalues))
    print(f"LOBPCG lowest 4: {lam.round(5)} in {int(res.iterations)} "
          f"iterations (exact: {np.linalg.eigvalsh(dense)[:4].round(5)})")


if __name__ == "__main__":
    main()
