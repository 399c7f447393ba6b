#!/usr/bin/env python
"""Iterative solving with and without preconditioning (after
/root/reference/examples/solvers/solver_example_1.f90): CG on a random
graph Laplacian + I, plain vs Jacobi-preconditioned vs IC(0).
"""

import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
import _common  # noqa: F401

import jax.numpy as jnp
import numpy as np

from sigma_tpu import CSRMatrix
from sigma_tpu.solvers import cg_solve, jacobi, ldu


def main():
    rng = np.random.default_rng(3)
    n, p = 512, 0.02
    adj = np.triu(rng.random((n, n)) < p, 1)
    adj = adj | adj.T
    dA = np.diag(adj.sum(1).astype(float)) - adj + np.eye(n)
    A = CSRMatrix.from_dense(dA)

    xstar = rng.standard_normal(n)
    b = jnp.asarray(dA @ xstar)

    x, info = cg_solve(A, b, tol=1e-12)
    print(f"plain CG:   {int(info.iterations)} iterations, "
          f"err {np.max(np.abs(np.asarray(x) - xstar)):.2e}")

    x, info = cg_solve(A, b, tol=1e-12, M=jacobi().setup(A))
    print(f"jacobi CG:  {int(info.iterations)} iterations, "
          f"err {np.max(np.abs(np.asarray(x) - xstar)):.2e}")

    x, info = cg_solve(A, b, tol=1e-12, M=ldu(incomplete=True).setup(A))
    print(f"IC(0) CG:   {int(info.iterations)} iterations, "
          f"err {np.max(np.abs(np.asarray(x) - xstar)):.2e}")


if __name__ == "__main__":
    main()
