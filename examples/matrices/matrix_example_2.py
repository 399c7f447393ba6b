#!/usr/bin/env python
"""Lazy operator algebra and explicit sparse algebra side by side (after
matrix_example_2.f90): L = A + B and Q = A @ B as lazy pytree operators
versus materialized sparse results — same numbers, different costs.
"""

import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
import _common  # noqa: F401

import jax.numpy as jnp
import numpy as np

from sigma_tpu import CSRMatrix, ELLMatrix, sparse_add, sparse_matmul


def main():
    rng = np.random.default_rng(2)
    n = 256
    dA = np.where(rng.random((n, n)) < 0.03, rng.standard_normal((n, n)), 0.0)
    dB = np.where(rng.random((n, n)) < 0.03, rng.standard_normal((n, n)), 0.0)
    A = CSRMatrix.from_dense(dA)
    B = ELLMatrix.from_dense(dB)

    x = jnp.asarray(rng.standard_normal(n))

    lazy_sum = A + B          # no new matrix: matvec = two matvecs
    lazy_prod = A @ B         # no new matrix: matvec = two chained matvecs
    expl_sum = sparse_add(A, B)
    expl_prod = sparse_matmul(A, B)

    print("sum  |lazy - explicit| =",
          float(jnp.max(jnp.abs(lazy_sum.matvec(x) - expl_sum.matvec(x)))))
    print("prod |lazy - explicit| =",
          float(jnp.max(jnp.abs(lazy_prod.matvec(x) - expl_prod.matvec(x)))))
    print("explicit product:", expl_prod)
    print("adjoint check:",
          float(jnp.max(jnp.abs(A.T.matvec(x) - A.rmatvec(x)))))


if __name__ == "__main__":
    main()
