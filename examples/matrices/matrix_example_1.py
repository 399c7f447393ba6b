#!/usr/bin/env python
"""Random walk on a directed random graph via the transition matrix (after
/root/reference/examples/matrices/matrix_example_1.f90): build P with
P[i, j] = 1/deg(i) for each edge, evolve a distribution with rmatvec
(rho_{t+1} = P^T rho_t), and watch the entropy rise to the stationary value.
"""

import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
import _common  # noqa: F401

import jax.numpy as jnp
import numpy as np

from sigma_tpu import CSRMatrix


def main():
    rng = np.random.default_rng(0)
    n, p = 512, 0.02
    mask = rng.random((n, n)) < p
    np.fill_diagonal(mask, False)
    mask[mask.sum(1) == 0, 0] = True  # no dangling vertices
    rows, cols = np.nonzero(mask)

    deg = np.bincount(rows, minlength=n)
    P = CSRMatrix.from_coo(n, n, rows, cols, 1.0 / deg[rows])

    rho = jnp.zeros(n).at[0].set(1.0)  # start at vertex 0
    for t in range(50):
        rho = P.rmatvec(rho)
    rho_np = np.asarray(rho)
    entropy = -np.sum(np.where(rho_np > 0, rho_np * np.log(rho_np), 0.0))
    print(f"entropy after 50 steps: {entropy:.4f} (max {np.log(n):.4f})")
    print(f"total probability: {rho_np.sum():.6f}")


if __name__ == "__main__":
    main()
