#!/usr/bin/env python
"""Graph-Laplacian spectra via Lanczos (the reference's eigensolver layer,
applied as its apps intended): algebraic connectivity (Fiedler value) of a
small-world graph, and the spectral gap closing as rewiring drops.
"""

import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__))))
import _common  # noqa: F401

import numpy as np

from sigma_tpu import CSRMatrix, eigensolve
from sigma_tpu.apps import watts_strogatz


def laplacian_of(g):
    rows, cols = g.edges_numpy()
    deg = np.bincount(rows, minlength=g.shape[0]).astype(float)
    n = g.shape[0]
    dense = np.diag(deg)
    dense[rows, cols] -= 1.0
    return CSRMatrix.from_dense(dense)


def main():
    rng = np.random.default_rng(0)
    n = 128
    for p in (0.0, 0.05, 0.3):
        g = watts_strogatz(n, 3, p, rng)
        L = laplacian_of(g)
        lam, V = eigensolve(L, v0=rng.standard_normal(n))
        lam = np.sort(np.asarray(lam))
        print(
            f"p={p:4}: lambda_2 (algebraic connectivity) = {lam[1]:.4f}, "
            f"lambda_max = {lam[-1]:.2f}"
        )
    print("(rewiring creates shortcuts: connectivity rises with p)")


if __name__ == "__main__":
    main()
