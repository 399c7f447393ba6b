#!/usr/bin/env python
"""The general-sparsity recipe end to end: an unstructured (irregular,
arbitrarily labeled) SPD matrix solved through the TPU-native pipeline

    RCM reorder -> banded DIA (-> symmetric upper-only storage) -> CG

Per-element gathers run ~0.1 Gnnz/s on TPU, so general sparsity is
served STRUCTURALLY: `to_banded_dia` reorders into a band and stores
every band diagonal densely; wide bands stream through the chunked
blocked kernel at HBM rate (BENCHMARKS.md "Unstructured-sparsity north
star": 91% of spec HBM, 81x the gather floor at 1M rows).

Small here so it runs anywhere; crank --height/--width on a TPU.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
import _common  # noqa: F401

import jax.numpy as jnp
import numpy as np

from sigma_tpu import CSRMatrix
from sigma_tpu.apps.generators import irregular_mesh_laplacian
from sigma_tpu.matrix.banded import band_occupancy, bandwidth, to_banded_dia
from sigma_tpu.matrix.symmetric import SymmetricDIAMatrix
from sigma_tpu.solvers import cg_solve


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--height", type=int, default=120)
    ap.add_argument("--width", type=int, default=40)
    args = ap.parse_args()

    rng = np.random.default_rng(7)
    A = irregular_mesh_laplacian(args.height, args.width, rng=rng,
                                 dtype=jnp.float32)
    n = A.shape[0]
    # matrices arrive in arbitrary labelings; shuffle to make that real
    rr, cc, vv = A.entries()
    sh = rng.permutation(n)
    A = CSRMatrix.from_coo(n, n, sh[rr], sh[cc], vv, dtype=jnp.float32)
    print(f"n={n}, nnz={A.graph.nnz}, input bandwidth {bandwidth(A)}")

    D, p = to_banded_dia(A)  # RCM + dense-diagonal refreeze
    print(
        f"after RCM: {D.graph.n_diags} stored diagonals, "
        f"occupancy {band_occupancy(A):.4f} -> "
        f"{A.graph.nnz / (n * D.graph.n_diags):.4f}"
    )
    # audit which kernel will run (None = the pallas fast path engages)
    print("why_not_pallas:", D.why_not_pallas() or "fast path engages")

    # solve in the permuted frame: b_p[p] = b, x = x_p[p]
    xstar = np.sin(np.arange(n) * 0.01).astype(np.float32)
    b = np.asarray(A.matvec(jnp.asarray(xstar)))
    b_p = np.empty_like(b)
    b_p[p] = b
    x_p, info = cg_solve(D, jnp.asarray(b_p), tol=0.0, rtol=1e-6)
    err = np.abs(np.asarray(x_p)[p] - xstar).max()
    print(f"banded CG: {int(info.iterations)} iters, max err {err:.2e}")

    # the matrix is SPD: upper-only storage halves the value stream
    Ds = SymmetricDIAMatrix.from_dia(D)
    x_p, info = cg_solve(Ds, jnp.asarray(b_p), tol=0.0, rtol=1e-6)
    err = np.abs(np.asarray(x_p)[p] - xstar).max()
    print(
        f"symmetric-storage CG ({len(Ds.offsets)} upper diagonals): "
        f"{int(info.iterations)} iters, max err {err:.2e}"
    )


if __name__ == "__main__":
    main()
