"""Probe: generic SA-AMG setup wall at ~1M rows, with/without heap tuning.

Measures the named round-3 candidate (CLAUDE.md): generic smoothed-
aggregation setup is page-fault dominated on this VM.  Treatment arms:
``--mallopt`` (brk-heap allocations, see heap_probe.py) and THP (always
applied, as conftest/bench do).
"""
import argparse
import ctypes
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mallopt", action="store_true")
    ap.add_argument("--nx", type=int, default=64)
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()

    if args.mallopt:
        libc = ctypes.CDLL("libc.so.6", use_errno=True)
        libc.mallopt(-3, 1 << 30)  # M_MMAP_THRESHOLD
        libc.mallopt(-1, 1 << 30)  # M_TRIM_THRESHOLD

    import jax

    jax.config.update("jax_platforms", "cpu")
    from sigma_tpu.utils.util import enable_transparent_hugepages

    enable_transparent_hugepages()

    from bench import laplacian_3d_coo
    from sigma_tpu.matrix.formats import CSRMatrix
    from sigma_tpu.solvers.amg import smoothed_aggregation_amg

    t0 = time.perf_counter()
    n, r, c, v = laplacian_3d_coo(args.nx)
    A = CSRMatrix.from_coo(n, n, r, c, v, dtype=np.float32)
    print(f"build A ({A.shape[0]} rows, {A.nnz} nnz): "
          f"{time.perf_counter() - t0:.1f} s")

    for rep in range(args.reps):
        t0 = time.perf_counter()
        M = smoothed_aggregation_amg(A)
        dt = time.perf_counter() - t0
        print(f"rep {rep}: setup {dt:.1f} s, levels {len(M.levels)}")


if __name__ == "__main__":
    main()
