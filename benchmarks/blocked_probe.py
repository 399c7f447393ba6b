"""Probe: blocked pallas DIA kernel vs XLA windows across the VMEM cliff.

Measures the 3-D Laplacian DIA SpMV at sizes below and above the ~3.5M-row
x-re-read cliff (BENCHMARKS.md), on the real chip.  Usage:

    python benchmarks/blocked_probe.py [--nx 128 160 216] [--check]
"""

import argparse
import os
import sys
import time

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
)

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nx", type=int, nargs="+", default=[128, 160, 216])
    ap.add_argument("--check", action="store_true")
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    print("devices:", jax.devices(), flush=True)

    from bench import laplacian_3d_coo, timeit_loop, bench_spmv
    from sigma_tpu import DIAMatrix
    from sigma_tpu.ops.spmv_pallas import dia_spmv_pallas_blocked
    import sigma_tpu.matrix.formats as fmts

    if args.check:
        nx = 100
        n, r, c, v = laplacian_3d_coo(nx)
        A = DIAMatrix.from_coo(n, n, r, c, v, dtype=jnp.float32)
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal(n).astype(np.float32))
        t0 = time.time()
        y_blk = dia_spmv_pallas_blocked(
            A.data, x, A.graph.offsets, n, n
        )
        y_blk = np.asarray(y_blk)
        print(f"blocked compile+run {time.time()-t0:.1f}s", flush=True)
        # XLA oracle: force the XLA path
        orig = fmts.DIAMatrix._pallas_path
        fmts.DIAMatrix._pallas_path = lambda self, x: None
        y_ref = np.asarray(A.matvec(x))
        fmts.DIAMatrix._pallas_path = orig
        err = np.max(np.abs(y_blk - y_ref)) / np.max(np.abs(y_ref))
        print(f"check nx={nx}: rel err vs XLA = {err:.2e}", flush=True)
        assert err < 1e-5

    for nx in args.nx:
        n, r, c, v = laplacian_3d_coo(nx)
        nnz = r.size
        A = DIAMatrix.from_coo(n, n, r, c, v, dtype=jnp.float32)
        # pallas path (the automatic selection above the cliff)
        t0 = time.time()
        rate_auto = bench_spmv(A, nnz)
        t_auto = time.time() - t0
        # forced XLA path
        orig = fmts.DIAMatrix._pallas_path
        fmts.DIAMatrix._pallas_path = lambda self, x: None
        t0 = time.time()
        rate_xla = bench_spmv(A, nnz)
        t_xla = time.time() - t0
        fmts.DIAMatrix._pallas_path = orig
        print(
            f"nx={nx} n={n} nnz={nnz}: auto(pallas>{fmts.DIAMatrix._PALLAS_MIN_ELEMS/1e6:.0f}M) "
            f"{rate_auto/1e9:.1f} Gnnz/s ({t_auto:.0f}s)  "
            f"xla {rate_xla/1e9:.1f} Gnnz/s ({t_xla:.0f}s)",
            flush=True,
        )


if __name__ == "__main__":
    main()
