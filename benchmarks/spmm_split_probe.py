#!/usr/bin/env python
"""k>16 multi-RHS verdict (VERDICT r03 item 7): is splitting a wide RHS
block into 16-wide kernel passes within ~10% of a hypothetical one-pass
kernel?

Measures matmat_rhs_major per-RHS time at k = 8, 16, 32, 64 on the
10.1M-row 7-point stencil (auto-split above 16) and compares against the
traffic model: per-RHS words = D*n/k (value stream, amortized over the
pass width) + c*n (x + y + halos, k-independent), so a one-pass k=32
kernel could save at most the difference between D*n/16 and D*n/32 —
bounded by  (D/16 - D/32) / (D/16 + c)  of the k=16 per-RHS time.
One JSON line per k, plus the model bound.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nx", type=int, default=216)
    ap.add_argument("--ks", default="8,16,32,64")
    args = ap.parse_args()

    from sigma_tpu.utils.util import enable_transparent_hugepages, enable_warm_heap

    enable_transparent_hugepages()
    enable_warm_heap()

    import jax
    import jax.numpy as jnp
    from jax import lax

    from bench import laplacian_3d_dia, timeit_loop
    from sigma_tpu import DIAMatrix
    from sigma_tpu.graph.graph import DIAGraph

    nx = args.nx
    n, offsets, data, nnz = laplacian_3d_dia(nx)
    g = DIAGraph(offsets=offsets, shape=(n, n), nnz=nnz)
    A = DIAMatrix(graph=g, data=jnp.asarray(data.reshape(7, -1, 128)))
    print(f"# n={n} nnz={nnz}", file=sys.stderr)

    def loop(fn):
        def mk(K):
            @jax.jit
            def f(op, V):
                def body(i, vv):
                    return fn(op, vv) * jnp.asarray(0.1, vv.dtype)

                return lax.fori_loop(0, K, body, V)

            return f

        return mk

    x = jnp.ones((n,), jnp.float32)
    t1 = timeit_loop(loop(lambda M, v: M.matvec(v)), A, x, K1=10, K2=50)
    print(json.dumps({"metric": "spmv_ms", "ms": round(t1 * 1e3, 3)}))

    per_rhs = {}
    for k in [int(s) for s in args.ks.split(",")]:
        XT = jnp.ones((k, n), jnp.float32)
        t = timeit_loop(loop(lambda M, V: M.matmat_rhs_major(V)), A, XT,
                        K1=5, K2=25)
        per_rhs[k] = t / k
        print(json.dumps({
            "metric": "spmm_split", "k": k,
            "passes": -(-k // 16),
            "ms": round(t * 1e3, 3),
            "ms_per_rhs": round(t / k * 1e3, 4),
            "true_eff_gnnz_s": round(k * nnz / t / 1e9, 2),
            "per_rhs_speedup_vs_spmv": round(k * t1 / t, 2),
        }))

    if 16 in per_rhs and 32 in per_rhs:
        # model: per-RHS = a*D/k + c  ->  one-pass k=32 bound from the
        # k=8 vs k=16 slope (both single-pass), vs the measured split
        a_term = (per_rhs[8] - per_rhs[16]) * 16  # = a*D
        one_pass_32 = per_rhs[16] - a_term / 32
        print(json.dumps({
            "metric": "spmm_split_verdict",
            "measured_split_k32_ms_per_rhs": round(per_rhs[32] * 1e3, 4),
            "modeled_one_pass_k32_ms_per_rhs": round(
                max(one_pass_32, 0) * 1e3, 4
            ),
            "split_overhead_vs_one_pass_pct": round(
                100 * (per_rhs[32] / max(one_pass_32, 1e-12) - 1), 1
            ),
        }))


if __name__ == "__main__":
    main()
