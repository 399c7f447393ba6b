#!/usr/bin/env python
"""Hardware sweep of the pruned block-DIA SpMV kernel on the unstructured
north-star matrix: (tile_rows, group) grid, parity vs the chunked
wide-band kernel, true-Gnnz/s per configuration.  One JSON line each.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--height", type=int, default=16384)
    ap.add_argument("--width", type=int, default=64)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--tiles", default="4096,16384,65536")
    ap.add_argument("--groups", default="1,4,8,16")
    ap.add_argument("--bf16", action="store_true")
    args = ap.parse_args()

    try:
        from sigma_tpu.utils.util import enable_transparent_hugepages, enable_warm_heap

        enable_transparent_hugepages()
        enable_warm_heap()
    except Exception:
        pass

    import jax
    import jax.numpy as jnp
    from jax import lax

    from bench import timeit_loop
    from sigma_tpu.apps.generators import irregular_mesh_laplacian
    from sigma_tpu.matrix.banded import to_banded_dia
    from sigma_tpu.matrix.formats import CSRMatrix
    from sigma_tpu.ops.spmv_pruned import build_pruned_plan, dia_spmv_pallas_pruned

    rng = np.random.default_rng(args.seed)
    t0 = time.time()
    A = irregular_mesh_laplacian(args.height, args.width, rng=rng, dtype=np.float32)
    n = A.shape[0]
    rr, cc, vv = A.entries()
    sh = rng.permutation(n)
    A = CSRMatrix.from_coo(n, n, sh[rr], sh[cc], vv, dtype=np.float32)
    nnz = int(A.graph.nnz)
    D, p = to_banded_dia(A)
    n_diags = D.graph.n_diags
    print(f"# n={n} nnz={nnz} diags={n_diags} [setup {time.time()-t0:.0f}s]",
          file=sys.stderr)

    rows2, cols2, vals2 = A.entries()
    pr, pc = p[rows2], p[cols2]

    x = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    # chunked-kernel baseline (current champion)
    def mk(K):
        @jax.jit
        def f(A_, x_):
            def body(i, vv):
                return A_.matvec(vv) * jnp.asarray(0.1, vv.dtype)

            return lax.fori_loop(0, K, body, x_)

        return f

    t_base = timeit_loop(mk, D, x, K1=50, K2=400)
    y_base = np.asarray(D.matvec(x))
    print(json.dumps({
        "metric": "pruned_sweep_baseline",
        "true_gnnz_s": round(nnz / t_base / 1e9, 3),
        "ms": round(t_base * 1e3, 3),
    }))

    for tile_rows in [int(s) for s in args.tiles.split(",")]:
        for group in [int(s) for s in args.groups.split(",")]:
            t1 = time.time()
            plan = build_pruned_plan(
                n, n, pr, pc, vals2, tile_rows=tile_rows, group=group
            )
            t_plan = time.time() - t1
            dtypes = [np.float32] + ([jnp.bfloat16] if args.bf16 else [])
            for dt in dtypes:
                data = jnp.asarray(
                    plan.data.reshape(plan.L, plan.C, plan.T, 128)
                ).astype(dt)
                tile = jnp.asarray(plan.tile)
                first = jnp.asarray(plan.first)
                ro = jnp.asarray(plan.rowoff)
                lo = jnp.asarray(plan.laneoff)
                kw = dict(T=plan.T, E=plan.E, C=plan.C, n=n, m=n)

                def mkp(K):
                    @jax.jit
                    def f(data, x_, tile, first, ro, lo):
                        def body(i, vv):
                            return dia_spmv_pallas_pruned(
                                data, vv, tile, first, ro, lo, **kw
                            ) * jnp.asarray(0.1, vv.dtype)

                        return lax.fori_loop(0, K, body, x_)

                    return f

                try:
                    y_p = np.asarray(
                        dia_spmv_pallas_pruned(data, x, tile, first, ro, lo, **kw)
                    )
                    rel = float(
                        np.abs(y_p - y_base).max()
                        / max(np.abs(y_base).max(), 1e-30)
                    )
                    t_p = timeit_loop(mkp, data, x, tile, first, ro, lo,
                                      K1=50, K2=400)
                except Exception as e:
                    print(json.dumps({
                        "metric": "pruned_sweep", "tile_rows": tile_rows,
                        "group": group, "dtype": str(np.dtype(dt)),
                        "error": f"{type(e).__name__}: {e}"[:300],
                    }))
                    continue
                stored = plan.data.size
                print(json.dumps({
                    "metric": "pruned_sweep",
                    "tile_rows": tile_rows,
                    "group": group,
                    "dtype": str(np.dtype(dt)),
                    "L_steps": plan.L,
                    "stored_slots_M": round(stored / 1e6, 1),
                    "local_occupancy": round(nnz / stored, 4),
                    "packed_mb": round(stored * np.dtype(dt).itemsize / 1e6, 1),
                    "plan_s": round(t_plan, 2),
                    "ms": round(t_p * 1e3, 3),
                    "true_gnnz_s": round(nnz / t_p / 1e9, 3),
                    "slot_gnnz_s": round(stored / t_p / 1e9, 2),
                    "speedup_vs_chunked": round(t_base / t_p, 2),
                    "rel_err_vs_chunked": f"{rel:.2e}",
                }))


if __name__ == "__main__":
    main()
