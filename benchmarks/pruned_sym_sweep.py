#!/usr/bin/env python
"""Hardware sweep: SYMMETRIC pruned block-DIA SpMV/SpMM vs full pruned
storage on the unstructured (SPD) north-star mesh.  The symmetric kernel
streams half the packed value slots (upper triangle only) and applies
the mirror in-kernel (ops/spmv_pruned.py::dia_sym_spmv_pallas_pruned);
this measures whether the ~3x per-slot VPU work stays under the halved
HBM stream.  One JSON line per configuration.
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
    ap.add_argument("--tiles", default="16384")
    ap.add_argument("--groups", default="8,16")
    ap.add_argument("--spmm-k", type=int, default=0)
    ap.add_argument("--no-bf16", action="store_true")
    args = ap.parse_args()

    try:
        from sigma_tpu.utils.util import (
            enable_transparent_hugepages,
            enable_warm_heap,
        )

        enable_transparent_hugepages()
        enable_warm_heap()
    except Exception:
        pass

    import jax
    import jax.numpy as jnp
    from jax import lax

    from bench import timeit_loop
    from sigma_tpu.apps.generators import irregular_mesh_laplacian
    from sigma_tpu.matrix.banded import _reordered_triples
    from sigma_tpu.matrix.formats import CSRMatrix
    from sigma_tpu.matrix.pruned import (
        PrunedDIAMatrix,
        SymmetricPrunedDIAMatrix,
    )

    rng = np.random.default_rng(args.seed)
    t0 = time.time()
    A = irregular_mesh_laplacian(args.height, args.width, rng=rng,
                                 dtype=np.float32)
    n = A.shape[0]
    rr, cc, vv = A.entries()
    sh = rng.permutation(n)
    A = CSRMatrix.from_coo(n, n, sh[rr], sh[cc], vv, dtype=np.float32)
    nnz = int(A.graph.nnz)
    pr, pc, vals2, _p = _reordered_triples(A, True, "rcm")
    print(f"# n={n} nnz={nnz} [setup {time.time()-t0:.0f}s]",
          file=sys.stderr)

    x = jnp.asarray(rng.standard_normal(n).astype(np.float32))

    def bench_op(apply_fn, *arrs):
        def mk(K):
            @jax.jit
            def f(x_, *a):
                def body(i, vv):
                    return apply_fn(vv, *a) * jnp.asarray(0.1, vv.dtype)

                return lax.fori_loop(0, K, body, x_)

            return f

        return timeit_loop(mk, x, *arrs, K1=50, K2=400)

    for tile_rows in [int(s) for s in args.tiles.split(",")]:
        for group in [int(s) for s in args.groups.split(",")]:
            t1 = time.time()
            P = PrunedDIAMatrix.from_coo(
                n, n, pr, pc, vals2, dtype=np.float32,
                tile_rows=tile_rows, group=group, assume_unique=True,
            )
            S = SymmetricPrunedDIAMatrix.from_coo(
                n, n, pr, pc, vals2, dtype=np.float32,
                tile_rows=tile_rows, group=group, assume_unique=True,
                validate=False,
            )
            t_pack = time.time() - t1
            dts = [jnp.float32] + ([] if args.no_bf16 else [jnp.bfloat16])
            for dt in dts:
                Pd = P.astype(dt) if dt != jnp.float32 else P
                Sd = S.astype(dt) if dt != jnp.float32 else S
                y_full = np.asarray(Pd.matvec(x))
                y_sym = np.asarray(Sd.matvec(x))
                rel = float(
                    np.abs(y_sym - y_full).max()
                    / max(np.abs(y_full).max(), 1e-30)
                )
                t_full = bench_op(lambda v, M: M.matvec(v), Pd)
                t_sym = bench_op(lambda v, M: M.matvec(v), Sd)
                rec = {
                    "metric": "pruned_sym_sweep",
                    "tile_rows": tile_rows,
                    "group": group,
                    "dtype": str(np.dtype(dt)),
                    "pack_s": round(t_pack, 1),
                    "slots_full_M": round(P.stored_slots / 1e6, 1),
                    "slots_sym_M": round(S.stored_slots / 1e6, 1),
                    "full_ms": round(t_full * 1e3, 3),
                    "sym_ms": round(t_sym * 1e3, 3),
                    "full_true_gnnz_s": round(nnz / t_full / 1e9, 2),
                    "sym_true_gnnz_s": round(nnz / t_sym / 1e9, 2),
                    "sym_slot_gnnz_s": round(
                        S.stored_slots / t_sym / 1e9, 2
                    ),
                    "speedup_sym_vs_full": round(t_full / t_sym, 2),
                    "rel_err_sym_vs_full": f"{rel:.2e}",
                }
                if args.spmm_k:
                    k = args.spmm_k
                    XT = jnp.asarray(
                        rng.standard_normal((k, n)).astype(np.float32)
                    )

                    def mkm(K):
                        @jax.jit
                        def f(XT_, M_):
                            def body(i, vv):
                                return M_.matmat_rhs_major(vv) * jnp.asarray(
                                    0.1, vv.dtype
                                )

                            return lax.fori_loop(0, K, body, XT_)

                        return f

                    tm_full = timeit_loop(mkm, XT, Pd, K1=20, K2=120)
                    tm_sym = timeit_loop(mkm, XT, Sd, K1=20, K2=120)
                    rec.update(
                        spmm_k=k,
                        spmm_full_ms=round(tm_full * 1e3, 3),
                        spmm_sym_ms=round(tm_sym * 1e3, 3),
                        spmm_full_geff=round(nnz * k / tm_full / 1e9, 2),
                        spmm_sym_geff=round(nnz * k / tm_sym / 1e9, 2),
                    )
                print(json.dumps(rec))


if __name__ == "__main__":
    main()
