#!/usr/bin/env python
"""Sweep (kb, max_chunk) for the grouped two-level SpMM on the 1M-row
unstructured band, against the 16-wide auto-split baseline.  Finds the
config that compiles inside the Mosaic scoped-VMEM limit (the working-set
model under-predicts the unrolled diagonal loop's temporaries — see the
symmetric chunked note in spmv_pallas.py) and measures whether the
saved value re-streams survive the extra slab partial sums."""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def main():
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
    from sigma_tpu.ops.spmv_pallas import (
        dia_spmm_grouped_chunked,
        interleave_panels_grouped,
        deinterleave_panels_grouped,
    )

    k = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    t0 = time.time()
    rng = np.random.default_rng(0)
    A = irregular_mesh_laplacian(16384, 64, rng=rng, dtype=jnp.float32)
    n = A.shape[0]
    rr, cc, vv = A.entries()
    sh = rng.permutation(n)
    A = CSRMatrix.from_coo(n, n, sh[rr], sh[cc], vv, dtype=jnp.float32)
    D, p = to_banded_dia(A)
    nnz = A.graph.nnz
    n_diags = D.graph.n_diags
    slots = n * n_diags
    print(f"# n={n} diags={n_diags} k={k} [build {time.time()-t0:.1f}s]",
          file=sys.stderr)

    XT = jnp.asarray(rng.standard_normal((k, n)), jnp.float32)

    # baseline: 16-wide auto-split through matmat_rhs_major
    def mk_split(K):
        @jax.jit
        def f(D_, V):
            def body(i, V):
                parts = [
                    D_.matmat_rhs_major(V[j0 : j0 + 16])
                    for j0 in range(0, k, 16)
                ]
                return jnp.concatenate(parts, axis=0) * jnp.asarray(0.1, V.dtype)

            return lax.fori_loop(0, K, body, V)

        return f

    t_split = timeit_loop(mk_split, D, XT, K1=5, K2=25)
    ref = np.asarray(mk_split(1)(D, XT))
    print(json.dumps({"metric": "split_baseline", "k": k,
                      "ms": round(t_split * 1e3, 3),
                      "slot_eff_gslots_s": round(k * slots / t_split / 1e9, 1)}))

    for kb, mc in ((16, 16), (8, 32), (8, 16), (4, 64)):
        XG = interleave_panels_grouped(XT, kb, n)

        def mk_g(K, kb=kb, mc=mc):
            @jax.jit
            def f(D_, V):
                def body(i, V):
                    return dia_spmm_grouped_chunked(
                        D_.data, V, D_.graph.offsets, n, n, max_chunk=mc
                    ) * jnp.asarray(0.1, V.dtype)

                return lax.fori_loop(0, K, body, V)

            return f

        try:
            t_g = timeit_loop(mk_g, D, XG, K1=5, K2=25)
            Yg = np.asarray(deinterleave_panels_grouped(
                jnp.asarray(mk_g(1)(D, XG)), kb, k, n))
            err = float(np.max(np.abs(Yg - ref)) / np.max(np.abs(ref)))
            print(json.dumps({
                "metric": "grouped", "kb": kb, "max_chunk": mc,
                "ms": round(t_g * 1e3, 3),
                "speedup_vs_split": round(t_split / t_g, 3),
                "slot_eff_gslots_s": round(k * slots / t_g / 1e9, 1),
                "parity_err": err,
            }))
        except Exception as e:
            msg = str(e)
            print(json.dumps({
                "metric": "grouped", "kb": kb, "max_chunk": mc,
                "error": msg[:160],
            }))


if __name__ == "__main__":
    main()
