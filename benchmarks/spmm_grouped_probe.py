#!/usr/bin/env python
"""Hardware probe: two-level grouped-interleaved SpMM (k > 16) vs the
16-wide auto-split on the 1M-row unstructured band.

The auto-split re-streams the whole RCM band's diagonal values once per
16-wide pass; dia_spmm_grouped's outer grid axis revisits each data tile
(Mosaic skips the DMA when consecutive grid steps map the same block),
so the values stream ONCE for any k.  Model: grouped wins when
(passes-1) * D * itemsize > 16k bytes/row — at D=245, k=32 the predicted
saving is ~44% of total traffic.  Reference capability: the multi-vector
kernels /root/reference/README.md:83 names as its missing critical
optimization.

Prints one JSON line per measurement.
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
    ap.add_argument("--nrhs", type=int, default=32)
    ap.add_argument("--seed", type=int, default=0)
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

    t0 = time.time()
    H, W, k = args.height, args.width, args.nrhs
    rng = np.random.default_rng(args.seed)
    A = irregular_mesh_laplacian(H, W, rng=rng, dtype=jnp.float32)
    n = A.shape[0]
    rr, cc, vv = A.entries()
    sh = rng.permutation(n)
    A = CSRMatrix.from_coo(n, n, sh[rr], sh[cc], vv, dtype=jnp.float32)
    D, p = to_banded_dia(A)
    nnz = A.graph.nnz
    n_diags = D.graph.n_diags
    slots = n * n_diags
    print(
        f"# n={n} nnz={nnz} diags={n_diags} k={k}  [build {time.time()-t0:.1f}s]",
        file=sys.stderr,
    )
    assert D._pallas_spmm_grouped(jnp.ones((k, n), jnp.float32)) is not None, (
        "routing model declined the grouped path for this configuration"
    )

    XT = jnp.asarray(rng.standard_normal((k, n)), jnp.float32)

    # --- 16-wide auto-split (the previous k>16 route) ---------------------
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

    # --- grouped two-level kernel (values streamed once) ------------------
    def mk_grouped(K):
        @jax.jit
        def f(D_, V):
            def body(i, V):
                return D_._pallas_spmm_grouped(V) * jnp.asarray(0.1, V.dtype)

            return lax.fori_loop(0, K, body, V)

        return f

    t_grp = timeit_loop(mk_grouped, D, XT, K1=5, K2=25)

    # parity between the two routes
    Ys = np.asarray(mk_split(1)(D, XT))
    Yg = np.asarray(mk_grouped(1)(D, XT))
    err = float(np.max(np.abs(Ys - Yg)) / max(np.max(np.abs(Ys)), 1e-30))

    # resident-layout rate: panels kept grouped-interleaved across the loop
    # (what a block solver pays per iteration — no entry/exit transposes)
    from sigma_tpu.ops.spmv_pallas import (
        dia_spmm_grouped_chunked,
        interleave_panels_grouped,
    )

    XG = interleave_panels_grouped(XT, 16, n)

    def mk_resident(K):
        @jax.jit
        def f(D_, V):
            def body(i, V):
                return dia_spmm_grouped_chunked(
                    D_.data, V, D_.graph.offsets, n, n
                ) * jnp.asarray(0.1, V.dtype)

            return lax.fori_loop(0, K, body, V)

        return f

    t_res = timeit_loop(mk_resident, D, XG, K1=5, K2=25)

    print(json.dumps({
        "metric": "grouped_spmm_k" + str(k),
        "n": n,
        "n_diags": int(n_diags),
        "split_ms": round(t_split * 1e3, 3),
        "grouped_ms": round(t_grp * 1e3, 3),
        "grouped_resident_ms": round(t_res * 1e3, 3),
        "speedup": round(t_split / t_grp, 3),
        "speedup_resident": round(t_split / t_res, 3),
        "slot_eff_gslots_s_resident": round(k * slots / t_res / 1e9, 1),
        "true_eff_gnnz_s_resident": round(k * nnz / t_res / 1e9, 3),
        "parity_err": err,
    }))


if __name__ == "__main__":
    main()
