#!/usr/bin/env python
"""Unstructured north star through the PRUNED block-DIA pipeline, at any
scale up to 10M+ rows on one chip: shuffled irregular-mesh Laplacian ->
RCM -> PrunedDIAMatrix (the full DIA band is never built) -> pruned
SpMV / CG / pruned-pair-AMG-preconditioned CG, f32 and bf16.

The full-band pipeline (benchmarks/unstructured.py) stops at ~1M rows:
245 stored diagonals x 10.1M rows = 10.3 GB of DIA values (HBM + an
int32 flat-position overflow); the pruned layout packs the same matrix
into ~1-2 GB and the setup is O(nnz) host work.  Prints one JSON line
per measurement.
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
    ap.add_argument("--height", type=int, default=157696)
    ap.add_argument("--width", type=int, default=64)
    ap.add_argument("--iters", type=int, default=300, help="CG maxiter")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--tile-rows", type=int, default=16384)
    ap.add_argument("--group", type=int, default=8)
    ap.add_argument("--bf16", action="store_true")
    ap.add_argument("--gmg", action="store_true")
    ap.add_argument("--shift", type=float, default=1.0)
    ap.add_argument("--coarse-size", type=int, default=4096)
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
    from sigma_tpu.graph.permutations import reverse_cuthill_mckee
    from sigma_tpu.matrix.formats import CSRMatrix
    from sigma_tpu.matrix.pruned import PrunedDIAMatrix
    from sigma_tpu.solvers import cg_solve, pruned_pair_amg

    H, W = args.height, args.width
    rng = np.random.default_rng(args.seed)
    t0 = time.time()
    A = irregular_mesh_laplacian(H, W, rng=rng, dtype=np.float32,
                                 shift=args.shift)
    n = A.shape[0]
    rr, cc, vv = A.entries()
    sh = rng.permutation(n)
    t_gen = time.time() - t0
    t0 = time.time()
    A = CSRMatrix.from_coo(n, n, sh[rr], sh[cc], vv, dtype=np.float32)
    nnz = int(A.graph.nnz)
    t_csr = time.time() - t0
    print(f"# n={n} nnz={nnz} [gen {t_gen:.0f}s csr {t_csr:.0f}s]",
          file=sys.stderr)

    t0 = time.time()
    p = reverse_cuthill_mckee(A.graph)
    t_rcm = time.time() - t0
    rows, cols, vals = A.entries()
    pr, pc = p[rows], p[cols]
    offs = pc - pr
    n_diags = int(np.unique(offs).size)
    bw = int(np.abs(offs).max())
    occ = nnz / (float(n_diags) * n)
    print(json.dumps({
        "metric": "unstructured_pruned_band",
        "n": n, "nnz": nnz,
        "bandwidth_after_rcm": bw, "n_diags": n_diags,
        "occupancy": round(occ, 5),
        "full_dia_gb": round(n_diags * (-(-n // 128) * 128) * 4 / 1e9, 2),
        "gen_s": round(t_gen, 1), "csr_build_s": round(t_csr, 1),
        "rcm_s": round(t_rcm, 1),
    }))

    t0 = time.time()
    P = PrunedDIAMatrix.from_coo(
        n, n, pr, pc, vals, dtype=np.float32,
        tile_rows=args.tile_rows, group=args.group,
    )
    t_pack = time.time() - t0
    print(json.dumps({
        "metric": "unstructured_pruned_pack",
        "tile_rows": args.tile_rows, "group": args.group,
        "steps": P.n_steps, "stored_slots_M": round(P.stored_slots / 1e6, 1),
        "packed_gb": round(P.stored_slots * 4 / 1e9, 2),
        "local_occupancy": round(nnz / P.stored_slots, 4),
        "pack_s": round(t_pack, 1),
    }))

    x = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    mats = [("f32", P)]
    if args.bf16:
        mats.append(("bf16", P.astype(jnp.bfloat16)))
    times = {}
    for name, M in mats:
        def mk(K):
            @jax.jit
            def f(M_, x_):
                def body(i, vv):
                    return M_.matvec(vv) * jnp.asarray(0.1, vv.dtype)

                return lax.fori_loop(0, K, body, x_)

            return f

        t = timeit_loop(mk, M, x, K1=30, K2=200)
        times[name] = t
        print(json.dumps({
            "metric": f"unstructured_pruned_spmv_{name}",
            "true_gnnz_s": round(nnz / t / 1e9, 3),
            "slot_gnnz_s": round(P.stored_slots / t / 1e9, 2),
            "ms_per_spmv": round(t * 1e3, 3),
        }))

    # CG in the permuted frame
    xstar = np.sin(np.arange(n) * 0.001).astype(np.float32)
    b = np.asarray(A.matvec(jnp.asarray(xstar)))
    b_p = np.empty_like(b)
    b_p[p] = b
    b_p = jnp.asarray(b_p)
    bnorm = float(np.linalg.norm(np.asarray(b)))
    solve = jax.jit(
        lambda M_, bb: cg_solve(M_, bb, tol=0.0, rtol=1e-6,
                                maxiter=args.iters)
    )
    xp, info = solve(P, b_p)
    float(info.residual_norm)
    t0 = time.time()
    xp, info = solve(P, b_p)
    resn = float(info.residual_norm)
    t_warm = time.time() - t0
    err = float(np.abs(np.asarray(xp)[p] - xstar).max())
    it0 = int(info.iterations)
    print(json.dumps({
        "metric": "unstructured_pruned_cg",
        "iterations": it0,
        "relative_residual": f"{resn / bnorm:.3e}",
        "max_err_vs_manufactured": f"{err:.3e}",
        "wall_s_warm": round(t_warm, 2),
        "s_per_iteration": round(t_warm / max(it0, 1), 4),
    }))

    if args.gmg:
        t0 = time.time()
        Mg = pruned_pair_amg(
            n, pr, pc, vals, coarse_size=args.coarse_size,
            smoother="chebyshev",
            tile_rows=args.tile_rows, group=args.group, fine_A=P,
        )
        setup_g = time.time() - t0
        solve_g = jax.jit(
            lambda M_, bb, Mg_: cg_solve(
                M_, bb, tol=0.0, rtol=1e-6, maxiter=args.iters, M=Mg_
            )
        )
        xg, infog = solve_g(P, b_p, Mg)
        float(infog.residual_norm)
        t0 = time.time()
        xg, infog = solve_g(P, b_p, Mg)
        resg = float(infog.residual_norm)
        tg = time.time() - t0
        print(json.dumps({
            "metric": "unstructured_pruned_cg_gmg",
            "levels": len(Mg.levels),
            "setup_s": round(setup_g, 1),
            "iterations": int(infog.iterations),
            "relative_residual": f"{resg / bnorm:.3e}",
            "wall_s_warm": round(tg, 2),
            "speedup_vs_plain": round(t_warm / max(tg, 1e-9), 2),
        }))
        if args.bf16:
            t0 = time.time()
            Mgb = pruned_pair_amg(
                n, pr, pc, vals, coarse_size=args.coarse_size,
                smoother="chebyshev", level_dtype=jnp.bfloat16,
                tile_rows=args.tile_rows, group=args.group, fine_A=P,
            )
            setup_gb = time.time() - t0
            xgb, infogb = solve_g(P, b_p, Mgb)
            float(infogb.residual_norm)
            t0 = time.time()
            xgb, infogb = solve_g(P, b_p, Mgb)
            resgb = float(infogb.residual_norm)
            tgb = time.time() - t0
            print(json.dumps({
                "metric": "unstructured_pruned_cg_gmg_bf16levels",
                "setup_s": round(setup_gb, 1),
                "iterations": int(infogb.iterations),
                "relative_residual": f"{resgb / bnorm:.3e}",
                "wall_s_warm": round(tgb, 2),
                "speedup_vs_plain": round(t_warm / max(tgb, 1e-9), 2),
            }))


if __name__ == "__main__":
    main()
