#!/usr/bin/env python
"""Decompose the pruned-pair-GMG V-cycle cost on hardware: time the full
cycle, each level's SpMV, the level-0 transfer round trip, and the coarse
dense apply, on the 1M-row unstructured north star.  One JSON line each.
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
    ap.add_argument("--shift", type=float, default=1e-3)
    ap.add_argument("--coarse-size", type=int, default=4096)
    args = ap.parse_args()

    from sigma_tpu.utils.util import enable_transparent_hugepages, enable_warm_heap

    enable_transparent_hugepages()
    enable_warm_heap()

    import jax
    import jax.numpy as jnp
    from jax import lax

    from bench import timeit_loop
    from sigma_tpu.apps.generators import irregular_mesh_laplacian
    from sigma_tpu.graph.permutations import reverse_cuthill_mckee
    from sigma_tpu.matrix.formats import CSRMatrix
    from sigma_tpu.matrix.pruned import PrunedDIAMatrix
    from sigma_tpu.solvers import pruned_pair_amg

    rng = np.random.default_rng(args.seed)
    A = irregular_mesh_laplacian(args.height, args.width, rng=rng,
                                 dtype=np.float32, shift=args.shift)
    n = A.shape[0]
    rr, cc, vv = A.entries()
    sh = rng.permutation(n)
    A = CSRMatrix.from_coo(n, n, sh[rr], sh[cc], vv, dtype=np.float32)
    p = reverse_cuthill_mckee(A.graph)
    rows, cols, vals = A.entries()
    pr, pc = p[rows], p[cols]
    P = PrunedDIAMatrix.from_coo(n, n, pr, pc, vals, dtype=np.float32)
    M = pruned_pair_amg(n, pr, pc, vals, coarse_size=args.coarse_size,
                        smoother="chebyshev", fine_A=P)
    print(f"# n={n} levels={len(M.levels)}", file=sys.stderr)

    r = jnp.asarray(rng.standard_normal(n).astype(np.float32))

    def loop(fn):
        def mk(K):
            @jax.jit
            def f(op, v):
                def body(i, vv):
                    return fn(op, vv) * jnp.asarray(0.1, vv.dtype)

                return lax.fori_loop(0, K, body, v)

            return f

        return mk

    t_cycle = timeit_loop(loop(lambda M_, v: M_.matvec(v)), M, r,
                          K1=5, K2=25)
    print(json.dumps({"metric": "cycle_ms", "ms": round(t_cycle * 1e3, 3)}))

    for li, lvl in enumerate(M.levels):
        nl = lvl.A.shape[0]
        rl = jnp.asarray(rng.standard_normal(nl).astype(np.float32))
        t = timeit_loop(loop(lambda A_, v: A_.matvec(v)), lvl.A, rl,
                        K1=5, K2=25)
        print(json.dumps({
            "metric": "level_spmv_ms", "level": li, "n": nl,
            "steps": lvl.A.n_steps,
            "slots_M": round(lvl.A.stored_slots / 1e6, 2),
            "ms": round(t * 1e3, 3),
        }))
        if li >= 3:
            # remaining levels: time them summed via one chained apply
            break

    # deep-tail cost: sum of level SpMVs 4..end in one jitted chain
    if len(M.levels) > 4:
        deep = M.levels[4:]

        def deep_chain(Ms, v):
            outs = []
            for lvl in Ms:
                nl = lvl.A.shape[0]
                outs.append(lvl.A.matvec(v[:nl]))
            acc = v
            for o in outs:
                acc = acc.at[: o.shape[0]].add(o)
            return acc

        vfine = jnp.asarray(
            rng.standard_normal(deep[0].A.shape[0]).astype(np.float32)
        )
        t = timeit_loop(loop(lambda Ms, v: deep_chain(Ms, v)), tuple(deep),
                        vfine, K1=5, K2=25)
        print(json.dumps({
            "metric": "deep_levels_spmv_sum_ms",
            "levels": len(deep), "ms": round(t * 1e3, 3),
        }))

    # transfer round trip at level 0 (restrict + prolong)
    lvl0 = M.levels[0]

    def rt(M_, v):
        rc, stages = M_._restrict(lvl0, v)
        return M_._prolong(lvl0, rc, stages)

    t_rt = timeit_loop(loop(rt), M, r, K1=5, K2=25)
    print(json.dumps({
        "metric": "level0_transfer_roundtrip_ms", "ms": round(t_rt * 1e3, 3)
    }))

    # coarse dense apply
    nc = M.coarse_inv.shape[0]
    rc = jnp.asarray(rng.standard_normal(nc).astype(np.float32))

    def coarse(M_, v):
        return (M_.coarse_inv @ v.astype(M_.coarse_inv.dtype)).astype(v.dtype)

    t_c = timeit_loop(loop(coarse), M, rc, K1=5, K2=25)
    print(json.dumps({
        "metric": "coarse_apply_ms", "nc": nc, "ms": round(t_c * 1e3, 3)
    }))


if __name__ == "__main__":
    main()
