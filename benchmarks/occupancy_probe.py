#!/usr/bin/env python
"""Local-occupancy attack probe (VERDICT r04 item 2): orderings that
minimize LOCAL (per-row-tile) bandwidth x pruning granularity, measured
as (occupancy, true Gnnz/s) on the 1M-row shuffled irregular mesh.

Axes:
- ordering: RCM (global-bandwidth baseline), Sloan (wavefront ~ local
  active-diagonal count; C++ native.sloan_order), BFS;
- tile_rows: 16384 (default) down to 1024 — finer tiles prune more
  zeros (each (tile, diag) block spans fewer rows) at the cost of more
  grid steps and more group padding.

Per configuration: per-tile active-diagonal stats, packed occupancy
(nnz/slots) at group 1 (pure) and the kernel group, and the hardware
SpMV rate.  One JSON line each.
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
    ap.add_argument("--tiles", default="16384,4096,2048,1024")
    ap.add_argument("--group", type=int, default=8)
    ap.add_argument("--orderings", default="rcm,sloan,bfs")
    ap.add_argument("--no-hw", action="store_true",
                    help="occupancy stats only (no TPU timing)")
    args = ap.parse_args()

    from sigma_tpu.utils.util import enable_transparent_hugepages, enable_warm_heap

    enable_transparent_hugepages()
    enable_warm_heap()

    from sigma_tpu import native
    from sigma_tpu.apps.generators import irregular_mesh_laplacian_coo
    from sigma_tpu.ops.spmv_pruned import build_pruned_plan

    rng = np.random.default_rng(args.seed)
    n, rows, cols, vals = irregular_mesh_laplacian_coo(
        args.height, args.width, rng=rng, shift=1.0, shuffle=True
    )
    nnz = rows.size
    adj_c, indptr = native.adjacency_from_coo(n, rows, cols)

    perms = {}
    for name in args.orderings.split(","):
        t0 = time.time()
        if name == "rcm":
            p = native.rcm_order(indptr, adj_c)
        elif name == "sloan":
            p = native.sloan_order(indptr, adj_c)
        elif name == "bfs":
            p = native.bfs_order(indptr, adj_c)
        else:
            raise SystemExit(f"unknown ordering {name}")
        perms[name] = (np.asarray(p, np.int64), time.time() - t0)

    if not args.no_hw:
        import jax
        import jax.numpy as jnp
        from jax import lax

        from bench import timeit_loop
        from sigma_tpu.ops.spmv_pruned import dia_spmv_pallas_pruned

    for name, (p, t_ord) in perms.items():
        pr, pc = p[rows], p[cols]
        offs = pc - pr
        bw = int(np.abs(offs).max())
        for tile_rows in [int(s) for s in args.tiles.split(",")]:
            # exact active (tile, diag) count at this granularity
            tile_of = pr // tile_rows
            key = tile_of * np.int64(4 * bw + 3) + (offs + bw)
            n_active = np.unique(key).size
            occ_pure = nnz / (n_active * tile_rows)
            t0 = time.time()
            plan = build_pruned_plan(
                n, n, pr, pc, vals.astype(np.float32),
                tile_rows=tile_rows, group=args.group, dtype=np.float32,
            )
            t_pack = time.time() - t0
            rec = {
                "metric": "occupancy_probe",
                "ordering": name,
                "order_s": round(t_ord, 1),
                "bandwidth": bw,
                "tile_rows": tile_rows,
                "active_blocks": int(n_active),
                "avg_active_diags_per_tile": round(
                    n_active / max(-(-n // tile_rows), 1), 1
                ),
                "occ_pure": round(occ_pure, 4),
                "occ_packed": round(nnz / plan.data.size, 4),
                "slots_M": round(plan.data.size / 1e6, 1),
                "pack_s": round(t_pack, 1),
            }
            if not args.no_hw:
                data = jnp.asarray(
                    plan.data.reshape(plan.L, plan.C, plan.T, 128)
                )
                tile = jnp.asarray(plan.tile)
                first = jnp.asarray(plan.first)
                ro = jnp.asarray(plan.rowoff)
                lo = jnp.asarray(plan.laneoff)
                kw = dict(T=plan.T, E=plan.E, C=plan.C, n=n, m=n)
                x = jnp.asarray(
                    rng.standard_normal(n).astype(np.float32)
                )

                def mk(K):
                    @jax.jit
                    def f(data, x_, tile, first, ro, lo):
                        def body(i, vv):
                            return dia_spmv_pallas_pruned(
                                data, vv, tile, first, ro, lo, **kw
                            ) * jnp.asarray(0.1, vv.dtype)

                        return lax.fori_loop(0, K, body, x_)

                    return f

                try:
                    t = timeit_loop(mk, data, x, tile, first, ro, lo,
                                    K1=50, K2=400)
                    rec["true_gnnz_s"] = round(nnz / t / 1e9, 2)
                    rec["slot_gnnz_s"] = round(
                        plan.data.size / t / 1e9, 2
                    )
                except Exception as e:
                    rec["error"] = f"{type(e).__name__}: {e}"[:200]
            print(json.dumps(rec))


if __name__ == "__main__":
    main()
