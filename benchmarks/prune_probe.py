#!/usr/bin/env python
"""Occupancy-attack probe (round 4, host-only): measure how much a
row-tile x diagonal-slab pruning of the chunked wide-band kernel COULD
save on the unstructured north-star matrix, before building it.

For the 1M-row shuffled irregular-mesh Laplacian after RCM
(benchmarks/unstructured.py), computes per row block of B rows:
  - the envelope [min active diag index, max active diag index]
    (what contiguous-slab pruning can exploit), and
  - the exact count of active diagonals (what full per-block
    compaction could exploit),
and reports the achievable slot-traffic reduction for each.

Prints one JSON line per block size.
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--height", type=int, default=16384)
    ap.add_argument("--width", type=int, default=64)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--method", default="rcm", choices=["rcm", "bfs", "aligned"])
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")

    from sigma_tpu.apps.generators import irregular_mesh_laplacian
    from sigma_tpu.matrix.banded import to_banded_dia
    from sigma_tpu.matrix.formats import CSRMatrix

    rng = np.random.default_rng(args.seed)
    A = irregular_mesh_laplacian(args.height, args.width, rng=rng,
                                 dtype=np.float32)
    n = A.shape[0]
    rr, cc, vv = A.entries()
    sh = rng.permutation(n)
    A = CSRMatrix.from_coo(n, n, sh[rr], sh[cc], vv, dtype=np.float32)
    nnz = A.graph.nnz

    D, p = to_banded_dia(A, method=args.method)
    offsets = np.asarray(D.graph.offsets)
    ndiag = offsets.size
    npad = D.shape[0]

    rows2, cols2, _ = A.entries()
    pr, pc = p[rows2], p[cols2]
    diag_idx = np.searchsorted(offsets, pc - pr)  # offsets sorted

    print(json.dumps({
        "metric": "prune_probe_band",
        "method": args.method,
        "n": int(n), "n_padded": int(npad), "nnz": int(nnz),
        "n_diags": int(ndiag),
        "occupancy": round(nnz / (npad * ndiag), 5),
    }))

    for B in (1024, 4096, 16384, 65536, 131072, 393216):
        blk = pr // B
        nblk = int(blk.max()) + 1
        # per-block min/max/count of active diagonal indices
        lo = np.full(nblk, ndiag, np.int64)
        hi = np.full(nblk, -1, np.int64)
        np.minimum.at(lo, blk, diag_idx)
        np.maximum.at(hi, blk, diag_idx)
        env = np.where(hi >= lo, hi - lo + 1, 0)
        # exact active count per block
        key = blk * ndiag + diag_idx
        uniq = np.unique(key)
        exact = np.bincount(uniq // ndiag, minlength=nblk)
        rows_per_blk = np.full(nblk, B)
        rows_per_blk[-1] = npad - (nblk - 1) * B
        full_slots = float(ndiag) * npad
        env_slots = float((env * rows_per_blk).sum())
        ex_slots = float((exact * rows_per_blk).sum())
        print(json.dumps({
            "metric": "prune_probe",
            "block_rows": B,
            "blocks": int(nblk),
            "envelope_diags_mean": round(float(env.mean()), 1),
            "envelope_diags_p90": int(np.percentile(env, 90)),
            "exact_diags_mean": round(float(exact.mean()), 1),
            "envelope_traffic_ratio": round(env_slots / full_slots, 4),
            "exact_traffic_ratio": round(ex_slots / full_slots, 4),
            "envelope_speedup_bound": round(full_slots / max(env_slots, 1), 2),
            "exact_speedup_bound": round(full_slots / max(ex_slots, 1), 2),
        }))


if __name__ == "__main__":
    main()
