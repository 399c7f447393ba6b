#!/usr/bin/env python
"""Single-chip proxy for the halo-before-local overlap claim
(VERDICT r04 item 7; `parallel/dist.py` issues ppermute halos before
the local kernel so XLA can overlap the ICI hop with ring-0 compute —
design-by-argument until now, since only one chip exists here).

Two measurements:

1. SCHEDULING probe (hardware): does XLA on this stack actually run an
   independent async HBM copy CONCURRENTLY with a pallas kernel?  Time
   t(kernel), t(copy), and t(one jitted program computing both);
   overlap_fraction = (t_k + t_c - t_both) / min(t_k, t_c).  An ICI
   DMA uses a separate engine from the kernel's HBM streams, so the
   measured HBM-copy overlap is a LOWER bound on ICI-hop overlap
   (HBM copy and kernel contend for the same bandwidth; ICI does not).

2. ANALYTIC per-ring table from measured quantities: per-shard local
   kernel time (measured on the real chip at the per-shard problem
   size), exact halo words per ring from the distributed layouts, ICI
   time at the public v5e per-link bandwidth (~186 GB/s per direction,
   1-2 us latency), and the hidden fraction
   min(t_local, t_halo) / t_halo under the issued-first schedule.

One JSON line per row.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

ICI_GBPS = 186.0  # v5e per-link per-direction (public spec)
ICI_LAT_US = 2.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--height", type=int, default=16384)
    ap.add_argument("--width", type=int, default=64)
    ap.add_argument("--copy-mb", default="8,64",
                    help="comma list; <16 MB stays VMEM-resident "
                         "(engine-overlap probe), larger is HBM-bound "
                         "(bandwidth-conservation probe)")
    ap.add_argument("--shards", type=int, default=8)
    args = ap.parse_args()

    from sigma_tpu.utils.util import enable_transparent_hugepages, enable_warm_heap

    enable_transparent_hugepages()
    enable_warm_heap()

    import jax
    import jax.numpy as jnp
    from jax import lax

    from bench import timeit_loop
    from sigma_tpu.apps.generators import irregular_mesh_laplacian_coo
    from sigma_tpu.matrix.banded import reorder_triples_rcm
    from sigma_tpu.matrix.pruned import PrunedDIAMatrix

    rng = np.random.default_rng(0)
    n, rows, cols, vals = irregular_mesh_laplacian_coo(
        args.height, args.width, rng=rng, shift=1.0, shuffle=True
    )
    nnz = rows.size
    pr, pc, vals, _p = reorder_triples_rcm(n, rows, cols, vals)
    P = PrunedDIAMatrix.from_coo(n, n, pr, pc, vals, dtype=np.float32,
                                 assume_unique=True)
    x = jnp.asarray(rng.standard_normal(n).astype(np.float32))

    def mk_k(K):
        @jax.jit
        def f(M_, x_, b_):
            def body(i, vv):
                return M_.matvec(vv) * jnp.asarray(0.1, vv.dtype)

            return lax.fori_loop(0, K, body, x_)

        return f

    # the copy workload is jnp.roll — genuine whole-buffer data
    # movement every iteration (a constant-multiply body gets
    # strength-reduced by XLA to a closed form: measured K=50 and
    # K=400 identical wall)
    def mk_c(K):
        @jax.jit
        def f(M_, x_, b_):
            def body(i, bb):
                return jnp.roll(bb, 1)

            return lax.fori_loop(0, K, body, b_)

        return f

    def mk_both(K):
        @jax.jit
        def f(M_, x_, b_):
            def body(i, carry):
                vv, bb = carry
                return (
                    M_.matvec(vv) * jnp.asarray(0.1, vv.dtype),
                    jnp.roll(bb, 1),
                )

            return lax.fori_loop(0, K, body, (x_, b_))

        return f

    for mb in [float(s) for s in str(args.copy_mb).split(",")]:
        nbuf = int(mb * 1e6 / 4)
        buf = jnp.asarray(rng.standard_normal(nbuf).astype(np.float32))
        t_k = timeit_loop(mk_k, P, x, buf, K1=50, K2=400)
        t_c = timeit_loop(mk_c, P, x, buf, K1=50, K2=400)
        t_b = timeit_loop(mk_both, P, x, buf, K1=50, K2=400)
        ov = (t_k + t_c - t_b) / max(min(t_k, t_c), 1e-12)
        print(json.dumps({
            "metric": "overlap_probe_scheduling",
            "kernel_ms": round(t_k * 1e3, 3),
            "work_ms": round(t_c * 1e3, 3),
            "both_ms": round(t_b * 1e3, 3),
            "work_mb": mb,
            "regime": "vmem_resident" if mb * 1e6 < 16e6 else "hbm_bound",
            "overlap_fraction": round(float(ov), 3),
            "note": "VMEM-resident work measures whether XLA schedules "
                    "independent ops concurrently with a pallas kernel "
                    "(>=1 = fully hidden); HBM-bound work measures "
                    "bandwidth conservation (expected ~0 on ONE HBM — "
                    "an ICI DMA is a separate resource, like the "
                    "VMEM case)",
        }))

    # analytic per-ring table for the distributed layouts at D shards
    D = args.shards
    t_local = t_k / D  # per-shard local kernel time (1/D of the rows)
    # pruned layout: 2 nearest-neighbor hops of Hw words each
    Hw = P.halo * 128
    for name, rings in (
        ("pruned", [("x+1", Hw), ("x-1", Hw)]),
        # wide-band DIA layout at 10M/979-diag scale ships one full
        # block per nonzero ring offset (see dryrun wideband path)
        ("wideband_dia_3ring", [(f"ring{k}", n // D) for k in (1, 2, 3)]),
    ):
        rows_out = []
        for ring, words in rings:
            t_halo = words * 4 / (ICI_GBPS * 1e9) + ICI_LAT_US * 1e-6
            hidden = min(t_local, t_halo) / t_halo
            rows_out.append({
                "ring": ring, "halo_kb": round(words * 4 / 1e3, 1),
                "t_halo_us": round(t_halo * 1e6, 1),
                "hidden_fraction_if_overlapped": round(hidden, 3),
            })
        print(json.dumps({
            "metric": "overlap_probe_ring_model",
            "layout": name,
            "shards": D,
            "t_local_per_shard_us": round(t_local * 1e6, 1),
            "ici_gbps_assumed": ICI_GBPS,
            "rings": rows_out,
        }))


if __name__ == "__main__":
    main()
