#!/usr/bin/env python
"""Probe 1-D pair-transfer formulations on TPU at the north-star size:
the V-cycle's restrict (y[i] = w*(x[2i]+x[2i+1])) and prolong
(e[2i] = e[2i+1] = w*ec[i]) are lane-interleave operations, measured
1.5 ms per round trip at 1M rows via reshape-pair (50x off memory
bound).  Candidates: reshape-pair (current), MXU matmul with 0/1
deinterleave matrices, flat (Sc,256)@(256,128) matmul.  JSON lines.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1048576)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax

    from bench import timeit_loop

    n = args.n
    Sf = n // 128
    Sc = Sf // 2
    w = np.float32(1.0 / np.sqrt(2.0))

    # deinterleave matrices: M0[k, l] = 1 iff l < 64 and k in {2l, 2l+1}
    M0 = np.zeros((128, 128), np.float32)
    M1 = np.zeros((128, 128), np.float32)
    for l in range(64):
        M0[2 * l, l] = M0[2 * l + 1, l] = 1.0
        M1[2 * l, 64 + l] = M1[2 * l + 1, 64 + l] = 1.0
    M0j, M1j = jnp.asarray(M0), jnp.asarray(M1)
    Mflat = jnp.asarray(np.concatenate([M0, M1], axis=0))  # (256, 128)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(n).astype(np.float32))

    def rt_reshape(ops, v):
        # current formulation
        rc = w * v.reshape(-1, 2).sum(-1)
        e = w * jnp.broadcast_to(rc[:, None], (rc.shape[0], 2)).reshape(-1)
        return e

    def rt_matmul(ops, v):
        M0_, M1_ = ops
        Xp = v.reshape(Sc, 2, 128)
        rc2 = w * (Xp[:, 0, :] @ M0_ + Xp[:, 1, :] @ M1_)
        # prolong: even fine rows = rc2 @ M0^T, odd = rc2 @ M1^T
        e0 = rc2 @ M0_.T
        e1 = rc2 @ M1_.T
        e = w * jnp.stack([e0, e1], axis=1).reshape(-1)
        return e

    def rt_flat(ops, v):
        (Mf,) = ops
        X = v.reshape(Sc, 256)
        rc2 = w * (X @ Mf)
        e = w * (rc2 @ Mf.T).reshape(-1)
        return e

    def loop(fn):
        def mk(K):
            @jax.jit
            def f(ops, v):
                def body(i, vv):
                    return fn(ops, vv) * jnp.asarray(0.5, vv.dtype)

                return lax.fori_loop(0, K, body, v)

            return f

        return mk

    # correctness check vs each other
    r0 = np.asarray(rt_reshape((), x))
    r1 = np.asarray(rt_matmul((M0j, M1j), x))
    r2 = np.asarray(rt_flat((Mflat,), x))
    print(f"# agree: matmul {np.abs(r0-r1).max():.2e} "
          f"flat {np.abs(r0-r2).max():.2e}", file=sys.stderr)

    for name, fn, ops in (
        ("reshape_pair", rt_reshape, ()),
        ("mxu_matmul", rt_matmul, (M0j, M1j)),
        ("flat_matmul", rt_flat, (Mflat,)),
    ):
        t = timeit_loop(loop(fn), ops, x, K1=10, K2=50)
        print(json.dumps({
            "metric": "transfer_roundtrip",
            "form": name, "n": n,
            "ms": round(t * 1e3, 3),
            "gbps_effective": round(3 * n * 4 / t / 1e9, 1),
        }))


if __name__ == "__main__":
    main()
