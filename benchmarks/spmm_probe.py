"""Probe: multi-RHS DIA SpMM formulations on the real chip.

The shipped zero-construction SpMM core (`_dia_spmm_core`) measured
76-81 effective Gnnz/s at the north star (BENCHMARKS.md) — BELOW k
back-to-back blocked SpMVs at 133+ Gnnz/s each.  Hypothesis: Mosaic
lowers the per-diagonal `pltpu.roll` + lane-select on 3-D (k, T+1, 128)
arrays much worse than the proven 2-D (T+1, 128) form used by the SpMV
kernel.  This probe times, in ONE session:

  1. current `dia_spmm_rhs_major` (3-D rolls)
  2. experimental k-unrolled variant (2-D rolls per RHS, shared data tile)
  3. k back-to-back `dia_spmv_pallas_blocked` calls + stack
  4. single SpMV (scale reference)

Usage: python benchmarks/spmm_probe.py [--nx 216] [--k 4]
"""

import argparse
import functools
import os
import sys

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
)

import numpy as np


def variant_unrolled(data, XT, offsets, n, m, interpret=False):
    """k-unrolled 2-D-ops SpMM kernel: same BlockSpec structure as
    `_dia_spmm_core`, but the kernel body loops RHS panels and does all
    window math on 2-D (rows, 128) arrays."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from sigma_tpu.ops.spmv_pallas import (
        _LANES,
        _compiler_params,
        _dia3,
        _spmm_tile_pick,
    )

    D = len(offsets)
    k = XT.shape[0]
    data = _dia3(data)
    S = data.shape[1]
    o_min = min(min(offsets), 0)
    o_max = max(max(offsets), 0)
    hrows = max(-o_min, o_max) // _LANES + 2

    pick = _spmm_tile_pick(S, hrows, D, data.dtype.itemsize, k=k)
    if pick is None:
        raise ValueError("does not fit")
    T, E = pick
    F = T // E
    G = -(-S // T)
    PL = E * _LANES

    if m % _LANES == 0:
        Sx = m // _LANES
        X3 = XT.reshape(k, Sx, _LANES)
    else:
        Sx = -(-m // _LANES)
        X3 = jnp.concatenate(
            [XT, jnp.zeros((k, Sx * _LANES - m), XT.dtype)], axis=1
        ).reshape(k, Sx, _LANES)
    EBx = -(-Sx // E)
    TBx = -(-Sx // T)
    exact = (m % _LANES == 0) and (S == Sx) and (G * T == S)

    def elem_ids(rows):
        row = jax.lax.broadcasted_iota(jnp.int32, (rows, _LANES), 0)
        lane = jax.lax.broadcasted_iota(jnp.int32, (rows, _LANES), 1)
        return row * _LANES + lane

    def shifted(frame, q, rows):
        rowoff = q // _LANES
        laneoff = q % _LANES
        base = frame[rowoff : rowoff + rows + 1, :]
        if laneoff == 0:
            return base[:rows, :]
        rolled = pltpu.roll(base, shift=_LANES - laneoff, axis=1)
        lane = jax.lax.broadcasted_iota(jnp.int32, (rows, _LANES), 1)
        return jnp.where(
            lane < _LANES - laneoff, rolled[:rows, :], rolled[1 : rows + 1, :]
        )

    def kernel(xm_ref, xf_ref, xb_ref, d_ref, y_ref):
        i = pl.program_id(0)
        base = i * T * _LANES
        xb_idx = base - PL + elem_ids(E)
        for j in range(k):
            xm = xm_ref[j]
            if not exact:
                xm = jnp.where(
                    base + elem_ids(T) < m, xm, jnp.zeros_like(xm)
                )
            xf = xf_ref[j]
            if not exact or o_max > 0:
                xf = jnp.where(
                    (i + 1) * T * _LANES + elem_ids(E) < m,
                    xf,
                    jnp.zeros_like(xf),
                )
            xb = jnp.where(
                (xb_idx >= 0) & (xb_idx < m),
                xb_ref[j],
                jnp.zeros_like(xb_ref[j]),
            )
            xcat = jnp.concatenate([xb, xm, xf], axis=0)
            acc = jnp.zeros((T, _LANES), y_ref.dtype)
            for d, o in enumerate(offsets):
                acc = acc + d_ref[d].astype(acc.dtype) * shifted(
                    xcat, PL + o, T
                )
            if not exact:
                acc = jnp.where(
                    base + elem_ids(T) < n, acc, jnp.zeros_like(acc)
                )
            y_ref[j] = acc

    clamp_m = lambda i: (0, jnp.minimum(i, TBx - 1), 0)
    clamp_f = lambda i: (0, jnp.minimum(F * i + F, EBx - 1), 0)
    clamp_b = lambda i: (
        0,
        jnp.maximum(jnp.minimum(F * i - 1, EBx - 1), 0),
        0,
    )
    y3 = pl.pallas_call(
        kernel,
        grid=(G,),
        in_specs=[
            pl.BlockSpec((k, T, _LANES), clamp_m, memory_space=pltpu.VMEM),
            pl.BlockSpec((k, E, _LANES), clamp_f, memory_space=pltpu.VMEM),
            pl.BlockSpec((k, E, _LANES), clamp_b, memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (D, T, _LANES), lambda i: (0, i, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (k, T, _LANES), lambda i: (0, i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((k, S, _LANES), XT.dtype),
        compiler_params=_compiler_params(interpret),
        interpret=interpret,
    )(X3, X3, X3, data)
    Y = y3.reshape(k, S * _LANES)
    return Y if S * _LANES == n else Y[:, :n]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nx", type=int, default=216)
    ap.add_argument("--k", type=int, default=4)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax

    print("devices:", jax.devices(), flush=True)

    from bench import laplacian_3d_dia, timeit_loop
    from sigma_tpu.ops.spmv_pallas import (
        dia_spmm_rhs_major,
        dia_spmv_pallas_blocked,
    )

    nx, k = args.nx, args.k
    n, offsets, data_np, nnz = laplacian_3d_dia(nx)
    data = jnp.asarray(data_np.reshape(7, -1, 128))
    rng = np.random.default_rng(0)
    XT = jnp.asarray(rng.standard_normal((k, n)).astype(np.float32))

    # correctness cross-check: unrolled vs current
    jit_unrolled = jax.jit(
        functools.partial(variant_unrolled, offsets=offsets, n=n, m=n)
    )
    y_cur = dia_spmm_rhs_major(data, XT, offsets, n, n)
    y_new = jit_unrolled(data, XT)
    err = float(
        jnp.max(jnp.abs(y_cur - y_new)) / jnp.max(jnp.abs(y_cur))
    )
    print(f"unrolled vs current rel err: {err:.2e}", flush=True)
    assert err < 1e-6

    def chain_spmm(f):
        @jax.jit
        def many(data, XT, K):
            def body(i, v):
                return f(data, v, offsets, n, n) * jnp.asarray(0.1, v.dtype)

            return lax.fori_loop(0, K, body, XT)

        def make(K):
            Kj = jnp.asarray(K, jnp.int32)
            return lambda data, XT: many(data, XT, Kj)

        return make

    def chain_unrolled():
        @jax.jit
        def many(data, XT, K):
            def body(i, v):
                return variant_unrolled(data, v, offsets, n, n) * jnp.asarray(
                    0.1, v.dtype
                )

            return lax.fori_loop(0, K, body, XT)

        def make(K):
            Kj = jnp.asarray(K, jnp.int32)
            return lambda data, XT: many(data, XT, Kj)

        return make

    def chain_backtoback():
        @jax.jit
        def many(data, XT, K):
            def body(i, v):
                ys = [
                    dia_spmv_pallas_blocked(data, v[j], offsets, n, n)
                    for j in range(k)
                ]
                return jnp.stack(ys) * jnp.asarray(0.1, v.dtype)

            return lax.fori_loop(0, K, body, XT)

        def make(K):
            Kj = jnp.asarray(K, jnp.int32)
            return lambda data, XT: many(data, XT, Kj)

        return make

    def chain_spmv():
        x = XT[0]

        @jax.jit
        def many(data, x, K):
            def body(i, v):
                return dia_spmv_pallas_blocked(
                    data, v, offsets, n, n
                ) * jnp.asarray(0.1, v.dtype)

            return lax.fori_loop(0, K, body, x)

        def make(K):
            Kj = jnp.asarray(K, jnp.int32)
            return lambda data, _: many(data, x, Kj)

        return make

    rows = [
        ("current 3-D-roll spmm", chain_spmm(dia_spmm_rhs_major)),
        ("k-unrolled 2-D spmm", chain_unrolled()),
        ("k back-to-back spmv", chain_backtoback()),
        ("single spmv", chain_spmv()),
    ]
    for name, make in rows:
        s = []
        t = timeit_loop(make, data, XT, reps=5, K1=20, K2=100, samples=s)
        eff = k * nnz / t / 1e9 if "spmv" != name else nnz / t / 1e9
        if name == "single spmv":
            eff = nnz / t / 1e9
        print(
            f"{name:26s} {t*1e3:8.3f} ms  {eff:7.1f} G-eff  "
            f"spread {[round(k*nnz/x/1e9,1) for x in s]}",
            flush=True,
        )


if __name__ == "__main__":
    main()
