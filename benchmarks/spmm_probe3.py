"""Probe 3: grid-split multi-RHS DIA SpMM.

spmm_probe.py / spmm_probe2.py established (one session each, nx=216,
k=4): the fused (k, T, 128)-block SpMM runs ~0.87 ms/RHS regardless of
tile pick, tail-mask gating, or 2-D vs 3-D roll form, while the plain
blocked SpMV runs 0.49-0.53 ms — i.e. the fused kernel is ~1.7x slower
per RHS than simply calling the SpMV k times, despite streaming the
diagonal data once instead of k times.

Untried formulation: put the RHS index in the pallas GRID —
``grid=(G, k)`` with k innermost — so every grid step executes the
PROVEN 2-D SpMV body on one (T, 128) panel of one RHS.  The data tile's
index map ``(i, j) -> (0, i, 0)`` is constant across the k inner steps,
so Mosaic's pipeline skips the re-fetch: data streams ONCE per row tile
(the SpMM traffic model) while the per-step compute stays the shape the
VPU demonstrably executes at speed.

Usage: python benchmarks/spmm_probe3.py [--nx 216] [--k 4]
"""

import argparse
import functools
import os
import sys

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
)

import numpy as np


def grid_split(data, XT, offsets, n, m, interpret=False):
    """RHS-in-grid SpMM: grid=(G, k), 2-D SpMV body per step."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from sigma_tpu.ops.spmv_pallas import (
        _LANES,
        _compiler_params,
        _dia3,
        _full_tile_pick,
    )

    D = len(offsets)
    k = XT.shape[0]
    data = _dia3(data)
    S = data.shape[1]
    o_min = min(min(offsets), 0)
    o_max = max(max(offsets), 0)
    hrows = max(-o_min, o_max) // _LANES + 2

    pick = _full_tile_pick(S, hrows, D, data.dtype.itemsize)
    if pick is None:
        raise ValueError("does not fit")
    T, E = pick
    F = T // E
    G = -(-S // T)
    PL = E * _LANES

    assert m % _LANES == 0
    Sx = m // _LANES
    X3 = XT.reshape(k, Sx, _LANES)
    EBx = -(-Sx // E)
    TBx = -(-Sx // T)
    exact = (S == Sx) and (G * T == S)

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
        xm = xm_ref[0]
        if not exact:
            xm = jnp.where(base + elem_ids(T) < m, xm, jnp.zeros_like(xm))
        xf = xf_ref[0]
        if not exact or o_max > 0:
            xf = jnp.where(
                (i + 1) * T * _LANES + elem_ids(E) < m,
                xf,
                jnp.zeros_like(xf),
            )
        xb_idx = base - PL + elem_ids(E)
        xb = jnp.where(
            (xb_idx >= 0) & (xb_idx < m),
            xb_ref[0],
            jnp.zeros_like(xb_ref[0]),
        )
        xcat = jnp.concatenate([xb, xm, xf], axis=0)
        acc = jnp.zeros((T, _LANES), y_ref.dtype)
        for d, o in enumerate(offsets):
            acc = acc + d_ref[d].astype(acc.dtype) * shifted(xcat, PL + o, T)
        if not exact:
            acc = jnp.where(base + elem_ids(T) < n, acc, jnp.zeros_like(acc))
        y_ref[0] = acc

    clamp_m = lambda i, j: (j, jnp.minimum(i, TBx - 1), 0)
    clamp_f = lambda i, j: (j, jnp.minimum(F * i + F, EBx - 1), 0)
    clamp_b = lambda i, j: (
        j,
        jnp.maximum(jnp.minimum(F * i - 1, EBx - 1), 0),
        0,
    )
    y3 = pl.pallas_call(
        kernel,
        grid=(G, k),
        in_specs=[
            pl.BlockSpec((1, T, _LANES), clamp_m, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, E, _LANES), clamp_f, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, E, _LANES), clamp_b, memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (D, T, _LANES),
                lambda i, j: (0, i, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, T, _LANES), lambda i, j: (j, i, 0), memory_space=pltpu.VMEM
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

    jit_split = jax.jit(
        functools.partial(grid_split, offsets=offsets, n=n, m=n)
    )
    y_cur = dia_spmm_rhs_major(data, XT, offsets, n, n)
    y_new = jit_split(data, XT)
    err = float(jnp.max(jnp.abs(y_cur - y_new)) / jnp.max(jnp.abs(y_cur)))
    print(f"grid-split vs current rel err: {err:.2e}", flush=True)
    assert err < 1e-6

    def chain(f):
        @jax.jit
        def many(data, XT, K):
            def body(i, v):
                return f(data, v) * jnp.asarray(0.1, v.dtype)

            return lax.fori_loop(0, K, body, XT)

        def make(K):
            Kj = jnp.asarray(K, jnp.int32)
            return lambda data, XT: many(data, XT, Kj)

        return make

    rows = [
        (
            "current fused spmm",
            chain(lambda d, X: dia_spmm_rhs_major(d, X, offsets, n, n)),
        ),
        ("grid-split spmm", chain(jit_split)),
        (
            "k back-to-back spmv",
            chain(
                lambda d, X: jnp.stack(
                    [
                        dia_spmv_pallas_blocked(d, X[j], offsets, n, n)
                        for j in range(k)
                    ]
                )
            ),
        ),
    ]
    for name, make in rows:
        s = []
        t = timeit_loop(make, data, XT, reps=5, K1=20, K2=100, samples=s)
        print(
            f"{name:22s} {t*1e3:8.3f} ms  {k*nnz/t/1e9:7.1f} G-eff  "
            f"spread {[round(k*nnz/x/1e9,1) for x in s]}",
            flush=True,
        )

    x0 = XT[0]

    @jax.jit
    def spmv_many(data, x, K):
        def body(i, v):
            return dia_spmv_pallas_blocked(
                data, v, offsets, n, n
            ) * jnp.asarray(0.1, v.dtype)

        return lax.fori_loop(0, K, body, x)

    def mk(K):
        Kj = jnp.asarray(K, jnp.int32)
        return lambda data, _: spmv_many(data, x0, Kj)

    t = timeit_loop(mk, data, XT, reps=3, K1=20, K2=100)
    print(
        f"{'single spmv':22s} {t*1e3:8.3f} ms  {nnz/t/1e9:7.1f} Gnnz/s",
        flush=True,
    )


if __name__ == "__main__":
    main()
