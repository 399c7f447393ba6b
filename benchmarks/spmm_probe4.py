"""Probe 4: RHS-INTERLEAVED multi-RHS DIA SpMM + k-scaling law.

Probes 1-3 (one session each, nx=216, k=4) showed every panel-separate
SpMM formulation — fused (k,T,128) blocks, k-unrolled 2-D body,
grid=(G,k) split with the proven SpMV body — lands at ~3.5 ms
(~0.88 ms/RHS) while the plain blocked SpMV runs 0.52-0.60 ms.  The
wall time tracks the number of DISTINCT BLOCK-CHUNK TRANSFERS per grid
step (k strided sub-chunks per x/y operand), not bytes and not VPU roll
shape.  Hypothesis: per-DMA-chunk overhead dominates once each operand
block decomposes into k strided chunks.

This probe measures:
  1. fused SpMM at k=1,2,4 — the per-RHS scaling law of the shipped core
  2. INTERLEAVED kernel: X stored (k*Sx, 128) with panel element-rows
     interleaved (row s*k+j = element-row s of RHS j), so every grid
     step fetches ONE contiguous x tile, 2 contiguous halos, the data
     tile, and writes one contiguous y block — the same 5-transfer
     shape as the proven SpMV kernel, at k-times the rows.  Diagonal
     values are broadcast k-fold in-kernel (jnp.repeat on sublanes).
  3. the same without the entry/exit (k,n)<->interleaved transposes
     (a block solver can keep its panels interleaved across the loop)
  4. single SpMV (session scale reference)

Usage: python benchmarks/spmm_probe4.py [--nx 216]
"""

import argparse
import functools
import os
import sys

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
)

import numpy as np


def interleave(XT, Sx):
    """(k, Sx*128) -> (k*Sx, 128) with row s*k+j = element-row s of RHS j."""
    import jax.numpy as jnp

    k = XT.shape[0]
    return jnp.transpose(XT.reshape(k, Sx, 128), (1, 0, 2)).reshape(
        k * Sx, 128
    )


def deinterleave(Y, k, n):
    import jax.numpy as jnp

    S = Y.shape[0] // k
    return jnp.transpose(Y.reshape(S, k, 128), (1, 0, 2)).reshape(k, -1)[
        :, :n
    ]


def dia_spmm_interleaved(data, XI, k, offsets, n, m, interpret=False):
    """Interleaved-panel SpMM: XI is (k*Sx, 128); returns (k*S, 128)."""
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

    assert m % _LANES == 0
    Sx = m // _LANES
    assert XI.shape == (k * Sx, _LANES)
    EBx = -(-Sx // E)
    TBx = -(-Sx // T)
    exact = (S == Sx) and (G * T == S)

    def elem_ids(rows):
        """Per-panel element index of interleaved row r = (r//k)*128+lane."""
        row = jax.lax.broadcasted_iota(jnp.int32, (k * rows, _LANES), 0)
        lane = jax.lax.broadcasted_iota(jnp.int32, (k * rows, _LANES), 1)
        return (row // k) * _LANES + lane

    def shifted(frame, q, rows):
        """(k*rows, 128) window: per-panel element shift by q."""
        rowoff = q // _LANES
        laneoff = q % _LANES
        base = frame[k * rowoff : k * rowoff + k * rows + k, :]
        if laneoff == 0:
            return base[: k * rows, :]
        rolled = pltpu.roll(base, shift=_LANES - laneoff, axis=1)
        lane = jax.lax.broadcasted_iota(jnp.int32, (k * rows, _LANES), 1)
        return jnp.where(
            lane < _LANES - laneoff,
            rolled[: k * rows, :],
            rolled[k : k * rows + k, :],
        )

    def kernel(xm_ref, xf_ref, xb_ref, d_ref, y_ref):
        i = pl.program_id(0)
        base = i * T * _LANES
        xm = xm_ref[...]
        if not exact:
            xm = jnp.where(base + elem_ids(T) < m, xm, jnp.zeros_like(xm))
        xf = xf_ref[...]
        if not exact or o_max > 0:
            xf = jnp.where(
                (i + 1) * T * _LANES + elem_ids(E) < m,
                xf,
                jnp.zeros_like(xf),
            )
        xb_idx = base - PL + elem_ids(E)
        xb = jnp.where(
            (xb_idx >= 0) & (xb_idx < m),
            xb_ref[...],
            jnp.zeros_like(xb_ref),
        )
        xcat = jnp.concatenate([xb, xm, xf], axis=0)
        acc = jnp.zeros((k * T, _LANES), y_ref.dtype)
        for d, o in enumerate(offsets):
            dk = jnp.repeat(d_ref[d].astype(acc.dtype), k, axis=0)
            acc = acc + dk * shifted(xcat, PL + o, T)
        if not exact:
            acc = jnp.where(base + elem_ids(T) < n, acc, jnp.zeros_like(acc))
        y_ref[...] = acc

    clamp_m = lambda i: (jnp.minimum(i, TBx - 1), 0)
    clamp_f = lambda i: (jnp.minimum(F * i + F, EBx - 1), 0)
    clamp_b = lambda i: (jnp.maximum(jnp.minimum(F * i - 1, EBx - 1), 0), 0)
    y2 = pl.pallas_call(
        kernel,
        grid=(G,),
        in_specs=[
            pl.BlockSpec((k * T, _LANES), clamp_m, memory_space=pltpu.VMEM),
            pl.BlockSpec((k * E, _LANES), clamp_f, memory_space=pltpu.VMEM),
            pl.BlockSpec((k * E, _LANES), clamp_b, memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (D, T, _LANES), lambda i: (0, i, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (k * T, _LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((k * S, _LANES), XI.dtype),
        compiler_params=_compiler_params(interpret),
        interpret=interpret,
    )(XI, XI, XI, data)
    return y2


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nx", type=int, default=216)
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

    nx = args.nx
    n, offsets, data_np, nnz = laplacian_3d_dia(nx)
    data = jnp.asarray(data_np.reshape(7, -1, 128))
    Sx = n // 128
    rng = np.random.default_rng(0)

    def chain(f, k):
        XT = jnp.asarray(rng.standard_normal((k, n)).astype(np.float32))

        @jax.jit
        def many(data, XT, K):
            def body(i, v):
                return f(data, v) * jnp.asarray(0.1, v.dtype)

            return lax.fori_loop(0, K, body, XT)

        def make(K):
            Kj = jnp.asarray(K, jnp.int32)
            return lambda data, _: many(data, XT, Kj)

        return make, XT

    # 1. fused SpMM scaling law
    for k in (1, 2, 4):
        make, XT = chain(
            lambda d, X: dia_spmm_rhs_major(d, X, offsets, n, n), k
        )
        s = []
        t = timeit_loop(make, data, None, reps=3, K1=20, K2=100, samples=s)
        print(
            f"fused spmm k={k}        {t*1e3:8.3f} ms  "
            f"{k*nnz/t/1e9:7.1f} G-eff  {t/k*1e3:6.3f} ms/RHS",
            flush=True,
        )

    # 2. interleaved kernel, k=4 — correctness then timing
    k = 4
    XT = jnp.asarray(rng.standard_normal((k, n)).astype(np.float32))
    jit_int = jax.jit(
        functools.partial(
            dia_spmm_interleaved, k=k, offsets=offsets, n=n, m=n
        )
    )
    y_ref = dia_spmm_rhs_major(data, XT, offsets, n, n)
    XI = interleave(XT, Sx)
    y_int = deinterleave(jit_int(data, XI), k, n)
    err = float(jnp.max(jnp.abs(y_int - y_ref)) / jnp.max(jnp.abs(y_ref)))
    print(f"interleaved vs fused rel err: {err:.2e}", flush=True)
    assert err < 1e-6

    # with entry/exit transposes (the matmat API cost)
    def full(d, X):
        return deinterleave(jit_int(d, interleave(X, Sx)), k, n)

    make, _ = chain(full, k)
    s = []
    t = timeit_loop(make, data, None, reps=3, K1=20, K2=100, samples=s)
    print(
        f"interleaved +transpose  {t*1e3:8.3f} ms  {k*nnz/t/1e9:7.1f} G-eff",
        flush=True,
    )

    # panels kept interleaved across the loop (block-solver form)
    @jax.jit
    def many_resident(data, XI, K):
        def body(i, v):
            return jit_int(data, v) * jnp.asarray(0.1, v.dtype)

        return lax.fori_loop(0, K, body, XI)

    def mk(K):
        Kj = jnp.asarray(K, jnp.int32)
        return lambda data, _: many_resident(data, XI, Kj)

    s = []
    t = timeit_loop(mk, data, None, reps=5, K1=20, K2=100, samples=s)
    print(
        f"interleaved resident    {t*1e3:8.3f} ms  {k*nnz/t/1e9:7.1f} G-eff"
        f"  spread {[round(k*nnz/x/1e9,1) for x in s]}",
        flush=True,
    )

    # 3. SpMV scale reference
    x0 = XT[0]

    @jax.jit
    def spmv_many(data, x, K):
        def body(i, v):
            return dia_spmv_pallas_blocked(
                data, v, offsets, n, n
            ) * jnp.asarray(0.1, v.dtype)

        return lax.fori_loop(0, K, body, x)

    def mk2(K):
        Kj = jnp.asarray(K, jnp.int32)
        return lambda data, _: spmv_many(data, x0, Kj)

    t = timeit_loop(mk2, data, None, reps=3, K1=20, K2=100)
    print(
        f"single spmv             {t*1e3:8.3f} ms  {nnz/t/1e9:7.1f} Gnnz/s",
        flush=True,
    )


if __name__ == "__main__":
    main()
