"""Probe 2: why is blocked SpMM slower PER RHS than the SpMV kernel?

spmm_probe.py measured (one session, nx=216, k=4): SpMM 0.878 ms/RHS vs
SpMV 0.533 ms — and the k-unrolled 2-D-roll variant was identical to the
3-D form (hypothesis refuted).  Two remaining suspects:

  1. tile pick: k=4 panels push the working set over the 24 MB budget at
     T=1536, so the core drops to T=1024/E=512 — halo rows equal tile
     rows, so x streams 2x per RHS and the grid has 1.5x more steps.
  2. tail masks: 216^3/128 = 78732 is not a multiple of any candidate T,
     so `exact=False` and THREE (k,T,128) where-masks + the acc mask run
     on EVERY tile; in the SpMV kernel the same masks hide under the 7x
     larger per-RHS data stream.

Variants timed in one session:
  1. control: shipped `dia_spmm_rhs_major` (auto pick -> T=1024)
  2. T=1536/E=384 forced (working set ~26.7 MB est -> ~31 MB scoped,
     still far under the 64 MB limit and v5e physical VMEM)
  3. T=1536 + masks gated to boundary tiles via pl.when
  4. T=2048/E=512 forced

Usage: python benchmarks/spmm_probe2.py [--nx 216] [--k 4]
"""

import argparse
import functools
import os
import sys

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
)

import numpy as np


def variant(data, XT, offsets, n, m, T, E, gated, interpret=False):
    """Parametrized copy of `_dia_spmm_core`: forced (T, E); optionally
    gate the tail/halo masks to the tiles that need them (pl.when)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from sigma_tpu.ops.spmv_pallas import _LANES, _compiler_params, _dia3

    D = len(offsets)
    k = XT.shape[0]
    data = _dia3(data)
    S = data.shape[1]
    o_max = max(max(offsets), 0)

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

    # first tile index whose FORWARD halo (rows (i+1)T .. (i+1)T+E) can
    # touch out-of-range elements, and first tile whose own rows can
    last_full = (Sx - E) // T  # halo safe while (i+1)*T + E <= Sx
    last_tile = G - 1

    def kernel(xm_ref, xf_ref, xb_ref, d_ref, y_ref):
        i = pl.program_id(0)
        base = i * T * _LANES

        def compute(mask):
            xm = xm_ref[...]
            xf = xf_ref[...]
            xb = xb_ref[...]
            if mask:
                if not exact:
                    xm = jnp.where(
                        (base + elem_ids(T) < m)[None], xm, jnp.zeros_like(xm)
                    )
                if not exact or o_max > 0:
                    xf = jnp.where(
                        ((i + 1) * T * _LANES + elem_ids(E) < m)[None],
                        xf,
                        jnp.zeros_like(xf),
                    )
            xb_idx = base - PL + elem_ids(E)
            xb = jnp.where(
                ((xb_idx >= 0) & (xb_idx < m))[None],
                xb,
                jnp.zeros_like(xb),
            )
            xcat = jnp.concatenate([xb, xm, xf], axis=1)
            acc = jnp.zeros((k, T, _LANES), dtype=y_ref.dtype)
            for d, o in enumerate(offsets):
                q = PL + o
                rowoff = q // _LANES
                laneoff = q % _LANES
                base3 = xcat[:, rowoff : rowoff + T + 1, :]
                if laneoff == 0:
                    win = base3[:, :T, :]
                else:
                    rolled = pltpu.roll(base3, shift=_LANES - laneoff, axis=2)
                    lane = jax.lax.broadcasted_iota(jnp.int32, (k, T, _LANES), 2)
                    win = jnp.where(
                        lane < _LANES - laneoff,
                        rolled[:, :T, :],
                        rolled[:, 1 : T + 1, :],
                    )
                acc = acc + d_ref[d][None].astype(acc.dtype) * win
            if mask and not exact:
                acc = jnp.where(
                    (base + elem_ids(T) < n)[None], acc, jnp.zeros_like(acc)
                )
            y_ref[...] = acc

        if not gated:
            compute(mask=True)
        else:
            # interior tiles skip every tail mask; boundary tiles keep them
            @pl.when(i < last_full)
            def _():
                compute(mask=False)

            @pl.when(i >= last_full)
            def _():
                compute(mask=True)

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

    y_ref = dia_spmm_rhs_major(data, XT, offsets, n, n)

    def make_variant(T, E, gated):
        return jax.jit(
            functools.partial(
                variant, offsets=offsets, n=n, m=n, T=T, E=E, gated=gated
            )
        )

    rows = [
        ("control auto-pick", lambda d, X: dia_spmm_rhs_major(d, X, offsets, n, n)),
        ("T=1536 E=384", make_variant(1536, 384, False)),
        ("T=1536 gated masks", make_variant(1536, 384, True)),
        ("T=2048 E=512", make_variant(2048, 512, False)),
        ("T=2048 gated masks", make_variant(2048, 512, True)),
    ]

    fns = {}
    for name, f in rows:
        try:
            y = f(data, XT)
            err = float(jnp.max(jnp.abs(y - y_ref)) / jnp.max(jnp.abs(y_ref)))
            print(f"{name:22s} rel err vs control: {err:.2e}", flush=True)
            assert err < 1e-6, name
            fns[name] = f
        except Exception as e:  # noqa: BLE001 - report and continue
            print(f"{name:22s} FAILED: {type(e).__name__}: {str(e)[:200]}")

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

    for name, f in fns.items():
        s = []
        t = timeit_loop(chain(f), data, XT, reps=5, K1=20, K2=100, samples=s)
        eff = k * nnz / t / 1e9
        print(
            f"{name:22s} {t*1e3:8.3f} ms  {eff:7.1f} G-eff  "
            f"spread {[round(k*nnz/x/1e9,1) for x in s]}",
            flush=True,
        )

    # in-session SpMV scale reference
    x0 = XT[0]

    @jax.jit
    def spmv_many(data, x, K):
        def body(i, v):
            return dia_spmv_pallas_blocked(data, v, offsets, n, n) * jnp.asarray(
                0.1, v.dtype
            )

        return lax.fori_loop(0, K, body, x)

    def mk(K):
        Kj = jnp.asarray(K, jnp.int32)
        return lambda data, _: spmv_many(data, x0, Kj)

    t = timeit_loop(mk, data, XT, reps=3, K1=20, K2=100)
    print(f"{'single spmv':22s} {t*1e3:8.3f} ms  {nnz/t/1e9:7.1f} Gnnz/s", flush=True)


if __name__ == "__main__":
    main()
