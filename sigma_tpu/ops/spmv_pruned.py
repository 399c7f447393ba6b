"""Locally-pruned wide-band DIA SpMV: the occupancy attack.

The chunked wide-band kernel (:mod:`sigma_tpu.ops.spmv_pallas`) streams
every stored diagonal over EVERY row — after an RCM reorder of an
irregular mesh the band is globally wide (hundreds of diagonals) but
locally narrow, so ~85-95% of the streamed slots are structural zeros
(measured: benchmarks/prune_probe.py — per-row-block EXACT active-diagonal
counts are 6-25x below the global diagonal count, while the contiguous
ENVELOPE is only ~1.8x below it, so slab-granular pruning is not enough;
only exact (row-tile x diagonal) compaction moves the true-nnz rate).

This module implements that compaction as a TPU-native kernel pair:

- storage: only the ACTIVE (row-tile, diagonal) blocks are kept, packed
  linearly as ``data[slot, T, 128]`` in (tile, offset) order — the HBM
  value stream is exactly the compacted size and perfectly sequential;
- kernel: ONE flat pallas grid over the packed slots (grouped ``C`` per
  step).  Scalar-prefetch arrays give each step its row tile and each
  slot its window shift; x tiles and halos arrive through the same
  clamped BlockSpec index maps as the blocked kernel (zero-construction,
  no manual DMA — which faults this axon stack), and consecutive steps
  of one tile revisit the same x/y blocks so the pipeline elides their
  copies.  The per-slot diagonal shift is DYNAMIC (``pltpu.roll`` with a
  traced shift + a dynamic sublane slice), which is what frees the grid
  from the one-unrolled-loop-per-diagonal structure of the full kernel —
  compile time is O(C), not O(n_diags).

Re-designs the any-pattern hot kernel of the reference
(``/root/reference/src/matrix/formats/cs_matrices.f90:600-622``) for the
case its CSR row loop handles implicitly: locally-varying sparsity.  The
matrix-side entry point is :class:`sigma_tpu.matrix.pruned.PrunedDIAMatrix`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

__all__ = [
    "build_pruned_plan",
    "dia_spmv_pallas_pruned",
    "dia_spmm_pruned_rhs_major",
    "dia_sym_spmv_pallas_pruned",
    "dia_sym_spmm_pruned_rhs_major",
    "pruned_matvec_reference",
    "pruned_sym_matvec_reference",
    "PrunedPlan",
]

_LANES = 128
# int32 literal for BlockSpec index maps: a python 0 lowers to an i64
# constant under jax_enable_x64 and Mosaic rejects the transform func
_Z = np.int32(0)


class PrunedPlan:
    """Host-side product of :func:`build_pruned_plan` — the packed value
    array plus the prefetch arrays the kernel consumes.  Plain numpy; the
    matrix class owns moving these to device."""

    __slots__ = (
        "data", "tile", "first", "rowoff", "laneoff",
        "T", "E", "C", "L", "n", "m", "n_slots_active",
    )

    def __init__(self, **kw):
        for k in self.__slots__:
            setattr(self, k, kw[k])


def _pick_halo(T: int, hrows: int):
    """Halo block height E (sublane rows): smallest multiple of 8 that
    covers the band's one-sided reach and tiles T exactly (E | T), or
    E == T when the reach needs the whole-tile halo.  None when the
    reach exceeds one tile — callers must raise T."""
    for e in range(8, T + 1, 8):
        if e >= hrows and T % e == 0:
            return e
    if T >= hrows:
        return T
    return None


def build_pruned_plan(
    n, m, rows, cols, vals, *, tile_rows=16384, group=8, dtype=np.float32,
    min_reach=0,
) -> PrunedPlan:
    """Pack COO entries into the pruned block-DIA layout.

    ``tile_rows``: pruning granularity (rows per tile; multiple of 1024
    = 8 sublanes x 128 lanes).  Finer tiles store fewer zeros but run
    more grid steps; 16384 is the measured balance point at ~1M rows.
    ``group``: slots fetched per grid step (per-tile slot counts are
    padded up to a multiple; padding slots hold zero values, so they
    are numerically inert).

    Ordering contract: slots are sorted by (tile, diagonal offset), the
    same per-row accumulation order as the full blocked kernel, so
    results match it bitwise whenever one step covers a whole tile.

    ``min_reach``: floor on the band reach used to size the halo (E) —
    the distributed layer passes a mesh-global reach so every shard's
    plan shares one (T, E, C) and stacks into a single shard_map
    program.
    """
    if tile_rows % 1024:
        raise ValueError("tile_rows must be a multiple of 1024")
    rows = np.asarray(rows, dtype=np.int64).ravel()
    cols = np.asarray(cols, dtype=np.int64).ravel()
    vals = np.asarray(vals).ravel()
    n, m = int(n), int(m if m is not None else n)
    offs = cols - rows
    reach = int(max(offs.max(initial=0), -offs.min(initial=0), min_reach))
    hrows = reach // _LANES + 2
    T = tile_rows // _LANES
    while _pick_halo(T, hrows) is None:
        T *= 2  # band reach exceeds the tile: widen until the halo fits
    E = _pick_halo(T, hrows)
    C = int(group)
    S = -(-n // _LANES)  # sublane rows of y
    G = -(-S // T)  # row tiles

    if np.dtype(dtype) == np.float32:
        # C++ fast path: radix sort + one-pass fill (the numpy
        # np.unique/scatter construction below is page-fault/sort-bound
        # at 10M rows; measured in BENCHMARKS.md round 4)
        from sigma_tpu import native

        packed = native.pack_pruned(
            rows, cols, vals, tile_rows=T * _LANES, group=C, reach=reach,
            n_tiles=G, E=E,
        )
        if packed is not None:
            data, tile, first, rowoff, laneoff, L, n_active = packed
            return PrunedPlan(
                data=data.reshape(L * C, T, _LANES), tile=tile,
                first=first, rowoff=rowoff, laneoff=laneoff,
                T=T, E=E, C=C, L=L, n=n, m=m,
                n_slots_active=n_active,
            )

    tile_of = rows // (T * _LANES)
    # unique (tile, offset) pairs in (tile, offset) order
    key = tile_of * (4 * (reach + 1) + 1) + (offs + reach)
    ukey, inv = np.unique(key, return_inverse=True)
    utile = ukey // (4 * (reach + 1) + 1)
    uoff = ukey % (4 * (reach + 1) + 1) - reach
    # slot index per unique pair, padded per tile to a multiple of C;
    # tiles with no active pair still get one (all-padding) step
    cnt = np.bincount(utile, minlength=G)
    steps = np.maximum(-(-cnt // C), 1)
    slot_base = np.concatenate([[0], np.cumsum(steps * C)])[:-1]
    L = int(steps.sum())
    Lc = L * C
    within = np.arange(ukey.size) - np.concatenate([[0], np.cumsum(cnt)])[:-1][utile]
    uslot = slot_base[utile] + within

    rowoff = np.full(Lc, E, dtype=np.int32)  # padding slots: offset 0
    laneoff = np.zeros(Lc, dtype=np.int32)
    q = E * _LANES + uoff
    rowoff[uslot] = (q // _LANES).astype(np.int32)
    laneoff[uslot] = (q % _LANES).astype(np.int32)

    step_tile = np.repeat(np.arange(G, dtype=np.int32), steps)
    first = np.zeros(L, dtype=np.int32)
    first[np.concatenate([[0], np.cumsum(steps)])[:-1]] = 1

    data = np.zeros((Lc, T, _LANES), dtype=dtype)
    r_local = rows - tile_of * (T * _LANES)
    flat = uslot[inv] * (T * _LANES) + r_local
    data.reshape(-1)[flat] = vals.astype(dtype)

    return PrunedPlan(
        data=data, tile=step_tile, first=first,
        rowoff=rowoff, laneoff=laneoff,
        T=T, E=E, C=C, L=L, n=n, m=m, n_slots_active=int(ukey.size),
    )


@functools.partial(
    jax.jit, static_argnames=("T", "E", "C", "n", "m", "interpret")
)
def dia_spmv_pallas_pruned(
    data, x, tile, first, rowoff, laneoff, *, T, E, C, n, m, interpret=False
):
    """SpMV over the pruned block-DIA layout (see module docstring).

    ``data``: (L, C, T, 128) packed active blocks; ``tile``/``first``:
    (L,) int32 per-step row tile and first-step flag; ``rowoff``/
    ``laneoff``: (L*C,) int32 per-slot window position into the haloed
    x frame (q = E*128 + offset).  Returns y of length ``n``.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    L = data.shape[0]
    assert data.shape[1:] == (C, T, _LANES)
    S = -(-n // _LANES)
    G = -(-S // T)
    PL = E * _LANES

    if m % _LANES == 0:
        Sx = m // _LANES
        xrows = x.reshape(Sx, _LANES)
    else:
        Sx = -(-m // _LANES)
        xrows = jnp.concatenate(
            [x, jnp.zeros((Sx * _LANES - m,), x.dtype)]
        ).reshape(Sx, _LANES)
    F = T // E
    EBx = -(-Sx // E)
    TBx = -(-Sx // T)

    c128 = np.int32(_LANES)

    def elem_ids(rows):
        row = lax.broadcasted_iota(jnp.int32, (rows, _LANES), 0)
        lane = lax.broadcasted_iota(jnp.int32, (rows, _LANES), 1)
        return row * c128 + lane

    def kernel(
        tile_r, first_r, ro_r, lo_r, xm_ref, xf_ref, xb_ref, d_ref,
        y_ref, xc_ref,
    ):
        s = pl.program_id(0)
        t = tile_r[s]
        base = t * np.int32(T * _LANES)

        # stage the masked, haloed x frame into VMEM scratch ONCE per
        # tile (Mosaic cannot dynamic-slice a value, only a ref; the
        # scratch also persists across the tile's steps, so the masking
        # work is amortized with the pipeline's elided x copies)
        @pl.when(first_r[s] == 1)
        def _():
            xm = xm_ref[...]
            xm = jnp.where(base + elem_ids(T) < m, xm, jnp.zeros_like(xm))
            xf = jnp.where(
                base + np.int32(T * _LANES) + elem_ids(E) < m,
                xf_ref[...],
                jnp.zeros_like(xf_ref),
            )
            xb_idx = base - np.int32(PL) + elem_ids(E)
            xb = jnp.where(
                (xb_idx >= 0) & (xb_idx < m),
                xb_ref[...],
                jnp.zeros_like(xb_ref),
            )
            xc_ref[0:E, :] = xb
            xc_ref[E : E + T, :] = xm
            xc_ref[E + T :, :] = xf

        acc = jnp.zeros((T, _LANES), y_ref.dtype)
        for c in range(C):
            ro = ro_r[s * np.int32(C) + np.int32(c)]
            lo = lo_r[s * np.int32(C) + np.int32(c)]
            basewin = xc_ref[pl.ds(ro, T + 1), :]
            rolled = pltpu.roll(
                basewin, shift=lax.rem(c128 - lo, c128), axis=1
            )
            lane = lax.broadcasted_iota(jnp.int32, (T, _LANES), 1)
            win = jnp.where(
                lane < c128 - lo, rolled[:T, :], rolled[1 : T + 1, :]
            )
            acc = acc + d_ref[0, c].astype(acc.dtype) * win

        @pl.when(first_r[s] == 1)
        def _():
            y_ref[...] = acc

        @pl.when(first_r[s] == 0)
        def _():
            y_ref[...] = y_ref[...] + acc

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(L,),
        in_specs=[
            pl.BlockSpec(
                (T, _LANES),
                lambda s, tr, fr, rr, lr: (jnp.minimum(tr[s], TBx - 1), _Z),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (E, _LANES),
                lambda s, tr, fr, rr, lr: (
                    jnp.minimum(F * tr[s] + F, EBx - 1),
                    _Z,
                ),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (E, _LANES),
                lambda s, tr, fr, rr, lr: (
                    jnp.maximum(jnp.minimum(F * tr[s] - 1, EBx - 1), _Z),
                    _Z,
                ),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, C, T, _LANES),
                lambda s, tr, fr, rr, lr: (s, _Z, _Z, _Z),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (T, _LANES),
            lambda s, tr, fr, rr, lr: (tr[s], _Z),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[pltpu.VMEM((T + 2 * E, _LANES), x.dtype)],
    )
    compiler_params = None
    if not interpret:
        from sigma_tpu.ops.spmv_pallas import _compiler_params

        compiler_params = _compiler_params(interpret)
    y2 = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((G * T, _LANES), x.dtype),
        compiler_params=compiler_params,
        interpret=interpret,
    )(tile, first, rowoff, laneoff, xrows, xrows, xrows, data)
    return y2.reshape(-1)[:n]


@functools.partial(
    jax.jit, static_argnames=("T", "E", "C", "n", "m", "interpret")
)
def dia_spmm_pruned_rhs_major(
    data, XT, tile, first, rowoff, laneoff, *, T, E, C, n, m,
    interpret=False,
):
    """Multi-RHS pruned SpMM, RHS-major: ``XT`` is (k, m); returns
    (k, n).  The packed value stream (the dominant HBM term) is read
    ONCE for all k right-hand sides — per-slot work is one k-deep roll
    + select + FMA, so per-RHS cost approaches 1/k of the SpMV
    (measured: the multi-RHS capability the reference names as a missing
    critical optimization, README.md:83)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    L = data.shape[0]
    k = XT.shape[0]
    assert data.shape[1:] == (C, T, _LANES)
    S = -(-n // _LANES)
    G = -(-S // T)
    PL = E * _LANES

    if m % _LANES == 0:
        Sx = m // _LANES
        xrows = XT.reshape(k, Sx, _LANES)
    else:
        Sx = -(-m // _LANES)
        xrows = jnp.concatenate(
            [XT, jnp.zeros((k, Sx * _LANES - m), XT.dtype)], axis=1
        ).reshape(k, Sx, _LANES)
    F = T // E
    EBx = -(-Sx // E)
    TBx = -(-Sx // T)
    c128 = np.int32(_LANES)

    def elem_ids(rows):
        row = lax.broadcasted_iota(jnp.int32, (1, rows, _LANES), 1)
        lane = lax.broadcasted_iota(jnp.int32, (1, rows, _LANES), 2)
        return row * c128 + lane

    def kernel(
        tile_r, first_r, ro_r, lo_r, xm_ref, xf_ref, xb_ref, d_ref,
        y_ref, xc_ref,
    ):
        s = pl.program_id(0)
        t = tile_r[s]
        base = t * np.int32(T * _LANES)

        @pl.when(first_r[s] == 1)
        def _():
            xm = xm_ref[...]
            xm = jnp.where(base + elem_ids(T) < m, xm, jnp.zeros_like(xm))
            xf = jnp.where(
                base + np.int32(T * _LANES) + elem_ids(E) < m,
                xf_ref[...],
                jnp.zeros_like(xf_ref),
            )
            xb_idx = base - np.int32(PL) + elem_ids(E)
            xb = jnp.where(
                (xb_idx >= 0) & (xb_idx < m),
                xb_ref[...],
                jnp.zeros_like(xb_ref),
            )
            xc_ref[:, 0:E, :] = xb
            xc_ref[:, E : E + T, :] = xm
            xc_ref[:, E + T :, :] = xf

        acc = jnp.zeros((k, T, _LANES), y_ref.dtype)
        for c in range(C):
            ro = ro_r[s * np.int32(C) + np.int32(c)]
            lo = lo_r[s * np.int32(C) + np.int32(c)]
            basewin = xc_ref[:, pl.ds(ro, T + 1), :]
            rolled = pltpu.roll(
                basewin, shift=lax.rem(c128 - lo, c128), axis=2
            )
            lane = lax.broadcasted_iota(jnp.int32, (k, T, _LANES), 2)
            win = jnp.where(
                lane < c128 - lo,
                rolled[:, :T, :],
                rolled[:, 1 : T + 1, :],
            )
            acc = acc + d_ref[0, c][None].astype(acc.dtype) * win

        @pl.when(first_r[s] == 1)
        def _():
            y_ref[...] = acc

        @pl.when(first_r[s] == 0)
        def _():
            y_ref[...] = y_ref[...] + acc

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(L,),
        in_specs=[
            pl.BlockSpec(
                (k, T, _LANES),
                lambda s, tr, fr, rr, lr: (_Z, jnp.minimum(tr[s], TBx - 1), _Z),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (k, E, _LANES),
                lambda s, tr, fr, rr, lr: (
                    _Z,
                    jnp.minimum(F * tr[s] + F, EBx - 1),
                    _Z,
                ),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (k, E, _LANES),
                lambda s, tr, fr, rr, lr: (
                    _Z,
                    jnp.maximum(jnp.minimum(F * tr[s] - 1, EBx - 1), _Z),
                    _Z,
                ),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, C, T, _LANES),
                lambda s, tr, fr, rr, lr: (s, _Z, _Z, _Z),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (k, T, _LANES),
            lambda s, tr, fr, rr, lr: (_Z, tr[s], _Z),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[pltpu.VMEM((k, T + 2 * E, _LANES), XT.dtype)],
    )
    compiler_params = None
    if not interpret:
        from sigma_tpu.ops.spmv_pallas import _compiler_params

        compiler_params = _compiler_params(interpret)
    y3 = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((k, G * T, _LANES), XT.dtype),
        compiler_params=compiler_params,
        interpret=interpret,
    )(tile, first, rowoff, laneoff, xrows, xrows, xrows, data)
    return y3.reshape(k, -1)[:, :n]


@functools.partial(
    jax.jit,
    static_argnames=("T", "E", "C", "n", "m", "sym_shift", "interpret"),
)
def dia_sym_spmv_pallas_pruned(
    data, x, tile, first, rowoff, laneoff, *, T, E, C, n, m,
    sym_shift=0, interpret=False,
):
    """SYMMETRIC-storage pruned SpMV: ``data`` packs only the slots with
    diagonal offset >= ``sym_shift`` (upper triangle + main); the lower
    triangle is applied in-kernel as a mirror pass — per slot,
    ``z = d * x(tile rows)`` is staged into a zero-framed VMEM scratch
    and re-read through a window shifted DOWN by the slot's mirror
    offset ``om = offset - sym_shift`` (``y[i+om] += d[i] * x[i]``).
    The window's lane split conveniently mirrors the upper read's:
    ``lo' = (128 - lo) % 128`` and the roll shift is ``lo`` itself.

    Mirror contributions past the tile's last row land in a second
    output — a per-tile (E, 128) forward-SPILL block — and an XLA
    post-add folds tile ``t``'s spill into tile ``t+1``'s head rows.
    Returns ``(y, last_spill)``: ``last_spill`` (the final tile's spill,
    flattened to E*128) is all-zero for a whole square matrix but is the
    cross-shard halo contribution for the distributed layout, which
    ships it to the next shard on the ring (the transpose-scatter
    duality of ``cs_matrices.f90:148-149`` restricted to the mirror
    term).

    ``sym_shift`` (static, a multiple of 128) re-bases the symmetry
    axis: the distributed rectangular blocks store local columns shifted
    by the halo width ``Hw``, so their "upper triangle" is
    ``offset >= Hw`` and the mirror offset is ``offset - Hw`` — passing
    ``sym_shift=Hw`` makes this kernel serve them with bitwise-identical
    per-slot arithmetic to the single-device ``sym_shift=0`` call.

    HBM value traffic halves vs the full pruned kernel (the reference
    names symmetric storage a missing "critical optimization",
    ``/root/reference/README.md:81-87``); per-slot VPU work roughly
    triples (stage + two window reads), measured net ~1.5-1.9x on
    HBM-bound operators.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    L = data.shape[0]
    assert data.shape[1:] == (C, T, _LANES)
    assert sym_shift % _LANES == 0
    if n % (T * _LANES) and n != m:
        # spill contract: last_spill carries mirror rows past the last
        # TILE (G*T*128), while rectangular (m > n) callers need rows
        # past n — misaligned tiles would silently drop cross-boundary
        # contributions into the [n, G*T*128) trim (review finding).
        # Square operators are safe: no column >= n exists, so no
        # mirror row >= n exists either.
        raise ValueError(
            f"symmetric pruned kernel on a rectangular block needs n "
            f"({n}) to be a multiple of the tile ({T * _LANES}) so the "
            "spill aligns with the block boundary"
        )
    SS = sym_shift // _LANES
    S = -(-n // _LANES)
    G = -(-S // T)
    PL = E * _LANES

    if m % _LANES == 0:
        Sx = m // _LANES
        xrows = x.reshape(Sx, _LANES)
    else:
        Sx = -(-m // _LANES)
        xrows = jnp.concatenate(
            [x, jnp.zeros((Sx * _LANES - m,), x.dtype)]
        ).reshape(Sx, _LANES)
    F = T // E
    EBx = -(-Sx // E)
    TBx = -(-Sx // T)

    c128 = np.int32(_LANES)

    def elem_ids(rows):
        row = lax.broadcasted_iota(jnp.int32, (rows, _LANES), 0)
        lane = lax.broadcasted_iota(jnp.int32, (rows, _LANES), 1)
        return row * c128 + lane

    def kernel(
        tile_r, first_r, ro_r, lo_r, xm_ref, xf_ref, xb_ref, d_ref,
        y_ref, sp_ref, xc_ref, zc_ref,
    ):
        s = pl.program_id(0)
        t = tile_r[s]
        base = t * np.int32(T * _LANES)

        # zero the z-frame halos ONCE (slots overwrite only [E, E+T))
        @pl.when(s == 0)
        def _():
            zc_ref[0:E, :] = jnp.zeros((E, _LANES), x.dtype)
            zc_ref[E + T :, :] = jnp.zeros((E, _LANES), x.dtype)

        @pl.when(first_r[s] == 1)
        def _():
            xm = xm_ref[...]
            xm = jnp.where(base + elem_ids(T) < m, xm, jnp.zeros_like(xm))
            xf = jnp.where(
                base + np.int32(T * _LANES) + elem_ids(E) < m,
                xf_ref[...],
                jnp.zeros_like(xf_ref),
            )
            xb_idx = base - np.int32(PL) + elem_ids(E)
            xb = jnp.where(
                (xb_idx >= 0) & (xb_idx < m),
                xb_ref[...],
                jnp.zeros_like(xb_ref),
            )
            xc_ref[0:E, :] = xb
            xc_ref[E : E + T, :] = xm
            xc_ref[E + T :, :] = xf

        acc = jnp.zeros((T, _LANES), y_ref.dtype)
        accs = jnp.zeros((E, _LANES), y_ref.dtype)
        for c in range(C):
            ro = ro_r[s * np.int32(C) + np.int32(c)]
            lo = lo_r[s * np.int32(C) + np.int32(c)]
            dval = d_ref[0, c].astype(acc.dtype)
            # upper + main term: window read at q = ro*128 + lo
            basewin = xc_ref[pl.ds(ro, T + 1), :]
            rolled = pltpu.roll(
                basewin, shift=lax.rem(c128 - lo, c128), axis=1
            )
            lane = lax.broadcasted_iota(jnp.int32, (T, _LANES), 1)
            win = jnp.where(
                lane < c128 - lo, rolled[:T, :], rolled[1 : T + 1, :]
            )
            acc = acc + dval * win
            # mirror term: z = d * x(tile rows), read back shifted down
            # by om = q - E*128 - sym_shift (gated om > 0; padding slots
            # sit at q = E*128 -> om = -sym_shift <= 0, inert)
            q = ro * c128 + lo
            om = q - np.int32(E * _LANES + sym_shift)
            z = dval * xc_ref[E + SS : E + SS + T, :]
            zc_ref[E : E + T, :] = jnp.where(
                om > 0, z, jnp.zeros_like(z)
            )
            qp = np.int32(2 * E * _LANES + sym_shift) - q
            rop = jnp.minimum(
                jnp.maximum(qp // c128, np.int32(0)), np.int32(E - 1)
            )
            lop = lax.rem(qp, c128)  # == (128 - lo) % 128
            bw2 = zc_ref[pl.ds(rop, T + E + 1), :]
            rolled2 = pltpu.roll(
                bw2, shift=lax.rem(c128 - lop, c128), axis=1
            )
            lane2 = lax.broadcasted_iota(
                jnp.int32, (T + E, _LANES), 1
            )
            win2 = jnp.where(
                lane2 < c128 - lop,
                rolled2[: T + E, :],
                rolled2[1 : T + E + 1, :],
            )
            acc = acc + win2[:T, :]
            accs = accs + win2[T:, :]

        @pl.when(first_r[s] == 1)
        def _():
            y_ref[...] = acc
            sp_ref[0] = accs

        @pl.when(first_r[s] == 0)
        def _():
            y_ref[...] = y_ref[...] + acc
            sp_ref[0] = sp_ref[0] + accs

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(L,),
        in_specs=[
            pl.BlockSpec(
                (T, _LANES),
                lambda s, tr, fr, rr, lr: (jnp.minimum(tr[s], TBx - 1), _Z),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (E, _LANES),
                lambda s, tr, fr, rr, lr: (
                    jnp.minimum(F * tr[s] + F, EBx - 1),
                    _Z,
                ),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (E, _LANES),
                lambda s, tr, fr, rr, lr: (
                    jnp.maximum(jnp.minimum(F * tr[s] - 1, EBx - 1), _Z),
                    _Z,
                ),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, C, T, _LANES),
                lambda s, tr, fr, rr, lr: (s, _Z, _Z, _Z),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (T, _LANES),
                lambda s, tr, fr, rr, lr: (tr[s], _Z),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, E, _LANES),
                lambda s, tr, fr, rr, lr: (tr[s], _Z, _Z),
                memory_space=pltpu.VMEM,
            ),
        ],
        scratch_shapes=[
            pltpu.VMEM((T + 2 * E, _LANES), x.dtype),
            pltpu.VMEM((T + 2 * E, _LANES), x.dtype),
        ],
    )
    compiler_params = None
    if not interpret:
        from sigma_tpu.ops.spmv_pallas import _compiler_params

        compiler_params = _compiler_params(interpret)
    y2, sp = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((G * T, _LANES), x.dtype),
            jax.ShapeDtypeStruct((G, E, _LANES), x.dtype),
        ],
        compiler_params=compiler_params,
        interpret=interpret,
    )(tile, first, rowoff, laneoff, xrows, xrows, xrows, data)
    # fold tile t's forward spill into tile t+1's head rows
    y3 = y2.reshape(G, T, _LANES)
    y3 = y3.at[1:, :E, :].add(sp[:-1])
    return y3.reshape(-1)[:n], sp[G - 1].reshape(-1)


@functools.partial(
    jax.jit,
    static_argnames=("T", "E", "C", "n", "m", "sym_shift", "interpret"),
)
def dia_sym_spmm_pruned_rhs_major(
    data, XT, tile, first, rowoff, laneoff, *, T, E, C, n, m,
    sym_shift=0, interpret=False,
):
    """Multi-RHS symmetric pruned SpMM, RHS-major (``XT`` is (k, m)):
    the halved packed value stream of :func:`dia_sym_spmv_pallas_pruned`
    read ONCE for all k right-hand sides.  Returns ``((k, n) Y,
    (k, E*128) last_spill)``."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    L = data.shape[0]
    k = XT.shape[0]
    assert data.shape[1:] == (C, T, _LANES)
    assert sym_shift % _LANES == 0
    if n % (T * _LANES) and n != m:
        raise ValueError(
            f"symmetric pruned kernel on a rectangular block needs n "
            f"({n}) to be a multiple of the tile ({T * _LANES}) so the "
            "spill aligns with the block boundary"
        )
    SS = sym_shift // _LANES
    S = -(-n // _LANES)
    G = -(-S // T)
    PL = E * _LANES

    if m % _LANES == 0:
        Sx = m // _LANES
        xrows = XT.reshape(k, Sx, _LANES)
    else:
        Sx = -(-m // _LANES)
        xrows = jnp.concatenate(
            [XT, jnp.zeros((k, Sx * _LANES - m), XT.dtype)], axis=1
        ).reshape(k, Sx, _LANES)
    F = T // E
    EBx = -(-Sx // E)
    TBx = -(-Sx // T)
    c128 = np.int32(_LANES)

    def elem_ids(rows):
        row = lax.broadcasted_iota(jnp.int32, (1, rows, _LANES), 1)
        lane = lax.broadcasted_iota(jnp.int32, (1, rows, _LANES), 2)
        return row * c128 + lane

    def kernel(
        tile_r, first_r, ro_r, lo_r, xm_ref, xf_ref, xb_ref, d_ref,
        y_ref, sp_ref, xc_ref, zc_ref,
    ):
        s = pl.program_id(0)
        t = tile_r[s]
        base = t * np.int32(T * _LANES)

        @pl.when(s == 0)
        def _():
            zc_ref[:, 0:E, :] = jnp.zeros((k, E, _LANES), XT.dtype)
            zc_ref[:, E + T :, :] = jnp.zeros((k, E, _LANES), XT.dtype)

        @pl.when(first_r[s] == 1)
        def _():
            xm = xm_ref[...]
            xm = jnp.where(base + elem_ids(T) < m, xm, jnp.zeros_like(xm))
            xf = jnp.where(
                base + np.int32(T * _LANES) + elem_ids(E) < m,
                xf_ref[...],
                jnp.zeros_like(xf_ref),
            )
            xb_idx = base - np.int32(PL) + elem_ids(E)
            xb = jnp.where(
                (xb_idx >= 0) & (xb_idx < m),
                xb_ref[...],
                jnp.zeros_like(xb_ref),
            )
            xc_ref[:, 0:E, :] = xb
            xc_ref[:, E : E + T, :] = xm
            xc_ref[:, E + T :, :] = xf

        acc = jnp.zeros((k, T, _LANES), y_ref.dtype)
        accs = jnp.zeros((k, E, _LANES), y_ref.dtype)
        for c in range(C):
            ro = ro_r[s * np.int32(C) + np.int32(c)]
            lo = lo_r[s * np.int32(C) + np.int32(c)]
            dval = d_ref[0, c][None].astype(acc.dtype)
            basewin = xc_ref[:, pl.ds(ro, T + 1), :]
            rolled = pltpu.roll(
                basewin, shift=lax.rem(c128 - lo, c128), axis=2
            )
            lane = lax.broadcasted_iota(jnp.int32, (k, T, _LANES), 2)
            win = jnp.where(
                lane < c128 - lo,
                rolled[:, :T, :],
                rolled[:, 1 : T + 1, :],
            )
            acc = acc + dval * win
            q = ro * c128 + lo
            om = q - np.int32(E * _LANES + sym_shift)
            z = dval * xc_ref[:, E + SS : E + SS + T, :]
            zc_ref[:, E : E + T, :] = jnp.where(
                om > 0, z, jnp.zeros_like(z)
            )
            qp = np.int32(2 * E * _LANES + sym_shift) - q
            rop = jnp.minimum(
                jnp.maximum(qp // c128, np.int32(0)), np.int32(E - 1)
            )
            lop = lax.rem(qp, c128)
            bw2 = zc_ref[:, pl.ds(rop, T + E + 1), :]
            rolled2 = pltpu.roll(
                bw2, shift=lax.rem(c128 - lop, c128), axis=2
            )
            lane2 = lax.broadcasted_iota(
                jnp.int32, (k, T + E, _LANES), 2
            )
            win2 = jnp.where(
                lane2 < c128 - lop,
                rolled2[:, : T + E, :],
                rolled2[:, 1 : T + E + 1, :],
            )
            acc = acc + win2[:, :T, :]
            accs = accs + win2[:, T:, :]

        @pl.when(first_r[s] == 1)
        def _():
            y_ref[...] = acc
            sp_ref[0] = accs

        @pl.when(first_r[s] == 0)
        def _():
            y_ref[...] = y_ref[...] + acc
            sp_ref[0] = sp_ref[0] + accs

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(L,),
        in_specs=[
            pl.BlockSpec(
                (k, T, _LANES),
                lambda s, tr, fr, rr, lr: (_Z, jnp.minimum(tr[s], TBx - 1), _Z),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (k, E, _LANES),
                lambda s, tr, fr, rr, lr: (
                    _Z,
                    jnp.minimum(F * tr[s] + F, EBx - 1),
                    _Z,
                ),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (k, E, _LANES),
                lambda s, tr, fr, rr, lr: (
                    _Z,
                    jnp.maximum(jnp.minimum(F * tr[s] - 1, EBx - 1), _Z),
                    _Z,
                ),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, C, T, _LANES),
                lambda s, tr, fr, rr, lr: (s, _Z, _Z, _Z),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (k, T, _LANES),
                lambda s, tr, fr, rr, lr: (_Z, tr[s], _Z),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, k, E, _LANES),
                lambda s, tr, fr, rr, lr: (tr[s], _Z, _Z, _Z),
                memory_space=pltpu.VMEM,
            ),
        ],
        scratch_shapes=[
            pltpu.VMEM((k, T + 2 * E, _LANES), XT.dtype),
            pltpu.VMEM((k, T + 2 * E, _LANES), XT.dtype),
        ],
    )
    compiler_params = None
    if not interpret:
        from sigma_tpu.ops.spmv_pallas import _compiler_params

        compiler_params = _compiler_params(interpret)
    y3, sp = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((k, G * T, _LANES), XT.dtype),
            jax.ShapeDtypeStruct((G, k, E, _LANES), XT.dtype),
        ],
        compiler_params=compiler_params,
        interpret=interpret,
    )(tile, first, rowoff, laneoff, xrows, xrows, xrows, data)
    y4 = y3.reshape(k, G, T, _LANES)
    y4 = y4.at[:, 1:, :E, :].add(jnp.swapaxes(sp[:-1], 0, 1))
    return (
        y4.reshape(k, -1)[:, :n],
        sp[G - 1].reshape(k, -1),
    )


def pruned_matvec_reference(
    data, x, tile, rowoff, laneoff, *, T, E, C, n, m
):
    """Gather-based reference implementation of the pruned SpMV (any
    backend; jit-safe).  Used for CPU tests and as the non-TPU fallback
    of :class:`sigma_tpu.matrix.pruned.PrunedDIAMatrix` — O(slots)
    gather, so only the pallas path is fast on TPU."""
    L, C_, T_, _ = data.shape
    assert (C_, T_) == (C, T)
    S = -(-n // _LANES)
    G = -(-S // T)
    o = (rowoff.astype(jnp.int32) - np.int32(E)) * np.int32(_LANES) + (
        laneoff.astype(jnp.int32)
    )
    # int32 is exact here for any n, m < 2**31 (idx max = m + reach)
    starts = jnp.repeat(tile.astype(jnp.int32), C) * np.int32(T * _LANES)
    idx = (
        starts[:, None]
        + jnp.arange(T * _LANES, dtype=jnp.int32)[None, :]
        + o[:, None]
    )
    ok = (idx >= 0) & (idx < m)
    xg = jnp.where(ok, x[jnp.clip(idx, 0, m - 1)], jnp.zeros((), x.dtype))
    contrib = data.reshape(L * C, T * _LANES).astype(x.dtype) * xg
    per_step = contrib.reshape(L, C, T * _LANES).sum(axis=1)
    y = jax.ops.segment_sum(per_step, tile, num_segments=G)
    return y.reshape(-1)[:n]


def pruned_sym_matvec_reference(
    data, x, tile, rowoff, laneoff, *, T, E, C, n, m, sym_shift=0,
    with_spill=False,
):
    """Gather/scatter reference for the SYMMETRIC pruned SpMV (any
    backend; jit-safe): the upper/main pass of
    :func:`pruned_matvec_reference` plus a scatter-add mirror pass
    (``y[i + om] += d[i] * x[i + sym_shift]`` for mirror offsets
    ``om = offset - sym_shift > 0``).  CPU fallback and test oracle for
    :func:`dia_sym_spmv_pallas_pruned`.  Returns the FULL y (spill
    folded); with ``with_spill=True`` returns ``(y, spill)`` where
    ``spill`` (E*128,) holds the mirror contributions past row ``n``
    — the distributed layer's cross-shard halo."""
    L, C_, T_, _ = data.shape
    assert (C_, T_) == (C, T)
    EL = E * _LANES
    o = (rowoff.astype(jnp.int32) - np.int32(E)) * np.int32(_LANES) + (
        laneoff.astype(jnp.int32)
    )
    starts = jnp.repeat(tile.astype(jnp.int32), C) * np.int32(T * _LANES)
    ar = jnp.arange(T * _LANES, dtype=jnp.int32)[None, :]
    y = pruned_matvec_reference(
        data, x, tile, rowoff, laneoff, T=T, E=E, C=C, n=n, m=m
    )
    d = data.reshape(L * C, T * _LANES).astype(x.dtype)
    om = o - np.int32(sym_shift)
    zidx = starts[:, None] + ar + np.int32(sym_shift)
    okz = (zidx >= 0) & (zidx < m) & (om[:, None] > 0)
    z = d * jnp.where(
        okz, x[jnp.clip(zidx, 0, m - 1)], jnp.zeros((), x.dtype)
    )
    out_idx = starts[:, None] + ar + om[:, None]
    oko = okz & (out_idx >= 0) & (out_idx < n + EL)
    ym = jnp.zeros((n + EL,), x.dtype).at[
        jnp.clip(out_idx, 0, n + EL - 1).ravel()
    ].add(jnp.where(oko, z, jnp.zeros((), x.dtype)).ravel())
    if with_spill:
        return y + ym[:n], ym[n:]
    return y + ym[:n]
