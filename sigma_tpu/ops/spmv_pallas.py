"""Pallas TPU SpMV/SpMM kernels for the DIA (diagonal/stencil) format.

Re-designs the reference's hot SpMV loops — the any-pattern CSR kernel
``/root/reference/src/matrix/formats/cs_matrices.f90:600-647`` and the
SIMD-oriented ELLPACK kernel ``ellpack_matrices.f90:640-665`` — as
gather-free diagonal-window kernels (per-element gather measures ~0.1
Gnnz/s on TPU; these run 100-270), plus the multi-vector products the
reference names as a missing critical optimization
(``/root/reference/README.md:83``).

Measured on a v5e chip, 7-point 3-D Laplacian, f32 (BENCHMARKS.md holds
the full history):

=========================  ==========  ==================================
path                       Gnnz/s      notes
=========================  ==========  ==================================
blocked sym (default for   127         zero-construction clamped-halo
SymmetricDIAMatrix)                    BlockSpecs; ~7.5n words/SpMV —
                                       the fastest path (sustained,
                                       arg-passed, 10M rows)
blocked pallas (default)   108         same structure, full storage
                                       (~10n words); O(1) x traffic per
                                       tile at ANY n (sustained; round-1
                                       cliff was 15)
XLA DIA windows            15-40       near-SoL while x is VMEM-resident;
                                       re-reads x per diagonal past ~3.5M
                                       rows (the round-1 cliff) — now the
                                       CPU/f64/small-n path only
VMEM-resident pallas       ~113        full-x operand re-fetched per grid
                                       step; superseded by blocked
XLA ELL gather             0.1         per-element HBM gather — why DIA
                                       exists
=========================  ==========  ==================================

Operand layout is part of the design: all kernels take DIA values in the
(D, S, 128) tile shape (``DIAMatrix``'s storage layout) because a 2-D
(D, stride) JIT argument costs a full-array relayout INSIDE every solver
iteration — XLA's layout assignment runs after loop-invariant code
motion (measured 2.03 -> 0.55 ms/SpMV; BENCHMARKS.md).

The blocked kernels are the default TPU path from 64K rows
(``DIAMatrix.matvec/matmat/rmatvec`` gate on backend/dtype/band-fit);
``dia_spmm_rhs_major`` is the transpose-free multi-RHS entry, and
``dia_spmm_interleaved``/``dia_sym_spmm_interleaved`` are the FAST
multi-RHS path (0.40 vs 0.91 ms/RHS at the north star) for loops that
keep their panels in the interleaved sublane layout (see the
"Interleaved-panel SpMM" section below).

A pallas ELL gather kernel was attempted and is NOT here: Mosaic's
`tpu.dynamic_gather` only lowers same-shape ``take_along_axis`` (per-lane
sublane gather or per-sublane lane gather) — an arbitrary per-element
``x[cols]`` cannot be expressed, which is exactly why the general-sparsity
answer on TPU is *structural*: reorder + re-freeze into DIA (stencil),
grouped BSR (block-granular DMA), or the distributed cyclic-offset layout
— not a faster gather.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

__all__ = [
    "dia_spmv_pallas",
    "dia_spmv_pallas_blocked",
    "dia_spmv_pallas_chunked",
    "dia_spmm_pallas_chunked",
    "dia_spmm_rhs_major_chunked",
    "chunk_plan",
    "dia_spmm_pallas_blocked",
    "dia_spmm_rhs_major",
    "dia_spmm_interleaved",
    "dia_sym_spmv_pallas_blocked",
    "dia_sym_spmv_pallas_chunked",
    "dia_sym_spmm_rhs_major",
    "dia_sym_spmm_rhs_major_chunked",
    "dia_sym_spmm_interleaved",
    "interleave_panels",
    "deinterleave_panels",
    "dia_spmm_grouped",
    "dia_spmm_grouped_chunked",
    "interleave_panels_grouped",
    "deinterleave_panels_grouped",
    "pallas_supported",
]

_LANES = 128
# index-map constant: python ints in BlockSpec index maps become i64 under
# jax_enable_x64 and Mosaic rejects the (i32, i64) map signature — always
# return int32 components
_I0 = np.int32(0)
# padded x must fit in VMEM alongside double-buffered data tiles
_MAX_X_ELEMS = 3 * 1024 * 1024
# VMEM budget for the blocked path's double-buffered working set.  The
# default Mosaic scoped-vmem limit is 16 MB; the blocked kernels raise it
# via CompilerParams to use the chip's larger physical VMEM, and the
# budget below leaves slack for kernel-internal temporaries
# (measured: a 20.4 MB working-set estimate compiled to a 23.25 MB
# scoped allocation).  32 MB admits the T=3072 row tile, which cuts the
# halo fraction E/T in half vs T=1536: measured at the 10M-row north
# star (one session) 203.5 vs 171.5 Gnnz/s symmetric and 131.4 vs 125.1
# full — T=3072 leads both pick lists.
_VMEM_BUDGET_BYTES = 32 * 1024 * 1024
_VMEM_LIMIT_BYTES = 64 * 1024 * 1024
# Mosaic scoped-allocation ceiling with headroom: the SpMM kernels'
# unrolled diagonal loops hold per-diagonal temporaries that compile
# into the scoped (stack) allocation — see _spmm_tile_pick
_SCOPED_LIMIT_BYTES = 62 * 1024 * 1024


def pallas_supported() -> bool:
    """True when the hardware-validated pallas paths apply on this
    backend (TPU; BlockSpec pipelining only — no manual DMA, which
    faults the axon runtime stack).  Size- and shape-specific routing
    lives with each format's ``why_not_pallas`` probe — this is the
    backend gate only (the former ``(n, m)`` parameters were dead API
    surface that implied size routing this function never did)."""
    try:
        backend = jax.default_backend()
    except RuntimeError:
        return False
    return backend == "tpu"


def _compiler_params(interpret):
    """Raised scoped-VMEM limit for the blocked kernels (None in
    interpreter mode, which takes no TPU compiler params)."""
    if interpret:
        return None
    from jax.experimental.pallas import tpu as pltpu

    return pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT_BYTES)


def _make_compute(offsets, o_min, T):
    """FMA body shared by every DIA kernel variant: given ``window_at(rowoff)``
    yielding (T+1, lanes) sublane-rows of the padded-x frame, accumulate all
    diagonals.  Each diagonal's window is a dynamic sublane slice plus a
    static lane rotation (``pltpu.roll`` + sublane select) — no gather."""
    from jax.experimental.pallas import tpu as pltpu

    def compute(window_at, data_ref, acc_dtype):
        acc = jnp.zeros((T, _LANES), dtype=acc_dtype)
        for d, o in enumerate(offsets):
            q = o - o_min
            rowoff = q // _LANES
            laneoff = q % _LANES
            base = window_at(rowoff)
            if laneoff == 0:
                win = base[:T, :]
            else:
                rolled = pltpu.roll(base, shift=np.int32(_LANES - laneoff), axis=1)
                lane = jax.lax.broadcasted_iota(jnp.int32, (T, _LANES), 1)
                win = jnp.where(
                    lane < _LANES - laneoff, rolled[:T, :], rolled[1 : T + 1, :]
                )
            acc = acc + data_ref[d].astype(acc_dtype) * win
        return acc

    return compute


def _dia3(data):
    """Normalize DIA values to the kernel-native (D, S, 128) tile shape.
    Pass data already 3-D (the :class:`DIAMatrix` storage layout) to make
    a jitted solver loop conversion-free: XLA's layout assignment runs
    AFTER loop-invariant code motion, so a 2-D (D, stride) jit argument
    costs a full-array relayout INSIDE every solver iteration (measured:
    2.03 -> 0.55 ms per 10M-row symmetric SpMV once removed)."""
    if data.ndim == 3:
        return data
    D, stride = data.shape
    return data.reshape(D, stride // _LANES, _LANES)


def _full_tile_pick(S: int, hrows: int, D: int, itemsize: int):
    """(T, E) for the zero-construction blocked kernel: row tile T, halo
    E with E | T (halo blocks are fetched from the same x frame via
    ``i -> F*i`` index maps), E*128 >= the band's one-sided reach both
    ways, working set (x tile + 2 halos + data tile + y tile, double
    buffered) within the VMEM budget.  None if nothing fits."""
    for T in (3072, 1536, 2048, 1024, 768, 512, 384, 256):
        if T > S:
            continue
        E = next(
            (e for e in range(8, T + 1, 8) if e >= hrows and T % e == 0),
            None,
        )
        if E is None:
            continue
        byts = 2 * _LANES * (4 * (T + 2 * E) + itemsize * D * T + 4 * T)
        if byts <= _VMEM_BUDGET_BYTES:
            return T, E
    return None


@functools.partial(
    jax.jit, static_argnames=("offsets", "n", "m", "interpret", "dstart")
)
def dia_spmv_pallas_blocked(data, x, offsets, n, m, interpret=False, dstart=0):
    """Large-x DIA SpMV: x streamed through VMEM in overlapping row-tile
    windows via BlockSpec pipelining alone — the fix for the XLA windowed
    formulation's per-diagonal x re-read past VMEM size (the >3.5M-row
    cliff, BENCHMARKS.md), built without ``make_async_copy`` (manual-DMA
    kernels fault the axon runtime stack).

    ZERO-CONSTRUCTION form: no padded-x operand is built on the XLA side
    (the padded-frame concat of an earlier revision was a full x copy per
    call — inside a solver's ``while_loop`` that is per-ITERATION HBM
    traffic).  Each grid step fetches the x tile plus one backward and
    one forward halo block from the UNMODIFIED x frame through clamped
    index maps (``i -> F*i - 1`` / ``F*i + F``, F = T/E); out-of-range
    or past-``m`` elements are zero-masked in-kernel by their INTENDED
    element index (unspecified VMEM bytes may be NaN, and NaN*0 != 0, so
    masking selects rather than multiplies).  The grid covers ALL rows —
    no XLA tail pass.  Pass ``data`` in the (D, S, 128) tile layout (see
    :func:`_dia3`) to keep jitted solver loops conversion-free.

    ``dstart``: leading-axis slab start for the chunked wide-band path
    (:func:`dia_spmv_pallas_chunked`) — the kernel consumes rows
    ``data[dstart : dstart + len(offsets)]`` addressed purely through the
    BlockSpec index map (``dstart`` must be a multiple of
    ``len(offsets)``; the chunk planner's power-of-two widths guarantee
    it), so no slice of ``data`` is ever materialized.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    D = len(offsets)
    if dstart % max(D, 1) != 0:
        raise ValueError("dstart must be a multiple of len(offsets)")
    dblock = np.int32(dstart // max(D, 1))
    data3 = _dia3(data)
    S = data3.shape[1]
    o_min = min(min(offsets), 0)
    o_max = max(max(offsets), 0)
    hrows = max(-o_min, o_max) // _LANES + 2

    pick = _full_tile_pick(S, hrows, D, data.dtype.itemsize)
    if pick is None:
        raise ValueError(
            f"blocked pallas path cannot fit {D} diagonals of reach "
            f"{max(-o_min, o_max)} in VMEM; use DIAMatrix.matvec (XLA "
            "scan path)"
        )
    T, E = pick
    F = T // E
    G = -(-S // T)  # full coverage; Mosaic masks the partial last block
    PL = E * _LANES

    if m % _LANES == 0:
        Sx = m // _LANES
        xrows = x.reshape(Sx, _LANES)
    else:
        Sx = -(-m // _LANES)
        xrows = jnp.concatenate(
            [x, jnp.zeros((Sx * _LANES - m,), x.dtype)]
        ).reshape(Sx, _LANES)
    EBx = -(-Sx // E)
    TBx = -(-Sx // T)

    def shifted(frame, q, rows):
        """(rows, 128) window w[t] = frame_elements[t*128 + lane + q]."""
        rowoff = q // _LANES
        laneoff = q % _LANES
        base = frame[rowoff : rowoff + rows + 1, :]
        if laneoff == 0:
            return base[:rows, :]
        rolled = pltpu.roll(base, shift=np.int32(_LANES - laneoff), axis=1)
        lane = jax.lax.broadcasted_iota(jnp.int32, (rows, _LANES), 1)
        return jnp.where(
            lane < _LANES - laneoff, rolled[:rows, :], rolled[1 : rows + 1, :]
        )

    def elem_ids(rows):
        row = jax.lax.broadcasted_iota(jnp.int32, (rows, _LANES), 0)
        lane = jax.lax.broadcasted_iota(jnp.int32, (rows, _LANES), 1)
        return row * _LANES + lane

    # masks can be skipped entirely when x-tile indices line up with the
    # output grid and every fetched element is in range
    exact = (m % _LANES == 0) and (S == Sx) and (G * T == S)

    def kernel(xm_ref, xf_ref, xb_ref, d_ref, y_ref):
        i = pl.program_id(0)
        base = i * T * _LANES
        xm = xm_ref[...]
        if not exact:
            xm = jnp.where(
                base + elem_ids(T) < m, xm, jnp.zeros_like(xm)
            )
        xf = xf_ref[...]
        if not exact or o_max > 0:
            xf = jnp.where(
                (i + 1) * T * _LANES + elem_ids(E) < m,
                xf,
                jnp.zeros_like(xf),
            )
        # backward halo: intended rows [i*T-E, i*T) — invalid at i=0 AND
        # (tall-rectangular) when the clamped fetch lands on the partial
        # last x-frame block, so mask by the intended element index
        xb_idx = base - PL + elem_ids(E)
        xb = jnp.where(
            (xb_idx >= 0) & (xb_idx < m),
            xb_ref[...],
            jnp.zeros_like(xb_ref),
        )

        xcat = jnp.concatenate([xb, xm, xf], axis=0)
        acc = jnp.zeros((T, _LANES), y_ref.dtype)
        for d, o in enumerate(offsets):
            acc = acc + d_ref[d].astype(acc.dtype) * shifted(
                xcat, PL + o, T
            )
        if not exact:
            # rows past n may hold garbage*0 = NaN products; zero them
            acc = jnp.where(
                base + elem_ids(T) < n, acc, jnp.zeros_like(acc)
            )
        y_ref[...] = acc

    clamp_m = lambda i: (jnp.minimum(i, TBx - 1), _I0)
    clamp_f = lambda i: (jnp.minimum(F * i + F, EBx - 1), _I0)
    clamp_b = lambda i: (jnp.maximum(jnp.minimum(F * i - 1, EBx - 1), 0), _I0)
    y2 = pl.pallas_call(
        kernel,
        grid=(G,),
        in_specs=[
            pl.BlockSpec(
                (T, _LANES), clamp_m, memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (E, _LANES), clamp_f, memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (E, _LANES), clamp_b, memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (D, T, _LANES),
                lambda i: (dblock, i, _I0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (T, _LANES), lambda i: (i, _I0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((S, _LANES), x.dtype),
        compiler_params=_compiler_params(interpret),
        interpret=interpret,
    )(xrows, xrows, xrows, data3)
    y = y2.reshape(-1)
    return y if S * _LANES == n else y[:n]


def chunk_plan(
    offsets, S: int, itemsize: int, max_chunk=None, k=None, sym=False
):
    """Chunking plan for the wide-band path: split the band's diagonals
    (in their STORED order) into contiguous chunks, each small enough
    that :func:`dia_spmv_pallas_blocked` can tile it within the VMEM
    budget, and each with a start index divisible by its width — the
    condition that lets a chunk be addressed as ONE BlockSpec slab of
    the full data array (no slice, no copy, no gather).  Pass ``k`` (an
    RHS count) to plan against the multi-RHS kernel's working set
    (``_spmm_tile_pick``) instead of the SpMV one.

    Greedy divisor rule: the first chunk takes the largest fitting
    power of two; each later chunk takes the largest width that both
    fits and divides its start.  Every chunk's x/halo/partial-y
    re-traffic is ~3n words regardless of width, so fewer, wider chunks
    win (e.g. D=243 at c_max=64 plans 64+64+64+48+3 = 5 chunks, not the
    7 of a pure power-of-two split).  Returns a list of
    ``(start, width)`` pairs, or None when even a 1-diagonal chunk
    cannot fit (pathological reach)."""
    D = len(offsets)
    reach = max(max(max(offsets), 0), -min(min(offsets), 0))
    hrows = reach // _LANES + 2
    if sym and k is not None:
        fit = lambda c: _sym_spmm_tile_pick(S, hrows, c, itemsize, k)
    elif sym:
        fit = lambda c: _sym_tile_pick(S, hrows, c, itemsize)
    elif k is None:
        fit = lambda c: _full_tile_pick(S, hrows, c, itemsize)
    else:
        fit = lambda c: _spmm_tile_pick(S, hrows, c, itemsize, k=k)
    c_max = None
    c = 1 << (max(D, 1).bit_length() - 1)
    if max_chunk is not None:
        if int(max_chunk) < 1:
            raise ValueError(f"max_chunk must be >= 1, got {max_chunk}")
        c = min(c, 1 << (int(max_chunk).bit_length() - 1))
    while c >= 1:
        if fit(c) is not None:
            c_max = c
            break
        c //= 2
    if c_max is None:
        return None
    plan = []
    start, rem = 0, D
    while rem:
        w = min(c_max, rem)
        while start % w:
            w -= 1
        plan.append((start, w))
        start += w
        rem -= w
    return plan


def dia_spmv_pallas_chunked(
    data, x, offsets, n, m, interpret=False, max_chunk=None
):
    """Wide-band DIA SpMV: when the whole band's data tile cannot fit the
    blocked kernel's VMEM working set (``_full_tile_pick`` is None —
    e.g. an RCM-reordered unstructured matrix with hundreds of stored
    diagonals, :func:`sigma_tpu.matrix.banded.to_banded_dia`), partition
    the diagonals into VMEM-sized power-of-two chunks, run the proven
    blocked kernel once per chunk (each chunk addressed as a BlockSpec
    slab of the ONE data array — no copies), and let XLA sum the partial
    products.

    Traffic model: the diagonal values stream exactly once (the dominant
    term, D*n words); x, its halos, and the partial y add ~3n words per
    chunk — with 64-128-diagonal chunks the overhead is a few percent.
    This keeps the 'occupancy x DIA-rate' law (docs/PERFORMANCE.md §1)
    valid at ANY bandwidth the chip's HBM can hold, with no gather
    anywhere.
    """
    data3 = _dia3(data)
    S = data3.shape[1]
    plan = chunk_plan(offsets, S, data.dtype.itemsize, max_chunk=max_chunk)
    if plan is None:
        raise ValueError(
            "chunked pallas path cannot tile this band; use "
            "DIAMatrix.matvec (XLA scan path)"
        )
    y = None
    for start, width in plan:
        sub = tuple(offsets[start : start + width])
        part = dia_spmv_pallas_blocked(
            data3, x, sub, n, m, interpret=interpret, dstart=start
        )
        y = part if y is None else y + part
    return y


def dia_sym_spmv_pallas_chunked(
    data, x, offsets, n, interpret=False, max_chunk=None
):
    """Wide SYMMETRIC-band DIA SpMV: the chunked wrapper
    (:func:`dia_spmv_pallas_chunked`) over the symmetric kernel — an
    RCM-banded SPD matrix stores only its upper diagonals (HALF the
    dominant HBM stream of the wide-band path), with each VMEM-sized
    slab of upper diagonals addressed as a BlockSpec window and the
    partial products summed by XLA.  Every chunk computes both its
    direct and mirror terms, so chunks stay independent."""
    data3 = _dia3(data)
    S = data3.shape[1]
    plan = chunk_plan(
        offsets, S, data.dtype.itemsize, max_chunk=max_chunk, sym=True
    )
    if plan is None:
        raise ValueError(
            "chunked symmetric pallas path cannot tile this band; use "
            "the XLA path"
        )
    y = None
    for start, width in plan:
        sub = tuple(offsets[start : start + width])
        part = dia_sym_spmv_pallas_blocked(
            data3, x, sub, n, interpret=interpret, dstart=start
        )
        y = part if y is None else y + part
    return y


def _sym_tile_pick(S: int, hrows: int, D: int, itemsize: int):
    """(T, E) for the symmetric blocked kernel: row tile T and halo E
    with E | T (halo blocks are fetched from the SAME operand frames via
    ``i -> F*i`` index maps, so E must tile T), E >= the band's one-sided
    reach in sublane rows, chosen so the double-buffered working set fits
    the VMEM budget.  None if nothing fits (wide bands — the XLA path
    handles those)."""
    for T in (3072, 1536, 2048, 1024, 768, 512, 384, 256):
        if T > S:
            continue
        E = next(
            (
                e
                for e in range(8, T + 1, 8)
                if e >= hrows and T % e == 0
            ),
            None,
        )
        if E is None:
            continue
        byts = 2 * _LANES * (
            4 * (T + 2 * E) + itemsize * D * (T + E) + 4 * T
        )
        if byts <= _VMEM_BUDGET_BYTES:
            return T, E
    return None


@functools.partial(
    jax.jit,
    static_argnames=(
        "offsets", "n", "interpret", "tile_rows", "halo_rows", "dstart"
    ),
)
def dia_sym_spmv_pallas_blocked(
    data, x, offsets, n, interpret=False, tile_rows=None, halo_rows=None,
    dstart=0,
):
    """Blocked SpMV for SYMMETRIC DIA storage (upper diagonals only,
    ``offsets`` all >= 0): y = A x with A[i, i+o] = A[i+o, i] = data[o][i].

    Streams HALF the diagonal values of the full-storage blocked kernel
    (:func:`dia_spmv_pallas_blocked`) — the dominant HBM stream for
    stencils — by applying each stored off-diagonal twice inside the
    tile:

    - upper term  ``y[i] += data_o[i] * x[i+o]``: the usual shifted
      window (static sublane slice + lane roll, gather-free);
    - mirror term ``y[i] += data_o[i-o] * x[i-o]``: both factors share
      the ``-o`` shift, so the kernel multiplies FIRST (lane-aligned
      ``data_o * x`` on the backward-halo and main tiles) and takes ONE
      backward window of the product — every output row is produced
      exactly once and grid steps stay independent.

    The halo reach comes from FIVE BlockSpec streams over just TWO HBM
    arrays — x (main tile ``i``, forward halo block ``F*i+F``, backward
    halo block ``F*i-1``, F = T/E) and the diagonal data (main tile +
    backward halo block) — with out-of-range steps clamped in the index
    map and zero-masked in the kernel.  No operand frames are built on
    the XLA side at all, so a single compiled SpMV is just the pallas
    call: HBM traffic is ``(1+E/T)*D_u*n + (1+2E/T)*n + n`` words
    (~7.5n for the 7-point Laplacian at T=1536, E=384) vs ~10n words
    for full storage.

    Design history (each step measured at the 10M-row north star):
    a cross-tile spill-accumulator version ran 2.5x SLOWER than full
    storage (sequential output dependency defeats Mosaic pipelining);
    XLA-built compacted halo frames ran 5-6x slower than the kernel
    itself (per-call operand builds: one concat of G row-slices is ~2G
    tiny XLA ops); this zero-construction form runs at the kernel's own
    speed.  The grid covers ALL rows (Mosaic masks the partial last
    block; unspecified VMEM bytes — possibly NaN, and NaN*0 != 0 — are
    zero-selected by INTENDED element index before use).  The
    symmetric-storage capability is one the reference names as never
    built (README.md:81-87).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if min(offsets) < 0:
        raise ValueError("symmetric kernel takes offsets >= 0 only")
    D = len(offsets)
    if dstart % max(D, 1) != 0:
        raise ValueError("dstart must be a multiple of len(offsets)")
    dblock = np.int32(dstart // max(D, 1))
    data3 = _dia3(data)
    S = data3.shape[1]
    o_max = max(offsets)
    hrows = o_max // _LANES + 2

    if tile_rows is not None:
        T, E = tile_rows, halo_rows
        if E is None or E % 8 or E < hrows or T % E or T > S:
            raise ValueError("bad explicit (tile_rows, halo_rows)")
    else:
        pick = _sym_tile_pick(S, hrows, D, data.dtype.itemsize)
        if pick is None:
            raise ValueError(
                f"symmetric blocked kernel cannot tile {D} upper diagonals "
                f"of reach {o_max}; use the XLA path"
            )
        T, E = pick
    F = T // E
    G = -(-S // T)  # full-coverage grid; Mosaic masks the partial last block
    EB = -(-S // E)  # E-blocks available in the (S, 128) frames
    PL = E * _LANES

    if n % _LANES == 0:
        xrows = x.reshape(S, _LANES)
        aligned = True
    else:
        xrows = jnp.concatenate(
            [x, jnp.zeros((S * _LANES - n,), x.dtype)]
        ).reshape(S, _LANES)
        aligned = False
    data2 = data3

    def shifted(frame, q, rows):
        """(rows, 128) window w[t] = frame_elements[t*128 + lane + q]."""
        rowoff = q // _LANES
        laneoff = q % _LANES
        base = frame[rowoff : rowoff + rows + 1, :]
        if laneoff == 0:
            return base[:rows, :]
        rolled = pltpu.roll(base, shift=np.int32(_LANES - laneoff), axis=1)
        lane = jax.lax.broadcasted_iota(jnp.int32, (rows, _LANES), 1)
        return jnp.where(
            lane < _LANES - laneoff, rolled[:rows, :], rolled[1 : rows + 1, :]
        )

    def elem_ids(rows):
        row = jax.lax.broadcasted_iota(jnp.int32, (rows, _LANES), 0)
        lane = jax.lax.broadcasted_iota(jnp.int32, (rows, _LANES), 1)
        return row * _LANES + lane

    def kernel(xm_ref, xf_ref, xb_ref, d_ref, dh_ref, y_ref):
        i = pl.program_id(0)
        # main x tile: zero rows past n (partial last block reads
        # unspecified VMEM; NaN garbage must not meet the zero padding)
        xm = xm_ref[...]
        if G * T > S or not aligned:
            xm = jnp.where(
                i * T * _LANES + elem_ids(T) < n, xm, jnp.zeros_like(xm)
            )
        # forward halo: intended rows [(i+1)*T, (i+1)*T+E) — mask by the
        # INTENDED element index (covers both the clamped last step and a
        # partial final E-block)
        xf = jnp.where(
            (i + 1) * T * _LANES + elem_ids(E) < n,
            xf_ref[...],
            jnp.zeros_like(xf_ref),
        )
        # backward x halo: intended rows [i*T-E, i*T) — invalid only at
        # i=0 (the data halo needs no mask: clamped backward blocks are
        # always in-range real values, and they meet the zeroed xb)
        xb = jnp.where(i > 0, xb_ref[...], jnp.zeros_like(xb_ref))

        xmf = jnp.concatenate([xm, xf], axis=0)
        acc = jnp.zeros((T, _LANES), y_ref.dtype)
        for d, o in enumerate(offsets):
            dtile = d_ref[d].astype(acc.dtype)
            acc = acc + dtile * shifted(xmf, o, T)
            if o > 0:
                # mirror y[i] += data_o[i-o] * x[i-o]: multiply FIRST
                # (both factors share the -o shift), then one window of
                # the product — halves the window work per diagonal
                z = jnp.concatenate(
                    [dh_ref[d].astype(acc.dtype) * xb, dtile * xm], axis=0
                )
                acc = acc + shifted(z, PL - o, T)
        # rows past n may hold garbage*0 = NaN products; zero them
        if G * T > S or not aligned:
            acc = jnp.where(
                i * T * _LANES + elem_ids(T) < n, acc, jnp.zeros_like(acc)
            )
        y_ref[...] = acc

    clamp_f = lambda i: jnp.minimum(F * i + F, EB - 1)
    clamp_b = lambda i: jnp.maximum(F * i - 1, 0)
    y2 = pl.pallas_call(
        kernel,
        grid=(G,),
        in_specs=[
            pl.BlockSpec(
                (T, _LANES), lambda i: (i, _I0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (E, _LANES), lambda i: (clamp_f(i), _I0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (E, _LANES), lambda i: (clamp_b(i), _I0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (D, T, _LANES),
                lambda i: (dblock, i, _I0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (D, E, _LANES),
                lambda i: (dblock, clamp_b(i), _I0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (T, _LANES), lambda i: (i, _I0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((S, _LANES), x.dtype),
        compiler_params=_compiler_params(interpret),
        interpret=interpret,
    )(xrows, xrows, xrows, data2, data2)
    y = y2.reshape(-1)
    return y if aligned else y[:n]


def _sym_spmm_tile_pick(S: int, hrows: int, D: int, itemsize: int, k: int):
    """(T, E) for the symmetric SpMM kernel: k RHS panels (tile + 2
    halos), data tile + backward data halo, k output panels — double
    buffered within the VMEM budget — plus the single (k, E+T) mirror
    scratch buffer."""
    for T in (3072, 1536, 2048, 1024, 768, 512, 384, 256):
        if T > S:
            continue
        E = next(
            (e for e in range(8, T + 1, 8) if e >= hrows and T % e == 0),
            None,
        )
        if E is None:
            continue
        byts = 2 * _LANES * (
            4 * k * (T + 2 * E) + itemsize * D * (T + E) + 4 * k * T
        ) + 4 * k * (E + T) * _LANES
        if byts <= _VMEM_BUDGET_BYTES:
            return T, E
    return None


@functools.partial(
    jax.jit, static_argnames=("offsets", "n", "interpret", "dstart")
)
def dia_sym_spmm_rhs_major(data, XT, offsets, n, interpret=False, dstart=0):
    """RHS-major multi-RHS SpMM for SYMMETRIC DIA storage: XT is (k, n),
    returns (k, n).  The symmetric matvec kernel
    (:func:`dia_sym_spmv_pallas_blocked`) with a leading RHS dimension:
    upper term as a forward window per diagonal, mirror term as ONE
    backward window of the lane-aligned ``data_o * X`` product, halos
    via clamped BlockSpec index maps — zero operand construction, and
    the diagonal values (the dominant stream for small k) are fetched
    once for all k right-hand sides at HALF full storage's volume."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if min(offsets) < 0:
        raise ValueError("symmetric kernel takes offsets >= 0 only")
    D = len(offsets)
    if dstart % max(D, 1) != 0:
        raise ValueError("dstart must be a multiple of len(offsets)")
    dblock = np.int32(dstart // max(D, 1))
    k = XT.shape[0]
    data3 = _dia3(data)
    S = data3.shape[1]
    o_max = max(offsets)
    hrows = o_max // _LANES + 2

    pick = _sym_spmm_tile_pick(S, hrows, D, data.dtype.itemsize, k)
    if pick is None:
        raise ValueError(
            f"symmetric blocked SpMM cannot tile {D} upper diagonals x "
            f"{k} RHS; use the XLA path"
        )
    T, E = pick
    F = T // E
    G = -(-S // T)
    EB = -(-S // E)
    PL = E * _LANES

    if n % _LANES == 0:
        X3 = XT.reshape(k, S, _LANES)
        aligned = True
    else:
        X3 = jnp.concatenate(
            [XT, jnp.zeros((k, S * _LANES - n), XT.dtype)], axis=1
        ).reshape(k, S, _LANES)
        aligned = False

    def shifted(frame, q, rows):
        rowoff = q // _LANES
        laneoff = q % _LANES
        base = frame[:, rowoff : rowoff + rows + 1, :]
        if laneoff == 0:
            return base[:, :rows, :]
        rolled = pltpu.roll(base, shift=np.int32(_LANES - laneoff), axis=2)
        lane = jax.lax.broadcasted_iota(jnp.int32, (k, rows, _LANES), 2)
        return jnp.where(
            lane < _LANES - laneoff,
            rolled[:, :rows, :],
            rolled[:, 1 : rows + 1, :],
        )

    def elem_ids(rows):
        row = jax.lax.broadcasted_iota(jnp.int32, (rows, _LANES), 0)
        lane = jax.lax.broadcasted_iota(jnp.int32, (rows, _LANES), 1)
        return row * _LANES + lane

    def shifted_ref(frame_ref, q, rows):
        """``shifted`` reading from a VMEM scratch ref (static slice)."""
        rowoff = q // _LANES
        laneoff = q % _LANES
        base = frame_ref[:, rowoff : rowoff + rows + 1, :]
        if laneoff == 0:
            return base[:, :rows, :]
        rolled = pltpu.roll(base, shift=np.int32(_LANES - laneoff), axis=2)
        lane = jax.lax.broadcasted_iota(jnp.int32, (k, rows, _LANES), 2)
        return jnp.where(
            lane < _LANES - laneoff,
            rolled[:, :rows, :],
            rolled[:, 1 : rows + 1, :],
        )

    def kernel(xm_ref, xf_ref, xb_ref, d_ref, dh_ref, y_ref, z_ref):
        i = pl.program_id(0)
        xm = xm_ref[...]
        if G * T > S or not aligned:
            xm = jnp.where(
                (i * T * _LANES + elem_ids(T) < n)[None],
                xm,
                jnp.zeros_like(xm),
            )
        xf = jnp.where(
            ((i + 1) * T * _LANES + elem_ids(E) < n)[None],
            xf_ref[...],
            jnp.zeros_like(xf_ref),
        )
        xb = jnp.where(i > 0, xb_ref[...], jnp.zeros_like(xb_ref))

        xmf = jnp.concatenate([xm, xf], axis=1)
        acc = jnp.zeros((k, T, _LANES), y_ref.dtype)
        for d, o in enumerate(offsets):
            dtile = d_ref[d][None].astype(acc.dtype)
            acc = acc + dtile * shifted(xmf, o, T)
            if o > 0:
                # mirror term through ONE rotating scratch buffer: the
                # per-diagonal z concats of the earlier form were each a
                # live (k, E+T, 128) temporary across the unrolled loop
                # (Mosaic scoped allocation grew with the chunk width —
                # 78.8 MB at 64 diagonals, the old 16-diagonal cap)
                z_ref[:, :E, :] = dh_ref[d][None].astype(acc.dtype) * xb
                z_ref[:, E:, :] = dtile * xm
                acc = acc + shifted_ref(z_ref, PL - o, T)
        if G * T > S or not aligned:
            acc = jnp.where(
                (i * T * _LANES + elem_ids(T) < n)[None],
                acc,
                jnp.zeros_like(acc),
            )
        y_ref[...] = acc

    clamp_f = lambda i: (_I0, jnp.minimum(F * i + F, EB - 1), _I0)
    clamp_b = lambda i: (_I0, jnp.maximum(F * i - 1, 0), _I0)
    y3 = pl.pallas_call(
        kernel,
        grid=(G,),
        in_specs=[
            pl.BlockSpec(
                (k, T, _LANES), lambda i: (_I0, i, _I0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (k, E, _LANES), clamp_f, memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (k, E, _LANES), clamp_b, memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (D, T, _LANES),
                lambda i: (dblock, i, _I0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (D, E, _LANES),
                lambda i: (dblock, jnp.maximum(F * i - 1, 0), _I0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (k, T, _LANES), lambda i: (_I0, i, _I0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((k, S, _LANES), XT.dtype),
        scratch_shapes=[pltpu.VMEM((k, E + T, _LANES), XT.dtype)],
        compiler_params=_compiler_params(interpret),
        interpret=interpret,
    )(X3, X3, X3, data3, data3)
    Y = y3.reshape(k, S * _LANES)
    return Y if aligned else Y[:, :n]


def dia_sym_spmm_rhs_major_chunked(
    data, XT, offsets, n, interpret=False, max_chunk=None
):
    """Wide SYMMETRIC-band multi-RHS SpMM: VMEM-sized slabs of upper
    diagonals through :func:`dia_sym_spmm_rhs_major` (each slab computes
    its direct + mirror terms; XLA sums the partials) — block solvers on
    RCM-banded SPD matrices stream HALF the full-storage values, once
    for all k right-hand sides."""
    data3 = _dia3(data)
    S = data3.shape[1]
    k = XT.shape[0]
    if max_chunk is None:
        # Measured Mosaic scoped-VMEM ceiling (round 4): the mirror term
        # now writes through ONE rotating VMEM scratch (not a fresh
        # per-diagonal z concat), which lifted the cap from 16 to
        # 24-wide slabs at k<=4 — but the DIRECT term's per-diagonal
        # shifted-window temporaries also stay live across the unrolled
        # loop, scaling with k x slab: bisected on the 1M-row 78-upper-
        # diagonal band, k=8 and k=16 compile only at <= 6-wide slabs
        # (8-wide crashes the compiler subprocess).  Measured k=4 at
        # 24-wide: 11.3 true G-eff — NO better than 16-wide's 12.1, so
        # slab width is not the lever here anyway.  VERDICT: for
        # multi-RHS on wide SPD bands route to the PRUNED SpMM
        # (PrunedDIAMatrix.matmat_rhs_major: 58-64 true G-eff at k=4-16
        # on the same matrix, long-chain re-measured, BENCHMARKS.md
        # round 4); this path remains for narrow symmetric stencils
        # where one slab covers the band.  (bf16 data casts to f32
        # in-kernel, so its per-diagonal temporaries are LARGER relative
        # to the data tile — bisected to 12-wide at k=4, and its k=16
        # needs 4-wide where f32 compiles at 6.)
        # NOTE (review, round 5): chunk_plan floors its max_chunk to a
        # power of two, so these bisected caps EXECUTE as 16/8/4/4-wide
        # slabs — that flooring was in place for every round-4
        # measurement, so the recorded rates describe the pow2 widths;
        # the caps are kept as the bisected compile ceilings (any wider
        # pow2 would crash Mosaic's scoped allocation)
        if k <= 4:
            max_chunk = 24 if data.dtype.itemsize >= 4 else 12
        elif data.dtype.itemsize >= 4 or k <= 8:
            max_chunk = 6
        else:
            max_chunk = 4
    plan = chunk_plan(
        offsets, S, data.dtype.itemsize, max_chunk=max_chunk, k=k, sym=True
    )
    if plan is None:
        raise ValueError(
            "chunked symmetric SpMM cannot tile this band at this RHS "
            "count; use the XLA path"
        )
    Y = None
    for start, width in plan:
        sub = tuple(offsets[start : start + width])
        part = dia_sym_spmm_rhs_major(
            data3, XT, sub, n, interpret=interpret, dstart=start
        )
        Y = part if Y is None else Y + part
    return Y


@functools.partial(
    jax.jit, static_argnames=("offsets", "n", "m", "interpret")
)
def dia_spmm_rhs_major(data, XT, offsets, n, m, interpret=False):
    """RHS-major blocked SpMM: XT is (k, m), returns (k, n) — NO layout
    transposes.  The (n, k) <-> (k, n) transposes around
    :func:`dia_spmm_pallas_blocked` are a measurable fraction of its time
    at 10M rows (BENCHMARKS.md); production multi-RHS loops that keep
    their block vectors RHS-major should call this form."""
    return _dia_spmm_core(data, XT, offsets, n, m, interpret)


@functools.partial(
    jax.jit, static_argnames=("offsets", "n", "m", "interpret")
)
def dia_spmm_pallas_blocked(data, X, offsets, n, m, interpret=False):
    """Multi-RHS blocked DIA SpMM: y = A X for X (m, k), k small.

    Same overlapping-window structure as :func:`dia_spmv_pallas_blocked`,
    with the RHS panel transposed to RHS-major (k, rows, 128) so the lane
    dimension stays minor-most for the rotations.  The data tile is
    fetched ONCE per row tile and shared by all k right-hand sides — the
    whole point of the multi-vector layout (the capability the reference
    names as missing, ``README.md:83``): per-RHS traffic drops to
    ~(4/k + 1.7) bytes/nnz.  The entry/exit transposes cost a pass over
    the RHS panels; keep block vectors RHS-major and call
    :func:`dia_spmm_rhs_major` to skip them.
    """
    return _dia_spmm_core(
        data, X.T, offsets, n, m, interpret
    ).T


def dia_spmm_rhs_major_chunked(
    data, XT, offsets, n, m, interpret=False, max_chunk=None
):
    """Wide-band multi-RHS SpMM: the chunked wrapper
    (:func:`dia_spmv_pallas_chunked`) with a leading RHS dim — each
    VMEM-sized diagonal slab streams once for ALL k right-hand sides, so
    the per-RHS traffic advantage of the blocked SpMM survives at any
    bandwidth (block solvers / LOBPCG on RCM-banded general matrices)."""
    data3 = _dia3(data)
    S = data3.shape[1]
    k = XT.shape[0]
    plan = chunk_plan(
        offsets, S, data.dtype.itemsize, max_chunk=max_chunk, k=k
    )
    if plan is None:
        raise ValueError(
            "chunked SpMM cannot tile this band at this RHS count; "
            "reduce k or use DIAMatrix.matmat (XLA paths)"
        )
    Y = None
    for start, width in plan:
        sub = tuple(offsets[start : start + width])
        part = _dia_spmm_core(
            data3, XT, sub, n, m, interpret, dstart=start
        )
        Y = part if Y is None else Y + part
    return Y


def dia_spmm_pallas_chunked(
    data, X, offsets, n, m, interpret=False, max_chunk=None
):
    """Column-layout entry for :func:`dia_spmm_rhs_major_chunked`:
    X (m, k) -> (n, k)."""
    return dia_spmm_rhs_major_chunked(
        data, X.T, offsets, n, m, interpret=interpret, max_chunk=max_chunk
    ).T


def _spmm_tile_pick(S: int, hrows: int, D: int, itemsize: int, k: int):
    """(T, E) for the zero-construction SpMM kernel (k RHS panels of
    tile + 2 halos + data tile + k output panels, double buffered).

    Beyond the block working set, the unrolled per-diagonal loop's
    (k*T, 128) f32 temporaries count against Mosaic's 64 MB scoped
    limit — measured scoped allocations put the live fraction at ~0.63
    of one temporary per diagonal (D=64, k=16, T=256 compiled to
    113.75 MB = 25.4 MB blocks + 0.65*D*k*T*128*4; D=64, k=4, T=384 at
    ~61 MB ran).  Ignoring it, chunk plans at k >= 16 picked 64-wide
    slabs that failed to compile (scoped-vmem OOM)."""
    for T in (3072, 1536, 2048, 1024, 768, 512, 384, 256):
        if T > S:
            continue
        E = next(
            (e for e in range(8, T + 1, 8) if e >= hrows and T % e == 0),
            None,
        )
        if E is None:
            continue
        byts = 2 * _LANES * (
            4 * k * (T + 2 * E) + itemsize * D * T + 4 * k * T
        )
        scoped = byts + int(0.65 * 4 * D * k * T * _LANES)
        if byts <= _VMEM_BUDGET_BYTES and scoped <= _SCOPED_LIMIT_BYTES:
            return T, E
    return None


def _dia_spmm_core(data, XT, offsets, n, m, interpret, dstart=0):
    """ZERO-CONSTRUCTION multi-RHS core (same clamped-halo structure as
    :func:`dia_spmv_pallas_blocked`, with a leading RHS dim): no padded
    panel build — in block-solver loops the old frame concat was a full
    per-iteration copy of the RHS panel.  ``dstart`` addresses a
    leading-axis slab of ``data`` purely through the BlockSpec index map
    (the chunked wide-band path; must be a multiple of len(offsets))."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    D = len(offsets)
    if dstart % max(D, 1) != 0:
        raise ValueError("dstart must be a multiple of len(offsets)")
    dblock = np.int32(dstart // max(D, 1))
    k = XT.shape[0]
    data = _dia3(data)
    S = data.shape[1]
    o_min = min(min(offsets), 0)
    o_max = max(max(offsets), 0)
    hrows = max(-o_min, o_max) // _LANES + 2

    pick = _spmm_tile_pick(S, hrows, D, data.dtype.itemsize, k=k)
    if pick is None:
        raise ValueError(
            f"blocked SpMM cannot fit {D} diagonals x {k} RHS in VMEM; "
            "use DIAMatrix.matmat (XLA paths)"
        )
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

    def kernel(xm_ref, xf_ref, xb_ref, d_ref, y_ref):
        i = pl.program_id(0)
        base = i * T * _LANES
        xm = xm_ref[...]
        if not exact:
            xm = jnp.where(
                (base + elem_ids(T) < m)[None], xm, jnp.zeros_like(xm)
            )
        xf = xf_ref[...]
        if not exact or o_max > 0:
            xf = jnp.where(
                ((i + 1) * T * _LANES + elem_ids(E) < m)[None],
                xf,
                jnp.zeros_like(xf),
            )
        xb_idx = base - PL + elem_ids(E)
        xb = jnp.where(
            ((xb_idx >= 0) & (xb_idx < m))[None],
            xb_ref[...],
            jnp.zeros_like(xb_ref),
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
                rolled = pltpu.roll(base3, shift=np.int32(_LANES - laneoff), axis=2)
                lane = jax.lax.broadcasted_iota(
                    jnp.int32, (k, T, _LANES), 2
                )
                win = jnp.where(
                    lane < _LANES - laneoff,
                    rolled[:, :T, :],
                    rolled[:, 1 : T + 1, :],
                )
            acc = acc + d_ref[d][None].astype(acc.dtype) * win
        if not exact:
            acc = jnp.where(
                (base + elem_ids(T) < n)[None], acc, jnp.zeros_like(acc)
            )
        y_ref[...] = acc

    clamp_m = lambda i: (_I0, jnp.minimum(i, TBx - 1), _I0)
    clamp_f = lambda i: (_I0, jnp.minimum(F * i + F, EBx - 1), _I0)
    clamp_b = lambda i: (
        _I0,
        jnp.maximum(jnp.minimum(F * i - 1, EBx - 1), 0),
        _I0,
    )
    y3 = pl.pallas_call(
        kernel,
        grid=(G,),
        in_specs=[
            pl.BlockSpec(
                (k, T, _LANES), clamp_m, memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (k, E, _LANES), clamp_f, memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (k, E, _LANES), clamp_b, memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (D, T, _LANES),
                lambda i: (dblock, i, _I0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (k, T, _LANES), lambda i: (_I0, i, _I0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((k, S, _LANES), XT.dtype),
        compiler_params=_compiler_params(interpret),
        interpret=interpret,
    )(X3, X3, X3, data)
    Y = y3.reshape(k, S * _LANES)
    return Y if S * _LANES == n else Y[:, :n]


@functools.partial(
    jax.jit,
    static_argnames=("offsets", "n", "m", "tile_rows", "interpret", "allow_dma_path"),
)
def dia_spmv_pallas(
    data, x, offsets, n, m, tile_rows=256, interpret=False, allow_dma_path=False
):
    """y = A x for a DIA matrix: data (D, stride), static ``offsets``.

    Grid over row tiles of ``tile_rows`` sublane-rows (tile_rows*128
    elements).  The padded x is a full-array VMEM operand — fetched from
    HBM once, reused by every grid step.  Each diagonal's window is a
    dynamic sublane slice plus a static lane rotation
    (``pltpu.roll`` + sublane select), so no gather is ever issued:

        win[r, l] = base[r + (l + laneoff) // 128, (l + laneoff) % 128]

    ``interpret=True`` runs the kernel in the pallas interpreter (for
    CPU-only test environments).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    D = len(offsets)
    data = _dia3(data)
    S = data.shape[1]  # sublane-rows of y
    o_min = min(min(offsets), 0)
    o_max = max(max(offsets), 0)
    span = o_max - o_min

    # large x: route to the blocked overlapping-window kernel (BlockSpec
    # pipelining only — safe on the axon stack).  The manual-DMA variant
    # below stays opt-in for standard runtimes (make_async_copy faults the
    # axon TPU worker; minimal repro in BENCHMARKS.md).
    extra0 = span // _LANES + 2
    if (S + extra0) * _LANES > _MAX_X_ELEMS and not allow_dma_path:
        return dia_spmv_pallas_blocked(
            data, x, offsets, n, m, interpret=interpret
        )

    T = min(tile_rows, S)
    while S % T:
        T //= 2
    grid = S // T

    # padded x: xp[t] = x[t + o_min] for t + o_min in [0, m)
    extra_rows = span // _LANES + 2
    Sp = S + extra_rows
    left = -o_min
    right = Sp * _LANES - left - m
    xp = jnp.concatenate(
        [
            jnp.zeros((left,), x.dtype),
            x,
            jnp.zeros((right,), x.dtype),
        ]
    ).reshape(Sp, _LANES)

    data2 = data
    compute = _make_compute(offsets, o_min, T)

    vmem_resident = Sp * _LANES <= _MAX_X_ELEMS

    if vmem_resident:
        # small-x path: whole padded x lives in VMEM across the grid
        def kernel(xp_ref, data_ref, y_ref):
            i = pl.program_id(0)
            y_ref[:, :] = compute(
                lambda rowoff: xp_ref[pl.ds(i * T + rowoff, T + 1), :],
                data_ref,
                y_ref.dtype,
            )

        y2 = pl.pallas_call(
            kernel,
            grid=(grid,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(
                    (D, T, _LANES), lambda i: (_I0, i, _I0), memory_space=pltpu.VMEM
                ),
            ],
            out_specs=pl.BlockSpec(
                (T, _LANES), lambda i: (i, _I0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((S, _LANES), x.dtype),
            interpret=interpret,
        )(xp, data2)
        return y2.reshape(-1)[:n]

    # opt-in manual-DMA path (reached only with allow_dma_path=True)
    win_rows = T + extra_rows

    def kernel_hbm(xp_ref, data_ref, y_ref, xwin, sem):
        i = pl.program_id(0)
        dma = pltpu.make_async_copy(
            xp_ref.at[pl.ds(i * T, win_rows), :], xwin, sem
        )
        dma.start()
        dma.wait()
        y_ref[:, :] = compute(
            lambda rowoff: xwin[pl.ds(rowoff, T + 1), :], data_ref, y_ref.dtype
        )

    y2 = pl.pallas_call(
        kernel_hbm,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),  # xp stays in HBM
            pl.BlockSpec(
                (D, T, _LANES), lambda i: (_I0, i, _I0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (T, _LANES), lambda i: (i, _I0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((S, _LANES), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((win_rows, _LANES), x.dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(xp, data2)
    return y2.reshape(-1)[:n]


# ---------------------------------------------------------------------------
# Interleaved-panel SpMM: the RHS dimension folded into the SUBLANE axis.
#
# Why this layout exists (measured, one session each, nx=216, k=4,
# benchmarks/spmm_probe*.py): every SpMM formulation that keeps the k
# right-hand sides as separate panels — fused (k, T, 128) blocks, a
# k-unrolled 2-D kernel body, a grid=(G, k) split running the proven SpMV
# body per step — lands at ~0.9 ms/RHS, while the plain blocked SpMV runs
# 0.53 ms; even k=1 through a (1, T, 128)-block kernel costs 0.99 ms.
# The wall time tracks the number of DISTINCT transfer chunks per grid
# step (each (k, T, 128) operand block decomposes into k strided chunks),
# not bytes and not VPU roll shape.  Interleaving the panels into the
# sublane axis — row s*k + j holds element-row s of RHS j — restores the
# SpMV kernel's 5-contiguous-transfer grid step at k times the rows:
# measured 0.40 ms/RHS resident (177 G-eff vs the fused core's 77).
#
# The layout only pays while panels STAY interleaved: the (k, n) <->
# interleaved transposes cost ~2 ms at the north star (XLA transpose),
# which is exactly the win.  Block solvers should interleave once at
# entry, run every iteration in the layout, and deinterleave at exit
# (panel-wise algebra — Gram matrices, panel linear combinations — works
# directly on the layout; see solvers/krylov.py block_cg_solve).
# ---------------------------------------------------------------------------


def _interleaved_window_helpers(k):
    """The k-scaled window arithmetic shared by the interleaved-panel
    kernels: per-panel element ids for the tail masks, and the shifted
    window (element-row s of every panel lives at interleaved row
    s*k + j, so sublane offsets scale by k and the lane-roll wrap select
    advances k rows)."""
    from jax.experimental.pallas import tpu as pltpu

    def elem_ids(rows):
        # np.int32 constants: python-int operands in in-kernel integer
        # arithmetic mis-promote under jax_enable_x64
        row = jax.lax.broadcasted_iota(jnp.int32, (k * rows, _LANES), 0)
        lane = jax.lax.broadcasted_iota(jnp.int32, (k * rows, _LANES), 1)
        return (row // np.int32(k)) * np.int32(_LANES) + lane

    def shifted(frame, q, rows):
        rowoff = q // _LANES
        laneoff = q % _LANES
        base = frame[k * rowoff : k * rowoff + k * rows + k, :]
        if laneoff == 0:
            return base[: k * rows, :]
        rolled = pltpu.roll(base, shift=np.int32(_LANES - laneoff), axis=1)
        lane = jax.lax.broadcasted_iota(jnp.int32, (k * rows, _LANES), 1)
        return jnp.where(
            lane < np.int32(_LANES - laneoff),
            rolled[: k * rows, :],
            rolled[k : k * rows + k, :],
        )

    return elem_ids, shifted


@functools.partial(jax.jit, static_argnames=("m",))
def interleave_panels(XT, m=None):
    """(k, m) RHS-major panels -> interleaved (k*ceil(m/128), 128): row
    ``s*k + j`` holds element-row ``s`` (elements ``s*128..s*128+127``,
    zero-padded past m) of RHS ``j``.  One XLA transpose — do it ONCE per
    solve, not per product."""
    k, m_in = XT.shape
    m = m_in if m is None else m
    if m < m_in:
        raise ValueError(f"m={m} smaller than the panel width {m_in}")
    Sx = -(-m // _LANES)
    # pad from the INPUT width to the lane-rounded target (review fix:
    # padding from m gated on m broke every m != XT.shape[1] call)
    if Sx * _LANES != m_in:
        XT = jnp.concatenate(
            [XT, jnp.zeros((k, Sx * _LANES - m_in), XT.dtype)], axis=1
        )
    return jnp.transpose(XT.reshape(k, Sx, _LANES), (1, 0, 2)).reshape(
        k * Sx, _LANES
    )


@functools.partial(jax.jit, static_argnames=("k", "n"))
def deinterleave_panels(YI, k, n):
    """Inverse of :func:`interleave_panels`: (k*S, 128) -> (k, n)."""
    S = YI.shape[0] // k
    return jnp.transpose(YI.reshape(S, k, _LANES), (1, 0, 2)).reshape(
        k, S * _LANES
    )[:, :n]


@functools.partial(
    jax.jit, static_argnames=("offsets", "n", "m", "interpret")
)
def dia_spmm_interleaved(data, XI, offsets, n, m, interpret=False):
    """Multi-RHS DIA SpMM on INTERLEAVED panels: XI is (k*ceil(m/128),
    128) from :func:`interleave_panels`; returns the product in the same
    layout ((k*S, 128), S = data.shape[1]).

    Structurally this is :func:`dia_spmv_pallas_blocked` with every x/y
    row count multiplied by k: each grid step still moves exactly five
    contiguous blocks (x tile, forward halo, backward halo, data tile,
    y tile), the per-diagonal window is still one static sublane slice +
    one lane roll (shifts scale by k sublanes: element-row s of every
    panel lives at interleaved row s*k + j), and the diagonal values are
    fetched ONCE for all k right-hand sides — broadcast k-fold across
    sublanes in-kernel (``jnp.repeat``), which is VMEM-local and free of
    HBM traffic.  This is the multi-vector capability the reference names
    as a missing critical optimization (README.md:83), in the layout the
    hardware's DMA engines want.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    D = len(offsets)
    data3 = _dia3(data)
    S = data3.shape[1]
    o_min = min(min(offsets), 0)
    o_max = max(max(offsets), 0)
    hrows = max(-o_min, o_max) // _LANES + 2

    Sx = -(-m // _LANES)
    k = XI.shape[0] // Sx
    if k * Sx != XI.shape[0] or XI.shape[1] != _LANES:
        raise ValueError(
            f"XI shape {XI.shape} is not (k*{Sx}, {_LANES}) — pass panels "
            "through interleave_panels"
        )

    pick = _spmm_tile_pick(S, hrows, D, data.dtype.itemsize, k=k)
    if pick is None:
        raise ValueError(
            f"interleaved SpMM cannot fit {D} diagonals x {k} RHS in "
            "VMEM; use DIAMatrix.matmat (XLA paths)"
        )
    T, E = pick
    F = T // E
    G = -(-S // T)
    PL = E * _LANES

    EBx = -(-Sx // E)
    TBx = -(-Sx // T)
    exact = (m % _LANES == 0) and (S == Sx) and (G * T == S)

    elem_ids, shifted = _interleaved_window_helpers(k)

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

    clamp_m = lambda i: (jnp.minimum(i, TBx - 1), _I0)
    clamp_f = lambda i: (jnp.minimum(F * i + F, EBx - 1), _I0)
    clamp_b = lambda i: (jnp.maximum(jnp.minimum(F * i - 1, EBx - 1), 0), _I0)
    return pl.pallas_call(
        kernel,
        grid=(G,),
        in_specs=[
            pl.BlockSpec((k * T, _LANES), clamp_m, memory_space=pltpu.VMEM),
            pl.BlockSpec((k * E, _LANES), clamp_f, memory_space=pltpu.VMEM),
            pl.BlockSpec((k * E, _LANES), clamp_b, memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (D, T, _LANES), lambda i: (_I0, i, _I0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (k * T, _LANES), lambda i: (i, _I0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((k * S, _LANES), XI.dtype),
        compiler_params=_compiler_params(interpret),
        interpret=interpret,
    )(XI, XI, XI, data3)


@functools.partial(jax.jit, static_argnames=("offsets", "n", "interpret"))
def dia_sym_spmm_interleaved(data, XI, offsets, n, interpret=False):
    """Multi-RHS SpMM for SYMMETRIC DIA storage (upper diagonals only,
    ``offsets`` all >= 0) on INTERLEAVED panels: XI is (k*S, 128) from
    :func:`interleave_panels`; returns the product in the same layout.

    :func:`dia_sym_spmv_pallas_blocked`'s upper-window + product-mirror
    structure with every x/y row count multiplied by k (see
    :func:`dia_spmm_interleaved` for why interleaving beats per-panel
    blocks): upper term from a forward window of the interleaved frame,
    mirror term from ONE backward window of the lane-aligned
    ``data_o * X`` product, with the k-fold sublane broadcast of each
    diagonal hoisted once and shared by both terms.  Streams HALF of full
    storage's diagonal values, once for all k right-hand sides."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if min(offsets) < 0:
        raise ValueError("symmetric kernel takes offsets >= 0 only")
    D = len(offsets)
    data3 = _dia3(data)
    S = data3.shape[1]
    o_max = max(offsets)
    hrows = o_max // _LANES + 2

    if XI.shape[0] % S or XI.shape[1] != _LANES:
        raise ValueError(
            f"XI shape {XI.shape} is not (k*{S}, {_LANES}) — pass panels "
            "through interleave_panels"
        )
    k = XI.shape[0] // S

    pick = _sym_spmm_tile_pick(S, hrows, D, data.dtype.itemsize, k)
    if pick is None:
        raise ValueError(
            f"symmetric interleaved SpMM cannot tile {D} upper diagonals "
            f"x {k} RHS; use the XLA path"
        )
    T, E = pick
    F = T // E
    G = -(-S // T)
    EB = -(-S // E)
    PL = E * _LANES
    aligned = n % _LANES == 0

    elem_ids, shifted = _interleaved_window_helpers(k)

    def kernel(xm_ref, xf_ref, xb_ref, d_ref, dh_ref, y_ref):
        i = pl.program_id(0)
        xm = xm_ref[...]
        if G * T > S or not aligned:
            xm = jnp.where(
                i * T * _LANES + elem_ids(T) < n, xm, jnp.zeros_like(xm)
            )
        xf = jnp.where(
            (i + 1) * T * _LANES + elem_ids(E) < n,
            xf_ref[...],
            jnp.zeros_like(xf_ref),
        )
        xb = jnp.where(i > 0, xb_ref[...], jnp.zeros_like(xb_ref))

        xmf = jnp.concatenate([xm, xf], axis=0)
        acc = jnp.zeros((k * T, _LANES), y_ref.dtype)
        for d, o in enumerate(offsets):
            dk = jnp.repeat(d_ref[d].astype(acc.dtype), k, axis=0)
            acc = acc + dk * shifted(xmf, o, T)
            if o > 0:
                dhk = jnp.repeat(dh_ref[d].astype(acc.dtype), k, axis=0)
                z = jnp.concatenate([dhk * xb, dk * xm], axis=0)
                acc = acc + shifted(z, PL - o, T)
        if G * T > S or not aligned:
            acc = jnp.where(
                i * T * _LANES + elem_ids(T) < n, acc, jnp.zeros_like(acc)
            )
        y_ref[...] = acc

    clamp_f = lambda i: (jnp.minimum(F * i + F, EB - 1), _I0)
    clamp_b = lambda i: (jnp.maximum(F * i - 1, 0), _I0)
    return pl.pallas_call(
        kernel,
        grid=(G,),
        in_specs=[
            pl.BlockSpec(
                (k * T, _LANES), lambda i: (i, _I0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((k * E, _LANES), clamp_f, memory_space=pltpu.VMEM),
            pl.BlockSpec((k * E, _LANES), clamp_b, memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (D, T, _LANES), lambda i: (_I0, i, _I0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (D, E, _LANES),
                lambda i: (_I0, jnp.maximum(F * i - 1, 0), _I0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (k * T, _LANES), lambda i: (i, _I0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((k * S, _LANES), XI.dtype),
        compiler_params=_compiler_params(interpret),
        interpret=interpret,
    )(XI, XI, XI, data3, data3)


# ---------------------------------------------------------------------------
# Two-level interleave: wide RHS blocks (k > 16) in ONE matrix stream.
#
# The single-level interleaved kernel folds k panels into the sublane
# axis; its VMEM working set scales with k, so k > 16 cannot tile and
# DIAMatrix.matmat auto-splits into 16-wide passes — re-streaming the
# diagonal values once PER PASS.  For narrow bands that is cheap (x/y
# traffic dominates), but on RCM-banded unstructured matrices the band
# is hundreds of diagonals wide and the VALUES dominate: each extra
# pass nearly doubles total HBM traffic.
#
# The grouped layout fixes it with a second grid dimension: panels are
# interleaved in groups of kb <= 16 (inner level: sublane fold, exactly
# interleave_panels per group), the KO = ceil(k/kb) groups stacked on a
# leading axis (outer level).  The kernel runs grid (G, KO) with the
# OUTER-GROUP index fastest-varying and the data BlockSpec index map a
# function of the row tile only — Mosaic's pipeline skips the DMA when
# consecutive grid steps map the same block, so the diagonal values of
# each row tile are fetched ONCE and shared by all KO groups (the same
# revisit rule the clamped halos rely on).  Matrix traffic for ANY k
# equals the k=1 stream; x/y traffic is the unavoidable 2k words/row.
# Each x/y block is one contiguous (kb*T, 128) chunk, preserving the
# DMA-chunk win of the single-level layout (benchmarks/spmm_probe4.py).
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("kb", "m"))
def interleave_panels_grouped(XT, kb, m=None):
    """(k, m) RHS-major panels -> grouped-interleaved (KO, kb*Sx, 128):
    group j's slab is ``interleave_panels(XT[j*kb:(j+1)*kb])`` (row
    ``s*kb + i`` holds element-row ``s`` of the group's panel ``i``).
    k is zero-padded up to KO*kb panels, m up to Sx*128 elements.  One
    XLA transpose — do it ONCE per solve, not per product."""
    k, m_in = XT.shape
    m = m_in if m is None else m
    Sx = -(-m // _LANES)
    KO = -(-k // kb)
    if Sx * _LANES != m_in:
        XT = jnp.concatenate(
            [XT, jnp.zeros((k, Sx * _LANES - m_in), XT.dtype)], axis=1
        )
    if KO * kb != k:
        XT = jnp.concatenate(
            [XT, jnp.zeros((KO * kb - k, Sx * _LANES), XT.dtype)], axis=0
        )
    return jnp.transpose(
        XT.reshape(KO, kb, Sx, _LANES), (0, 2, 1, 3)
    ).reshape(KO, kb * Sx, _LANES)


@functools.partial(jax.jit, static_argnames=("kb", "k", "n"))
def deinterleave_panels_grouped(YG, kb, k, n):
    """Inverse of :func:`interleave_panels_grouped`: (KO, kb*S, 128) ->
    (k, n) RHS-major panels (padding groups/rows trimmed)."""
    KO = YG.shape[0]
    S = YG.shape[1] // kb
    out = jnp.transpose(
        YG.reshape(KO, S, kb, _LANES), (0, 2, 1, 3)
    ).reshape(KO * kb, S * _LANES)
    return out[:k, :n]


@functools.partial(
    jax.jit, static_argnames=("offsets", "n", "m", "interpret", "dstart")
)
def dia_spmm_grouped(data, XG, offsets, n, m, interpret=False, dstart=0):
    """Wide-RHS DIA SpMM on GROUPED-INTERLEAVED panels: XG is
    (KO, kb*Sx, 128) from :func:`interleave_panels_grouped`; returns the
    product in the same layout ((KO, kb*S, 128), S = data row-blocks).

    Grid is (row tiles, outer groups) with the group index minor: the
    data tile's index map depends on the row tile only, so Mosaic
    fetches each diagonal slab ONCE per row tile and revisits it for
    all KO groups — the k > 16 multi-vector capability (the reference
    names multi-vector kernels as its missing critical optimization,
    README.md:83) at single-stream matrix traffic.  ``dstart``
    addresses a leading-axis slab of ``data`` purely through the
    BlockSpec index map (the chunked wide-band path; must be a multiple
    of ``len(offsets)``)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    D = len(offsets)
    if dstart % max(D, 1) != 0:
        raise ValueError("dstart must be a multiple of len(offsets)")
    dblock = np.int32(dstart // max(D, 1))
    data3 = _dia3(data)
    S = data3.shape[1]
    o_min = min(min(offsets), 0)
    o_max = max(max(offsets), 0)
    hrows = max(-o_min, o_max) // _LANES + 2

    Sx = -(-m // _LANES)
    KO = XG.shape[0]
    kb = XG.shape[1] // Sx
    if kb * Sx != XG.shape[1] or XG.shape[2] != _LANES:
        raise ValueError(
            f"XG shape {XG.shape} is not (KO, kb*{Sx}, {_LANES}) — pass "
            "panels through interleave_panels_grouped"
        )

    pick = _spmm_tile_pick(S, hrows, D, data.dtype.itemsize, k=kb)
    if pick is None:
        raise ValueError(
            f"grouped SpMM cannot fit {D} diagonals x {kb} inner RHS in "
            "VMEM; reduce kb or use DIAMatrix.matmat (XLA paths)"
        )
    T, E = pick
    F = T // E
    G = -(-S // T)
    PL = E * _LANES

    EBx = -(-Sx // E)
    TBx = -(-Sx // T)
    exact = (m % _LANES == 0) and (S == Sx) and (G * T == S)

    elem_ids, shifted = _interleaved_window_helpers(kb)

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
        acc = jnp.zeros((kb * T, _LANES), y_ref.dtype)
        for d, o in enumerate(offsets):
            dk = jnp.repeat(d_ref[d].astype(acc.dtype), kb, axis=0)
            acc = acc + dk * shifted(xcat, PL + o, T)
        if not exact:
            acc = jnp.where(base + elem_ids(T) < n, acc, jnp.zeros_like(acc))
        y_ref[0] = acc

    clamp_m = lambda i, j: (j, jnp.minimum(i, TBx - 1), _I0)
    clamp_f = lambda i, j: (j, jnp.minimum(F * i + F, EBx - 1), _I0)
    clamp_b = lambda i, j: (
        j,
        jnp.maximum(jnp.minimum(F * i - 1, EBx - 1), 0),
        _I0,
    )
    return pl.pallas_call(
        kernel,
        grid=(G, KO),
        in_specs=[
            pl.BlockSpec(
                (1, kb * T, _LANES), clamp_m, memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, kb * E, _LANES), clamp_f, memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, kb * E, _LANES), clamp_b, memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (D, T, _LANES),
                lambda i, j: (dblock, i, _I0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, kb * T, _LANES), lambda i, j: (j, i, _I0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((KO, kb * S, _LANES), XG.dtype),
        compiler_params=_compiler_params(interpret),
        interpret=interpret,
    )(XG, XG, XG, data3)


def dia_spmm_grouped_chunked(
    data, XG, offsets, n, m, interpret=False, max_chunk=None
):
    """Wide-band wide-RHS SpMM: VMEM-sized diagonal slabs through
    :func:`dia_spmm_grouped` (XLA sums the partials).  Each slab's
    values stream ONCE for all k = KO*kb right-hand sides — where the
    16-wide auto-split re-streams the whole band per pass, this path's
    matrix traffic is pass-count-independent (the win case: LOBPCG /
    block solvers with wide bases on RCM-banded general matrices)."""
    data3 = _dia3(data)
    S = data3.shape[1]
    Sx = -(-m // _LANES)
    kb = XG.shape[1] // Sx
    plan = chunk_plan(
        offsets, S, data.dtype.itemsize, max_chunk=max_chunk, k=kb
    )
    if plan is None:
        raise ValueError(
            "chunked grouped SpMM cannot tile this band at this inner "
            "RHS count; reduce kb or use DIAMatrix.matmat (XLA paths)"
        )
    Y = None
    for start, width in plan:
        sub = tuple(offsets[start : start + width])
        part = dia_spmm_grouped(
            data3, XG, sub, n, m, interpret=interpret, dstart=start
        )
        Y = part if Y is None else Y + part
    return Y
