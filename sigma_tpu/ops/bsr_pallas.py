"""Grouped-layout BSR SpMV/SpMM + a scalar-prefetch pallas kernel.

Measured outcome (v5e, 1M rows, (8,128) blocks, 67M slots) — the
round-1 "BSR is slow" number was a *format-fit* artifact, not a gather
problem: a 7-point stencil expanded to (8,128) blocks is ~99% explicit
zeros, so the 0.57 Gnnz/s real-nonzero rate was ~580 Gnnz/s of slot
streaming.  On genuinely block-dense operators the XLA grouped form here
runs at **173 Gnnz/s slot-rate (~84% of the HBM roofline)** — gathering
whole (bw, k) rows is a contiguous 512-byte transfer per block, nothing
like a per-element gather.  The scalar-prefetch pallas kernel
(``bsr_grouped_spmv``; each grid step's x-block fetched via an index map
reading prefetched column indices — DMA-level gather) measured
per-step-latency-bound at 16 Gnnz/s and is therefore OPT-IN
(``GroupedBSR.use_pallas_kernel``); the XLA path is the default.

Layout (:class:`GroupedBSR`, built host-side at freeze): each block row's
blocks are padded to a multiple of ``group`` = B (zero blocks pointing at
column-block 0 — harmless in arithmetic, the ellpack padding trick); rows
with no blocks get one zero group, so every output block is visited by a
contiguous run of grid steps.  Group g stores

* ``gdata[g]``: (bh, B*bw) — its B value blocks side by side, so the
  whole group's contribution is ONE (bh, B*bw) @ (B*bw, nrhs) matmul on
  the MXU;
* ``gcols[g, j]``: the column-block index of slice j (scalar-prefetch);
* ``grow[g]``: the owning block row (ascending).

Grouping amortizes the per-step pipeline overhead over B blocks and turns
B small matvecs into one wide matmul — the "scalar-prefetch block-DMA
gather" named in the round-1 roadmap (CLAUDE.md).

Reference lineage: the block format itself is the optimization the
reference names as missing (``/root/reference/README.md:84``).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import ClassVar, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# int32 index-map constant (python ints become i64 under jax_enable_x64,
# which Mosaic rejects in BlockSpec index maps)
_I0 = np.int32(0)

from sigma_tpu.operators.linear_operator import LinearOperator

__all__ = ["GroupedBSR", "bsr_grouped_spmv"]


@functools.partial(
    jax.jit,
    static_argnames=("nb_rows", "nb_cols", "block_shape", "B", "interpret"),
)
def bsr_grouped_spmv(
    gdata, gcols, grow, x, nb_rows, nb_cols, block_shape, B, interpret=False
):
    """y2 = grouped-BSR SpMV/SpMM.  x: (nb_cols*bw, k); returns
    (nb_rows*bh, k).  Pass k=1 column for a plain matvec."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    bh, bw = block_shape
    n_groups = gdata.shape[0]
    k = x.shape[1]
    x3 = x.reshape(nb_cols, bw, k)

    # scalar-prefetch arrays live in SMEM (~1 MB): gcols is passed FLAT
    # (a 2-D SMEM array would be lane-padded to 128 wide, 16x waste)
    gcols_flat = gcols.reshape(-1)

    def kernel(gcols_ref, grow_ref, *refs):
        xrefs, data_ref, y_ref = refs[:B], refs[B], refs[B + 1]
        i = pl.program_id(0)
        xcat = jnp.concatenate([r[0] for r in xrefs], axis=0)  # (B*bw, k)
        acc = jnp.dot(
            data_ref[0], xcat, preferred_element_type=y_ref.dtype,
            precision=jax.lax.Precision.HIGHEST,  # full-f32 MXU passes
        )  # (bh, k) — one wide MXU matmul per group

        prev = grow_ref[jnp.maximum(i - 1, 0)]
        first = jnp.logical_or(i == 0, grow_ref[i] != prev)

        @pl.when(first)
        def _():
            y_ref[0] = acc

        @pl.when(jnp.logical_not(first))
        def _():
            y_ref[0] = y_ref[0] + acc

    def xmap(j):
        return lambda i, gcols_ref, grow_ref: (gcols_ref[i * B + j], _I0, _I0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_groups,),
        in_specs=[
            pl.BlockSpec((1, bw, k), xmap(j), memory_space=pltpu.VMEM)
            for j in range(B)
        ]
        + [
            pl.BlockSpec(
                (1, bh, B * bw),
                lambda i, gcols_ref, grow_ref: (i, _I0, _I0),
                memory_space=pltpu.VMEM,
            )
        ],
        out_specs=pl.BlockSpec(
            (1, bh, k),
            lambda i, gcols_ref, grow_ref: (grow_ref[i], _I0, _I0),
            memory_space=pltpu.VMEM,
        ),
    )
    y3 = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nb_rows, bh, k), x.dtype),
        interpret=interpret,
    )(gcols_flat, grow, *([x3] * B), gdata)
    return y3.reshape(nb_rows * bh, k)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True, repr=False)
class GroupedBSR(LinearOperator):
    """BSR matrix in the kernel-native grouped layout (see module doc).

    Built once from a :class:`sigma_tpu.matrix.formats.BSRMatrix` via
    :meth:`from_bsr`; apply with ``matvec``/``matmat``.  On non-TPU
    backends the jnp fallback (einsum + segment_sum, identical math) is
    used so the container is portable.
    """

    gdata: jax.Array  # (n_groups, bh, B*bw)
    gcols: jax.Array  # (n_groups, B) int32
    grow: jax.Array  # (n_groups,) int32, ascending
    shape: Tuple[int, int] = dataclasses.field(metadata=dict(static=True))
    block_shape: Tuple[int, int] = dataclasses.field(
        metadata=dict(static=True)
    )
    group: int = dataclasses.field(metadata=dict(static=True))

    format: ClassVar[str] = "bsr_grouped"

    @property
    def nb_rows(self) -> int:
        return -(-self.shape[0] // self.block_shape[0])

    @property
    def nb_cols(self) -> int:
        return -(-self.shape[1] // self.block_shape[1])

    @property
    def dtype(self):
        return self.gdata.dtype

    @classmethod
    def from_bsr(cls, A, group: int = 8) -> "GroupedBSR":
        """Host-side regrouping of a BSRMatrix (freeze-time, like all
        layout decisions)."""
        g = A.graph
        bh, bw = g.block_shape
        nbr = g.nb_rows
        brows = np.asarray(g.block_rows)[: g.nnzb].astype(np.int64)
        bcols = np.asarray(g.indices)[: g.nnzb].astype(np.int64)
        data = np.asarray(A.data)[: g.nnzb]

        deg = np.bincount(brows, minlength=nbr)
        groups_per_row = np.maximum(-(-deg // group), 1)
        n_groups = int(groups_per_row.sum())
        row_gstart = np.concatenate([[0], np.cumsum(groups_per_row)])

        gdata = np.zeros((n_groups, bh, group * bw), dtype=data.dtype)
        gcols = np.zeros((n_groups, group), dtype=np.int32)
        grow = np.repeat(
            np.arange(nbr, dtype=np.int32), groups_per_row
        )
        # slot of each block within its row (brows is sorted)
        indptr = np.concatenate([[0], np.cumsum(deg)])
        slot = np.arange(brows.size) - indptr[brows]
        gidx = row_gstart[brows] + slot // group
        lane = slot % group
        gcols[gidx, lane] = bcols
        for j in range(group):
            sel = lane == j
            gdata[gidx[sel], :, j * bw : (j + 1) * bw] = data[sel]
        return cls(
            gdata=jnp.asarray(gdata),
            gcols=jnp.asarray(gcols),
            grow=jnp.asarray(grow),
            shape=A.shape,
            block_shape=(bh, bw),
            group=int(group),
        )

    def _pad_x(self, x):
        bw = self.block_shape[1]
        mp = self.nb_cols * bw
        if x.shape[0] != mp:
            x = jnp.pad(x, [(0, mp - x.shape[0])] + [(0, 0)] * (x.ndim - 1))
        return x

    # Measured on v5e (1M rows, (8,128) blocks, 67M slots): the XLA
    # grouped form runs at 173 Gnnz/s slot-rate (~84% of the HBM
    # roofline streaming gdata; the (bw, k)-row gathers are whole
    # 512-byte transfers, nothing like the per-element gather that
    # motivated this module), while the scalar-prefetch pallas kernel is
    # per-step-latency-bound at 16 Gnnz/s.  XLA is therefore the default
    # everywhere; the kernel stays available for re-evaluation
    # (use_pallas_kernel=True) on runtimes with cheaper grid steps.
    use_pallas_kernel: ClassVar[bool] = False

    def _apply(self, X):
        try:
            on_tpu = jax.default_backend() == "tpu"
        except RuntimeError:
            on_tpu = False
        Xp = self._pad_x(X)
        # scalar-prefetch index arrays must fit SMEM (~1 MB)
        smem_ok = 4 * (self.gcols.size + self.grow.size) <= 800_000
        if (
            self.use_pallas_kernel
            and on_tpu
            and smem_ok
            and X.dtype in (jnp.float32, jnp.bfloat16)
        ):
            Y = bsr_grouped_spmv(
                self.gdata, self.gcols, self.grow, Xp,
                self.nb_rows, self.nb_cols, self.block_shape, self.group,
            )
        else:
            # the default: grouped math in XLA (measured at roofline)
            bh, bw = self.block_shape
            k = Xp.shape[1]
            X3 = Xp.reshape(self.nb_cols, bw, k)
            gath = X3[self.gcols]  # (n_groups, B, bw, k)
            gath = gath.reshape(self.gdata.shape[0], self.group * bw, k)
            # matrix values cast UP to the operand dtype (the DIA-kernel
            # contract): a bf16-valued operator on f32 vectors must
            # accumulate in f32, not silently downcast the RHS to bf16
            Yg = jnp.einsum(
                "ghc,gck->ghk", self.gdata.astype(Xp.dtype), gath,
                precision=jax.lax.Precision.HIGHEST,
            )
            Y = jax.ops.segment_sum(
                Yg, self.grow, num_segments=self.nb_rows
            ).reshape(self.nb_rows * bh, k)
        return Y[: self.shape[0]]

    def matvec(self, x):
        return self._apply(x[:, None])[:, 0]

    def matmat(self, X):
        return self._apply(X)

    def __repr__(self) -> str:
        return (
            f"GroupedBSR(shape={self.shape}, block={self.block_shape}, "
            f"groups={self.gdata.shape[0]} x {self.group})"
        )
