"""Concrete sparse matrix formats with XLA-native compute kernels.

Reference lineage:

* ``cs_matrices.f90`` (CSR :112-151 / CSC :156-195; hot kernels
  ``csr_matvec_add:600-622`` row dot-accumulate, ``csc_matvec_add:627-647``
  column scatter; the CSR/CSC transpose-kernel duality at :148-149,192-193)
  → :class:`CSRMatrix` / :class:`CSCMatrix`
* ``ellpack_matrices.f90`` (fixed-trip-count matvec :640-665 — the
  reference's closest analogue of a TPU kernel) → :class:`ELLMatrix`
* ``coo`` value layout → :class:`COOMatrix`
* block format (absent in reference, README.md:84) → :class:`BSRMatrix`,
  dense (bh, bw) blocks whose SpMV/SpMM are batched small matmuls.

All kernels here are whole-array XLA programs (gather + multiply +
``segment_sum`` scatter) — no cursors, no per-edge control flow.  Pallas
TPU kernels for the hot paths live in :mod:`sigma_tpu.ops` and are selected
automatically when profitable; these jnp forms are the portable reference
semantics and the CPU/testing path.

Padding is always value-0 at structurally padded slots, so no masking is
ever needed in arithmetic.
"""

from __future__ import annotations

import dataclasses
from typing import ClassVar

import jax
import jax.numpy as jnp
from jax import lax
import numpy as np

from sigma_tpu.graph.graph import (
    BSRGraph,
    DIAGraph,
    COOGraph,
    CSCGraph,
    CSRGraph,
    ELLGraph,
)
from sigma_tpu.matrix.base import SparseMatrix

__all__ = ["CSRMatrix", "CSCMatrix", "COOMatrix", "ELLMatrix", "BSRMatrix", "DIAMatrix"]


def _segment_sum(vals, ids, n):
    # ids out of range [0, n) are dropped — padding carries sentinel ids.
    return jax.ops.segment_sum(vals, ids, num_segments=n)


def zero_padded_window(x, o: int, length: int, total: int):
    """Zero-padded window x[o : o + length] padded to ``total`` — built by
    concatenation (not one shared padded buffer): XLA fuses the concats
    into the consuming FMA, whereas a shared materialized pad becomes an
    extra full pass over HBM (measured 3x slower).  Shared by the DIA
    kernels and the distributed DIA layout."""
    m = x.shape[0]
    lo, hi = max(0, o), min(m, length + o)
    if hi <= lo:
        return jnp.zeros((total,) + x.shape[1:], dtype=x.dtype)
    parts = []
    left = lo - o
    right = total - (left + hi - lo)
    if left:
        parts.append(jnp.zeros((left,) + x.shape[1:], dtype=x.dtype))
    parts.append(x[lo:hi])
    if right:
        parts.append(jnp.zeros((right,) + x.shape[1:], dtype=x.dtype))
    return jnp.concatenate(parts) if len(parts) > 1 else parts[0]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True, repr=False)
class CSRMatrix(SparseMatrix):
    """Row-compressed matrix.  matvec: gather x at column indices, multiply,
    segment-sum by row (the vectorized form of ``csr_matvec_add``)."""

    graph: CSRGraph
    data: jax.Array  # (nnz_pad,)

    format: ClassVar[str] = "csr"
    is_get_row_fast: ClassVar[bool] = True
    is_get_column_fast: ClassVar[bool] = False

    @classmethod
    def _graph_class(cls):
        return CSRGraph

    @classmethod
    def _data_shape(cls, graph):
        return graph.indices.shape

    @classmethod
    def from_csr_arrays(cls, n, m, indptr, cols, vals, dtype=None) -> "CSRMatrix":
        """Trusted constructor from host CSR arrays (rows sorted and
        deduplicated — no re-sort).  Pairs with the compiled host algebra
        (``native.spgemm``/``csr_add``/``csr_transpose``), whose outputs are
        already in this form."""
        g = CSRGraph.from_csr(n, m, indptr, cols)
        vals = np.asarray(vals).ravel()
        flat = np.zeros(g.indices.shape[0], dtype=vals.dtype)
        flat[: vals.size] = vals
        from sigma_tpu.utils.dtypes import default_real_dtype

        return cls(graph=g, data=jnp.asarray(flat, dtype=dtype or default_real_dtype()))

    def entries(self):
        # the stored layout IS row-major sorted COO: flat position p holds
        # edge (row_ids[p], indices[p]) — skip base's edge_positions lookup
        # (a full keys-build + searchsorted pass, ~45 s at 1M-row AMG setup)
        g = self.graph
        rows = np.asarray(g.row_ids)[: g.nnz].astype(np.int64)
        cols = np.asarray(g.indices)[: g.nnz].astype(np.int64)
        vals = np.asarray(self.data).reshape(-1)[: g.nnz]
        return rows, cols, vals

    def diagonal(self) -> jax.Array:
        # HOST-SIDE contract (like entries()): reads self.data via
        # np.asarray, so it forces a device->host readback and cannot be
        # called on a traced matrix under jax.jit — unlike
        # DIAMatrix.diagonal, which is pure jnp.  Chosen deliberately: the
        # AMG setup reads a diagonal per level on the host, and masking the
        # stored int32 index arrays in numpy beats base's edge_positions
        # (which builds int64 keys over all nnz)
        g = self.graph
        rid = np.asarray(g.row_ids)[: g.nnz]
        cid = np.asarray(g.indices)[: g.nnz]
        mask = rid == cid
        k = min(self.shape)
        d = np.zeros(k, dtype=np.asarray(self.data).dtype)
        d[rid[mask]] = np.asarray(self.data).reshape(-1)[: g.nnz][mask]
        return jnp.asarray(d, dtype=self.dtype)

    def matvec(self, x):
        g = self.graph
        prod = self.data * x[g.indices]
        return _segment_sum(prod, g.row_ids, g.shape[0])

    def rmatvec(self, x):
        g = self.graph
        # gather by row (clamped at pad; data=0 there), scatter-add by column
        prod = self.data * x[jnp.minimum(g.row_ids, g.shape[0] - 1)]
        return jnp.zeros(g.shape[1], dtype=prod.dtype).at[g.indices].add(prod)

    def matmat(self, X):
        g = self.graph
        prod = self.data[:, None] * X[g.indices, :]
        return _segment_sum(prod, g.row_ids, g.shape[0])

    def rmatmat(self, X):
        g = self.graph
        prod = self.data[:, None] * X[jnp.minimum(g.row_ids, g.shape[0] - 1), :]
        return jnp.zeros((g.shape[1],) + X.shape[1:], dtype=prod.dtype).at[
            g.indices
        ].add(prod)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True, repr=False)
class CSCMatrix(SparseMatrix):
    """Column-compressed matrix: the stored arrays are the CSR compression of
    A^T, so matvec/rmatvec are CSR's kernels swapped — the same duality the
    reference wires up at ``cs_matrices.f90:148-149,192-193``."""

    graph: CSCGraph
    data: jax.Array  # (nnz_pad,) column-major order

    format: ClassVar[str] = "csc"
    is_get_row_fast: ClassVar[bool] = False
    is_get_column_fast: ClassVar[bool] = True

    @classmethod
    def _graph_class(cls):
        return CSCGraph

    @classmethod
    def _data_shape(cls, graph):
        return graph.indices.shape

    def matvec(self, x):
        g = self.graph
        prod = self.data * x[jnp.minimum(g.col_ids, g.shape[1] - 1)]
        return jnp.zeros(g.shape[0], dtype=prod.dtype).at[g.indices].add(prod)

    def rmatvec(self, x):
        g = self.graph
        prod = self.data * x[g.indices]
        return _segment_sum(prod, g.col_ids, g.shape[1])

    def matmat(self, X):
        g = self.graph
        prod = self.data[:, None] * X[jnp.minimum(g.col_ids, g.shape[1] - 1), :]
        return jnp.zeros((g.shape[0],) + X.shape[1:], dtype=prod.dtype).at[
            g.indices
        ].add(prod)

    def rmatmat(self, X):
        g = self.graph
        prod = self.data[:, None] * X[g.indices, :]
        return _segment_sum(prod, g.col_ids, g.shape[1])


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True, repr=False)
class COOMatrix(SparseMatrix):
    """Coordinate matrix (sorted row-major at freeze time)."""

    graph: COOGraph
    data: jax.Array  # (nnz_pad,)

    format: ClassVar[str] = "coo"
    is_get_row_fast: ClassVar[bool] = False
    is_get_column_fast: ClassVar[bool] = False

    @classmethod
    def _graph_class(cls):
        return COOGraph

    @classmethod
    def _data_shape(cls, graph):
        return graph.rows.shape

    def matvec(self, x):
        g = self.graph
        prod = self.data * x[g.cols]
        return _segment_sum(prod, g.rows, g.shape[0])

    def rmatvec(self, x):
        g = self.graph
        prod = self.data * x[jnp.minimum(g.rows, g.shape[0] - 1)]
        return jnp.zeros(g.shape[1], dtype=prod.dtype).at[g.cols].add(prod)

    def matmat(self, X):
        g = self.graph
        prod = self.data[:, None] * X[g.cols, :]
        return _segment_sum(prod, g.rows, g.shape[0])

    def rmatmat(self, X):
        g = self.graph
        prod = self.data[:, None] * X[jnp.minimum(g.rows, g.shape[0] - 1), :]
        return jnp.zeros((g.shape[1],) + X.shape[1:], dtype=prod.dtype).at[
            g.cols
        ].add(prod)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True, repr=False)
class ELLMatrix(SparseMatrix):
    """ELLPACK matrix: values in a dense (n, width) array mirroring the
    topology layout.  matvec is a fixed-trip-count gather/multiply/row-sum —
    the regular shape ``ellpack_matvec_add`` (``ellpack_matrices.f90:
    640-665``) was built for, realized as one whole-array XLA program."""

    graph: ELLGraph
    data: jax.Array  # (n, width)

    format: ClassVar[str] = "ell"
    is_get_row_fast: ClassVar[bool] = True
    is_get_column_fast: ClassVar[bool] = False

    @classmethod
    def _graph_class(cls):
        return ELLGraph

    @classmethod
    def _data_shape(cls, graph):
        return graph.cols.shape

    def matvec(self, x):
        g = self.graph
        return (self.data * x[g.cols]).sum(axis=1)

    def rmatvec(self, x):
        g = self.graph
        prod = self.data * x[:, None]
        return jnp.zeros(g.shape[1], dtype=prod.dtype).at[g.cols].add(prod)

    def matmat(self, X):
        g = self.graph
        # (n, w, k) gather; contiguous over k
        return (self.data[:, :, None] * X[g.cols, :]).sum(axis=1)

    def rmatmat(self, X):
        g = self.graph
        prod = self.data[:, :, None] * X[:, None, :]
        return jnp.zeros((g.shape[1],) + X.shape[1:], dtype=prod.dtype).at[
            g.cols
        ].add(prod)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True, repr=False)
class BSRMatrix(SparseMatrix):
    """Block CSR matrix with dense (bh, bw) value blocks.

    SpMV = batched block matmul + block-row segment sum; SpMM contracts each
    block against a (bw, k) slab — MXU-shaped work.  This is the format the
    reference lists as a missing critical optimization (``README.md:84``).
    """

    graph: BSRGraph
    data: jax.Array  # (nnzb_pad, bh, bw)

    format: ClassVar[str] = "bsr"
    is_get_row_fast: ClassVar[bool] = True
    is_get_column_fast: ClassVar[bool] = False

    @classmethod
    def _graph_class(cls):
        return BSRGraph

    @classmethod
    def _data_shape(cls, graph):
        return (graph.indices.shape[0],) + graph.block_shape

    def _format_kwargs(self):
        return dict(block_shape=self.graph.block_shape)

    def _format_kwargs_transposed(self):
        bh, bw = self.graph.block_shape
        return dict(block_shape=(bw, bh))

    @classmethod
    def _coerce_graph(cls, graph):
        if isinstance(graph, BSRGraph):
            return graph
        rows, cols = graph.edges_numpy()
        return BSRGraph.from_coo(graph.shape[0], graph.shape[1], rows, cols)

    def _coerce_graph_from_builder(self, b):
        rows, cols = b.edges()
        return BSRGraph.from_coo(
            b.n, b.m, rows, cols, block_shape=self.graph.block_shape
        )

    def _padded_x(self, x):
        g = self.graph
        bw = g.block_shape[1]
        mp = g.nb_cols * bw
        if x.shape[0] != mp:
            x = jnp.pad(x, [(0, mp - x.shape[0])] + [(0, 0)] * (x.ndim - 1))
        return x

    def matvec(self, x):
        g = self.graph
        bh, bw = g.block_shape
        xb = self._padded_x(x).reshape(g.nb_cols, bw)
        gathered = xb[g.indices]  # (nnzb_pad, bw)
        yb = jnp.einsum(
            "bij,bj->bi", self.data, gathered.astype(self.dtype),
            precision=jax.lax.Precision.HIGHEST,
        )
        y = _segment_sum(yb, g.block_rows, g.nb_rows)
        return y.reshape(-1)[: g.shape[0]]

    def grouped(self, group: int = 8):
        """Kernel-native grouped layout (host-side regroup): block-level
        DMA-gather SpMV/SpMM on TPU via the scalar-prefetch pallas kernel
        (:class:`sigma_tpu.ops.bsr_pallas.GroupedBSR`) — the fast
        production path for block matrices; this XLA gather form stays the
        portable reference semantics."""
        from sigma_tpu.ops.bsr_pallas import GroupedBSR

        return GroupedBSR.from_bsr(self, group=group)

    def rmatvec(self, x):
        g = self.graph
        bh, bw = g.block_shape
        np_rows = g.nb_rows * bh
        xp = jnp.pad(x, (0, np_rows - x.shape[0])).reshape(g.nb_rows, bh)
        gathered = xp[jnp.minimum(g.block_rows, g.nb_rows - 1)]
        yb = jnp.einsum(
            "bij,bi->bj", self.data, gathered.astype(self.dtype),
            precision=jax.lax.Precision.HIGHEST,
        )
        y = jnp.zeros((g.nb_cols, bw), dtype=yb.dtype).at[g.indices].add(yb)
        return y.reshape(-1)[: g.shape[1]]

    def matmat(self, X):
        g = self.graph
        bh, bw = g.block_shape
        k = X.shape[1]
        Xb = self._padded_x(X).reshape(g.nb_cols, bw, k)
        gathered = Xb[g.indices]  # (nnzb_pad, bw, k)
        Yb = jnp.einsum(
            "bij,bjk->bik", self.data, gathered.astype(self.dtype),
            precision=jax.lax.Precision.HIGHEST,
        )
        Y = _segment_sum(Yb, g.block_rows, g.nb_rows)
        return Y.reshape(-1, k)[: g.shape[0]]

    def rmatmat(self, X):
        g = self.graph
        bh, bw = g.block_shape
        k = X.shape[1]
        np_rows = g.nb_rows * bh
        Xp = jnp.pad(X, ((0, np_rows - X.shape[0]), (0, 0))).reshape(
            g.nb_rows, bh, k
        )
        gathered = Xp[jnp.minimum(g.block_rows, g.nb_rows - 1)]
        Yb = jnp.einsum(
            "bij,bik->bjk", self.data, gathered.astype(self.dtype),
            precision=jax.lax.Precision.HIGHEST,
        )
        Y = jnp.zeros((g.nb_cols, bw, k), dtype=Yb.dtype).at[g.indices].add(Yb)
        return Y.reshape(-1, k)[: g.shape[1]]


def _band_reach(offs) -> int:
    """One-sided band reach max(|offset|) of a non-empty offset tuple —
    THE shared expression of every pallas halo-fit gate (review dedup;
    an inline copy once dropped the empty-offsets guard).  Callers must
    handle ``offs == ()`` before calling (the zero-diagonal matrix is a
    routing decision, not a reach)."""
    return max(max(max(offs), 0), -min(min(offs), 0))


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True, repr=False)
class DIAMatrix(SparseMatrix):
    """Diagonal-format matrix: ``data[d, i]`` = A[i, i + offset_d].

    The TPU-native stencil format (no reference analogue; see
    :class:`sigma_tpu.graph.graph.DIAGraph`).  SpMV is **gather-free**:
    pad x once, then one statically-shifted contiguous window
    multiply-add per diagonal — no index array is even stored, so the
    HBM traffic per nonzero is value + x-read only, below what any
    indexed format can reach.  Out-of-range slots hold value 0.
    Diagonal-format matrix: ``data[d, i]`` = A[i, i + offset_d].

    The TPU-native stencil format (no reference analogue; see
    :class:`sigma_tpu.graph.graph.DIAGraph`).  SpMV is **gather-free**:
    pad x once, then one statically-shifted contiguous window
    multiply-add per diagonal — no index array is even stored, so the
    HBM traffic per nonzero is value + x-read only, below what any
    indexed format can reach.  Out-of-range slots hold value 0.
    

    DTYPE CONVENTION: every DIA apply computes in the OPERAND's
    dtype (matrix values cast to x.dtype, in-VMEM on the pallas
    paths) — the mixed-precision contract the bf16-value /
    f32-vector kernels are built on.  This differs from the
    gather formats (CSR/ELL promote by numpy rules); apply an
    f64 operand if f64 accumulation is wanted."""

    graph: "DIAGraph"
    data: jax.Array  # (n_diags, stride/128, 128) — the kernel-native tile
    # layout.  Storing the tiles 3-D (not (n_diags, stride)) matters: a
    # 2-D jit ARGUMENT gets a (sublane, 128)-tiled device layout that the
    # pallas custom call cannot consume, and XLA inserts the relayout
    # AFTER loop-invariant code motion — i.e. INSIDE every solver
    # iteration (measured 2.03 -> 0.55 ms per 10M-row SpMV).  Flat element
    # order is unchanged, so flat-position machinery (set_values/entries/
    # edge_positions) is layout-agnostic; use :attr:`data2d` for
    # per-diagonal row views.

    format: ClassVar[str] = "dia"
    is_get_row_fast: ClassVar[bool] = True
    is_get_column_fast: ClassVar[bool] = True

    @classmethod
    def _graph_class(cls):
        from sigma_tpu.graph.graph import DIAGraph

        return DIAGraph

    @classmethod
    def _data_shape(cls, graph):
        return (graph.n_diags, graph.stride // 128, 128)

    @property
    def data2d(self) -> jax.Array:
        """(n_diags, stride) view: data2d[d, i] = A[i, i + offsets[d]]."""
        return self.data.reshape(self.graph.n_diags, self.graph.stride)

    def _window(self, x, o: int, length: int, total: int):
        return zero_padded_window(x, o, length, total)

    # above this many diagonals the unrolled static-window formulation is
    # replaced by a lax.scan with dynamic slices (bounded compile time for
    # wide bands, e.g. RCM-reordered general matrices -> banded DIA)
    _SCAN_THRESHOLD: ClassVar[int] = 24

    # Minimum size for the blocked pallas kernel.  Measured on v5e (one
    # session, 2.1M-row 7-pt Laplacian): blocked 325 / VMEM-resident pallas
    # 113 / XLA windows 47 Gnnz/s — the blocked kernel's O(1) x traffic per
    # tile beats both the full-x-operand pallas refetch and XLA's
    # per-diagonal window reads at every size tried, so it is the default
    # whenever the tile grid is nontrivial (and mandatory past the ~3.5M-row
    # XLA VMEM cliff, BENCHMARKS.md).
    _PALLAS_MIN_ELEMS: ClassVar[int] = 65_536

    def _pallas_path(self, x):
        """The pallas blocked kernel, when profitable and supported: TPU
        backend, low-precision dtypes, x past the XLA VMEM cliff.  Bands
        too wide to tile in one VMEM working set (RCM-banded general
        matrices, :func:`sigma_tpu.matrix.banded.to_banded_dia`) route to
        the CHUNKED wrapper — still gather-free, diagonal values streamed
        exactly once (else None -> XLA paths)."""
        n, m = self.shape
        if m < self._PALLAS_MIN_ELEMS or x.ndim != 1:
            return None
        if x.dtype not in (jnp.float32, jnp.bfloat16):
            return None
        if self.data.dtype not in (jnp.float32, jnp.bfloat16):
            return None
        try:
            if jax.default_backend() != "tpu":
                return None
        except RuntimeError:
            return None
        from sigma_tpu.ops.spmv_pallas import (
            _LANES,
            _full_tile_pick,
            chunk_plan,
            dia_spmv_pallas_blocked,
            dia_spmv_pallas_chunked,
        )

        offs = self.graph.offsets
        reach = _band_reach(offs)
        pick = _full_tile_pick(
            self.graph.stride // _LANES,
            reach // _LANES + 2,
            len(offs),
            self.data.dtype.itemsize,
        )
        if pick is not None:
            return dia_spmv_pallas_blocked(self.data, x, offs, n, m)
        if (
            chunk_plan(
                offs, self.graph.stride // _LANES, self.data.dtype.itemsize
            )
            is not None
        ):
            return dia_spmv_pallas_chunked(self.data, x, offs, n, m)
        return None

    def matvec(self, x):
        """Gather-free SpMV at HBM speed-of-light: per diagonal, a shifted
        contiguous window FMA in (stride/128, 128) tile layout (measured
        ~92% of v5e HBM bandwidth; see bench.py)."""
        n, m = self.shape
        offs = self.graph.offsets
        if not offs:
            return jnp.zeros((n,), dtype=x.dtype)
        y = self._pallas_path(x)
        if y is not None:
            return y
        if len(offs) > self._SCAN_THRESHOLD:
            return self._matvec_scan(x)
        s = self.graph.stride
        y2 = jnp.zeros((s // 128, 128), dtype=x.dtype)
        for d, o in enumerate(offs):
            w = self._window(x, o, n, s).reshape(s // 128, 128)
            y2 = y2 + self.data[d].astype(x.dtype) * w
        return y2.reshape(-1)[:n]

    def _matvec_scan(self, x):
        """Many-diagonal path: one padded x buffer + a lax.scan whose step
        dynamic-slices the window for its offset — O(1) program size."""
        n, m = self.shape
        offs = self.graph.offsets
        s = self.graph.stride
        o_min = min(min(offs), 0)
        o_max = max(max(offs), 0)
        left = -o_min
        L = s + (o_max - o_min)
        right = L - left - m
        xp = jnp.concatenate(
            [
                jnp.zeros((left,), x.dtype),
                x,
                jnp.zeros((max(right, 0),), x.dtype),
            ]
        )

        off_arr = jnp.asarray(np.asarray(offs) - o_min, dtype=jnp.int32)

        def step(y, inp):
            start, drow = inp
            w = lax.dynamic_slice(xp, (start,), (s,))
            return y + drow.astype(y.dtype) * w, None

        y, _ = lax.scan(
            step, jnp.zeros((s,), x.dtype), (off_arr, self.data2d)
        )
        return y[:n]

    def _padded_frame(self, x, length):
        """(xp, off_arr): zero-padded frame such that the window for
        diagonal d is ``xp[off_arr[d] : off_arr[d] + length]`` — shared by
        every scan path (O(1) program size for wide bands)."""
        offs = self.graph.offsets
        o_min = min(min(offs), 0)
        o_max = max(max(offs), 0)
        left = -o_min
        L = length + (o_max - o_min)
        right = L - left - x.shape[0]
        xp = jnp.concatenate(
            [
                jnp.zeros((left,) + x.shape[1:], x.dtype),
                x,
                jnp.zeros((max(right, 0),) + x.shape[1:], x.dtype),
            ]
        )
        off_arr = jnp.asarray(
            np.asarray(offs) - o_min, dtype=jnp.int32
        )
        return xp, off_arr

    def _transposed_data(self):
        """(dataT, offsetsT) of A^T in DIA layout: A^T's diagonal -o holds
        ``data[o]`` shifted by o (``dataT[-o, i] = data[o, i - o]``) — a
        static per-diagonal shift, so the transpose layout is pure data
        movement.  Inside a solver ``while_loop`` the computation is
        loop-invariant and XLA hoists it: one materialization per solve."""
        n, m = self.shape
        offs = self.graph.offsets
        sT = -(-m // 128) * 128
        order = sorted(range(len(offs)), key=lambda d: -offs[d])
        rows = [
            zero_padded_window(self.data2d[d], -offs[d], sT, sT) for d in order
        ]
        dataT = jnp.stack(rows).reshape(len(order), sT // 128, 128)
        offsT = tuple(-offs[d] for d in order)
        return dataT, offsT

    def _pallas_rmatvec_path(self, x):
        """Blocked pallas transpose apply (square matrices): materialize
        the transpose layout and reuse the matvec kernel."""
        n, m = self.shape
        if m < self._PALLAS_MIN_ELEMS or x.ndim != 1:
            return None
        if x.dtype not in (jnp.float32, jnp.bfloat16):
            return None
        if self.data.dtype not in (jnp.float32, jnp.bfloat16):
            return None
        try:
            if jax.default_backend() != "tpu":
                return None
        except RuntimeError:
            return None
        from sigma_tpu.ops.spmv_pallas import (
            _LANES,
            _full_tile_pick,
            chunk_plan,
            dia_spmv_pallas_blocked,
            dia_spmv_pallas_chunked,
        )

        offs = self.graph.offsets
        reach = _band_reach(offs)
        pick = _full_tile_pick(
            self.graph.stride // _LANES,
            reach // _LANES + 2,
            len(offs),
            self.data.dtype.itemsize,
        )
        if pick is not None:
            dataT, offsT = self._transposed_data()
            return dia_spmv_pallas_blocked(dataT, x, offsT, m, n)
        if (
            chunk_plan(
                offs, self.graph.stride // _LANES, self.data.dtype.itemsize
            )
            is not None
        ):
            dataT, offsT = self._transposed_data()
            return dia_spmv_pallas_chunked(dataT, x, offsT, m, n)
        return None

    def rmatvec(self, x):
        """Transpose: y[i+o] += data[d, i] * x[i] — same windows, with the
        product shifted by -o into the output frame (scan form for wide
        bands, like matvec).  On TPU past the VMEM cliff the transpose
        DIA layout is materialized (loop-invariant, hoisted by XLA) and
        fed to the blocked pallas kernel."""
        n, m = self.shape
        offs = self.graph.offsets
        if not offs:
            return jnp.zeros((m,), dtype=x.dtype)
        if n == m:
            dataT_path = self._pallas_rmatvec_path(x)
            if dataT_path is not None:
                return dataT_path
        if len(offs) > self._SCAN_THRESHOLD:
            return self._rmatvec_scan(x)
        s = -(-m // 128) * 128
        y2 = jnp.zeros((s // 128, 128), dtype=x.dtype)
        for d, o in enumerate(offs):
            z = self.data2d[d, :n].astype(x.dtype) * x
            w = self._window(z, -o, m, s).reshape(s // 128, 128)
            y2 = y2 + w
        return y2.reshape(-1)[:m]

    def _rmatvec_scan(self, x):
        """y^T form: accumulate each diagonal's product into a shifted slot
        of a padded output frame via dynamic_update_slice inside lax.scan."""
        n, m = self.shape
        offs = self.graph.offsets
        o_min = min(min(offs), 0)
        o_max = max(max(offs), 0)
        left = -o_min
        L = n + (o_max - o_min) + max(m - n, 0)
        off_arr = jnp.asarray(np.asarray(offs) - o_min, dtype=jnp.int32)

        def step(acc, inp):
            start, drow = inp
            z = drow[:n].astype(x.dtype) * x
            win = lax.dynamic_slice(acc, (start,), (n,))
            return lax.dynamic_update_slice(acc, win + z, (start,)), None

        acc, _ = lax.scan(
            step, jnp.zeros((L,), x.dtype), (off_arr, self.data2d)
        )
        # frame position t holds y[t + o_min]
        return lax.dynamic_slice(acc, (left,), (m,))

    def _pallas_matmat_path(self, X):
        """Blocked pallas SpMM when profitable (TPU, low precision, small
        RHS count, VMEM-fitting band) — data fetched once for all RHS."""
        n, m = self.shape
        k = X.shape[1]
        if m < self._PALLAS_MIN_ELEMS or k < 1:
            return None
        if k > 16:
            # wide RHS blocks (e.g. large LOBPCG bases): on wide bands
            # the grouped two-level kernel streams the values ONCE for
            # all k; otherwise split into <=16-wide panels so each pass
            # fits the kernel's VMEM working set (the data then streams
            # once per pass — still far above the XLA fallback)
            YT = self._pallas_spmm_grouped(X.T)
            if YT is not None:
                return YT.T
            parts = []
            for j0 in range(0, k, 16):
                Yj = self._pallas_matmat_path(X[:, j0 : j0 + 16])
                if Yj is None:
                    return None
                parts.append(Yj)
            return jnp.concatenate(parts, axis=1)
        if X.dtype not in (jnp.float32, jnp.bfloat16):
            return None
        if self.data.dtype not in (jnp.float32, jnp.bfloat16):
            return None
        try:
            if jax.default_backend() != "tpu":
                return None
        except RuntimeError:
            return None
        from sigma_tpu.ops.spmv_pallas import (
            _LANES,
            _spmm_tile_pick,
            chunk_plan,
            dia_spmm_pallas_blocked,
            dia_spmm_pallas_chunked,
        )

        offs = self.graph.offsets
        reach = _band_reach(offs)
        S = self.graph.stride // _LANES
        pick = _spmm_tile_pick(
            S,
            reach // _LANES + 2,
            len(offs),
            self.data.dtype.itemsize,
            k=k,
        )
        if pick is not None:
            return dia_spmm_pallas_blocked(self.data, X, offs, n, m)
        if chunk_plan(offs, S, self.data.dtype.itemsize, k=k) is not None:
            return dia_spmm_pallas_chunked(self.data, X, offs, n, m)
        return None

    def matmat_rhs_major(self, XT):
        """RHS-major SpMM: XT (k, m) -> (k, n) with NO layout transposes —
        the fast multi-RHS entry for loops that keep block vectors
        RHS-major (the (n,k)<->(k,n) transposes around :meth:`matmat`
        cost a measurable fraction of SpMM time at 10M rows)."""
        n, m = self.shape
        k = XT.shape[0]
        use_pallas = (
            m >= self._PALLAS_MIN_ELEMS
            and 1 <= k <= 16
            and XT.dtype in (jnp.float32, jnp.bfloat16)
            and self.data.dtype in (jnp.float32, jnp.bfloat16)
        )
        if use_pallas:
            try:
                use_pallas = jax.default_backend() == "tpu"
            except RuntimeError:
                use_pallas = False
        if use_pallas:
            from sigma_tpu.ops.spmv_pallas import (
                _LANES,
                _spmm_tile_pick,
                chunk_plan,
                dia_spmm_rhs_major,
                dia_spmm_rhs_major_chunked,
            )

            offs = self.graph.offsets
            if not offs:  # zero-diagonal matrix: A @ X = 0 (the guard
                return jnp.zeros((k, n), XT.dtype)  # every sibling has)
            reach = _band_reach(offs)
            S = self.graph.stride // _LANES
            pick = _spmm_tile_pick(
                S,
                reach // _LANES + 2,
                len(offs),
                self.data.dtype.itemsize,
                k=k,
            )
            if pick is not None:
                return dia_spmm_rhs_major(self.data, XT, offs, n, m)
            if (
                chunk_plan(offs, S, self.data.dtype.itemsize, k=k)
                is not None
            ):
                return dia_spmm_rhs_major_chunked(self.data, XT, offs, n, m)
        if k > 16:
            Y = self._pallas_spmm_grouped(XT)
            if Y is not None:
                return Y
        return self.matmat(XT.T).T

    def _pallas_spmm_grouped(self, XT):
        """Two-level grouped-interleaved SpMM for wide RHS blocks
        (k > 16): XT (k, m) -> (k, n), or None when the 16-wide
        auto-split is the better route.

        :func:`~sigma_tpu.ops.spmv_pallas.dia_spmm_grouped` streams the
        diagonal values ONCE for all k (its outer grid axis revisits
        each data tile), where the auto-split re-streams the whole band
        per 16-wide pass — but the grouped layout pays entry/exit
        transposes (~4k n-words).  Profitable exactly when the saved
        value re-streams beat the transposes:
        ``(passes - 1) * D * itemsize > 16 * k`` bytes per row — i.e.
        wide bands (RCM-banded unstructured matrices), never the 7-pt
        stencil."""
        n, m = self.shape
        k = XT.shape[0]
        if k <= 16 or m < self._PALLAS_MIN_ELEMS:
            return None
        if XT.dtype not in (jnp.float32, jnp.bfloat16):
            return None
        if self.data.dtype not in (jnp.float32, jnp.bfloat16):
            return None
        try:
            if jax.default_backend() != "tpu":
                return None
        except RuntimeError:
            return None
        offs = self.graph.offsets
        if not offs:
            return None
        D = len(offs)
        isz = self.data.dtype.itemsize
        P = -(-k // 16)
        if (P - 1) * D * isz <= 16 * k:
            return None
        from sigma_tpu.ops.spmv_pallas import (
            _LANES,
            _spmm_tile_pick,
            chunk_plan,
            deinterleave_panels_grouped,
            dia_spmm_grouped,
            dia_spmm_grouped_chunked,
            interleave_panels_grouped,
        )

        reach = _band_reach(offs)
        S = self.graph.stride // _LANES
        hrows = reach // _LANES + 2
        for kb in (16, 8, 4):
            if chunk_plan(offs, S, isz, k=kb) is not None:
                break
        else:
            return None
        XG = interleave_panels_grouped(XT, kb, m)
        if _spmm_tile_pick(S, hrows, D, isz, k=kb) is not None:
            YG = dia_spmm_grouped(self.data, XG, offs, n, m)
        else:
            YG = dia_spmm_grouped_chunked(self.data, XG, offs, n, m)
        return deinterleave_panels_grouped(YG, kb, k, n)

    def interleaved_profitable(self, k):
        """True when :meth:`matmat_interleaved` will hit the pallas kernel
        for k panels (TPU backend, low precision, band fits VMEM) — block
        solvers use this to decide whether to keep their panels resident
        in the interleaved layout for the whole loop."""
        n, m = self.shape
        offs = self.graph.offsets
        if not offs or m < self._PALLAS_MIN_ELEMS or not (1 <= k <= 16):
            return False
        if self.data.dtype not in (jnp.float32, jnp.bfloat16):
            return False
        try:
            if jax.default_backend() != "tpu":
                return False
        except RuntimeError:
            return False
        from sigma_tpu.ops.spmv_pallas import _LANES, _spmm_tile_pick

        reach = _band_reach(offs)
        return (
            _spmm_tile_pick(
                self.graph.stride // _LANES,
                reach // _LANES + 2,
                len(offs),
                self.data.dtype.itemsize,
                k=k,
            )
            is not None
        )

    def why_not_pallas(self, op: str = "matvec", k: int = 1, dtype=None):
        """Explain why the pallas fast path would NOT engage for ``op``
        ('matvec' | 'rmatvec' | 'matmat' | 'interleaved'), or return None
        when it will.

        The fast paths gate SILENTLY (a preconditioner apply inside a
        jitted solver cannot raise or warn), so this probe is the
        documented way to audit a configuration before a long run::

            reason = A.why_not_pallas("interleaved", k=32)
            # -> "k=32 right-hand sides: the interleaved-panel kernel
            #     carries 1..16 panels (VMEM working set); matmat
            #     auto-splits wider blocks into 16-wide passes"

        (``matmat`` itself auto-splits k > 16 into 16-wide kernel
        passes, so the probe audits the per-pass width and returns None
        when those engage.)  ``dtype`` is the operand dtype (defaults to
        the matrix dtype).

        Routing note: None means the pallas path engages, not that it is
        the best format.  A wide band at low occupancy (RCM-reordered
        irregular meshes: ``nnz / (n_diags * n)`` of a few percent)
        streams mostly structural zeros here — repack with
        :func:`sigma_tpu.matrix.banded.to_pruned_dia` /
        :class:`~sigma_tpu.matrix.pruned.PrunedDIAMatrix`, whose kernel
        streams only the active (row-tile x diagonal) blocks (measured
        5x at 2.8% occupancy, benchmarks/pruned_sweep.py).
        """
        n, m = self.shape
        xdt = dtype or self.data.dtype
        if not self.graph.offsets:
            return "matrix has no stored diagonals (empty operator)"
        try:
            backend = jax.default_backend()
        except RuntimeError:
            backend = "<uninitialized>"
        if backend != "tpu":
            return (
                f"backend is {backend!r}, not 'tpu': pallas Mosaic kernels "
                "are TPU-only (XLA paths are used instead)"
            )
        if m < self._PALLAS_MIN_ELEMS:
            return (
                f"m={m} < {self._PALLAS_MIN_ELEMS}: below this the XLA "
                "windowed form is VMEM-resident and already at "
                "speed-of-light; the blocked kernel only pays past it"
            )
        for name, dt in (("operand", xdt), ("matrix data", self.data.dtype)):
            if dt not in (jnp.float32, jnp.bfloat16):
                return (
                    f"{name} dtype {dt} is not float32/bfloat16: Mosaic "
                    "kernels here are low-precision only (f64 runs the "
                    "XLA scan path)"
                )
        if op == "interleaved" and not (1 <= k <= 16):
            return (
                f"k={k} right-hand sides: the interleaved-panel kernel "
                "carries 1..16 panels (VMEM working set); matmat routes "
                "wide bands through the grouped two-level kernel "
                "(values streamed once for all k) and auto-splits the "
                "rest into 16-wide passes"
            )
        if op == "matmat" and k > 16:
            # matmat auto-splits (or runs the grouped two-level kernel
            # on wide bands); audit the per-pass width
            k = 16
        if op == "rmatvec" and n != m:
            return (
                f"rectangular shape {self.shape}: the pallas transpose "
                "apply materializes A^T in DIA layout and reuses the "
                "matvec kernel, which is implemented for square operators "
                "only — rectangular rmatvec runs the XLA scan path"
            )
        from sigma_tpu.ops.spmv_pallas import (
            _LANES,
            _full_tile_pick,
            _spmm_tile_pick,
            chunk_plan,
        )

        offs = self.graph.offsets
        reach = _band_reach(offs)
        S = self.graph.stride // _LANES
        hrows = reach // _LANES + 2
        isz = self.data.dtype.itemsize
        if op in ("matmat", "interleaved"):
            if _spmm_tile_pick(S, hrows, len(offs), isz, k=k) is not None:
                return None
            if (
                op == "matmat"
                and chunk_plan(offs, S, isz, k=k) is not None
            ):
                return None  # the chunked wide-band SpMM engages
            return (
                f"band reach {reach} with {len(offs)} diagonals and "
                f"k={k} panels does not fit the VMEM working set even "
                "one-diagonal-chunked; reduce k or use per-RHS matvecs"
                + (
                    " (interleaved panels are not chunked; matmat is)"
                    if op == "interleaved"
                    else ""
                )
            )
        if _full_tile_pick(S, hrows, len(offs), isz) is not None:
            return None
        if chunk_plan(offs, S, isz) is not None:
            return None  # the chunked wide-band path engages
        return (
            f"band reach {reach} cannot be tiled even one diagonal at a "
            "time (pathological bandwidth); the XLA scan path is used"
        )

    def matmat_interleaved(self, XI, interpret=False):
        """Multi-RHS apply on INTERLEAVED panels: XI is (k*ceil(m/128),
        128) from :func:`sigma_tpu.ops.spmv_pallas.interleave_panels`;
        returns the product in the same layout ((k*ceil(n/128), 128)).

        THE fast multi-RHS path on TPU (0.40 vs 0.91 ms/RHS at the 10M-row
        north star): per grid step the kernel moves five contiguous blocks
        — panel-separate layouts decompose each block into k strided
        chunks and run ~2.3x slower regardless of tile shape
        (benchmarks/spmm_probe4.py).  Keep panels interleaved across the
        whole solver loop; the entry/exit transposes cost ~2 ms at 10M
        rows and would cancel the win if paid per product."""
        n, m = self.shape
        Sx = -(-m // 128)
        Sy = -(-n // 128)
        k = XI.shape[0] // max(Sx, 1)
        offs = self.graph.offsets
        use_pallas = offs and (
            m >= self._PALLAS_MIN_ELEMS
            and 1 <= k <= 16
            and XI.dtype in (jnp.float32, jnp.bfloat16)
            and self.data.dtype in (jnp.float32, jnp.bfloat16)
        )
        if use_pallas and not interpret:
            try:
                use_pallas = jax.default_backend() == "tpu"
            except RuntimeError:
                use_pallas = False
        if use_pallas:
            from sigma_tpu.ops.spmv_pallas import (
                _LANES,
                _spmm_tile_pick,
                dia_spmm_interleaved,
            )

            reach = _band_reach(offs)
            pick = _spmm_tile_pick(
                self.graph.stride // _LANES,
                reach // _LANES + 2,
                len(offs),
                self.data.dtype.itemsize,
                k=k,
            )
            if pick is not None:
                YI = dia_spmm_interleaved(
                    self.data, XI, offs, n, m, interpret=interpret
                )
                return YI[: k * Sy]
        from sigma_tpu.ops.spmv_pallas import (
            deinterleave_panels,
            interleave_panels,
        )

        XT = deinterleave_panels(XI, k, m)
        return interleave_panels(self.matmat(XT.T).T, n)

    def matmat(self, X):
        n, m = self.shape
        offs = self.graph.offsets
        k = X.shape[1]
        if not offs:
            return jnp.zeros((n, k), dtype=X.dtype)
        Y = self._pallas_matmat_path(X)
        if Y is not None:
            return Y
        if len(offs) > self._SCAN_THRESHOLD:
            Xp, off_arr = self._padded_frame(X, n)

            def step(Y, inp):
                start, drow = inp
                W = lax.dynamic_slice(Xp, (start, jnp.asarray(0, start.dtype)), (n, k))
                return Y + drow[:n, None].astype(X.dtype) * W, None

            Y, _ = lax.scan(
                step, jnp.zeros((n, k), X.dtype), (off_arr, self.data2d)
            )
            return Y
        Y = jnp.zeros((n, k), dtype=X.dtype)
        for d, o in enumerate(offs):
            W = self._window(X, o, n, n)
            Y = Y + self.data2d[d, :n, None].astype(X.dtype) * W
        return Y

    def rmatmat(self, X):
        n, m = self.shape
        offs = self.graph.offsets
        k = X.shape[1]
        if not offs:
            return jnp.zeros((m, k), dtype=X.dtype)
        if len(offs) > self._SCAN_THRESHOLD:
            o_min = min(min(offs), 0)
            o_max = max(max(offs), 0)
            left = -o_min
            L = n + (o_max - o_min) + max(m - n, 0)
            off_arr = jnp.asarray(
                np.asarray(offs) - o_min, dtype=jnp.int32
            )

            def step(acc, inp):
                start, drow = inp
                Z = drow[:n, None].astype(X.dtype) * X
                zero = jnp.asarray(0, start.dtype)
                win = lax.dynamic_slice(acc, (start, zero), (n, k))
                return lax.dynamic_update_slice(acc, win + Z, (start, zero)), None

            acc, _ = lax.scan(
                step, jnp.zeros((L, k), X.dtype), (off_arr, self.data2d)
            )
            return lax.dynamic_slice(acc, (left, 0), (m, k))
        Y = jnp.zeros((m, k), dtype=X.dtype)
        for d, o in enumerate(offs):
            Z = self.data2d[d, :n, None].astype(X.dtype) * X
            Y = Y + self._window(Z, -o, m, m)
        return Y

    @property
    def offsets(self):
        return self.graph.offsets

    def diagonal(self) -> jax.Array:
        if 0 in self.graph.offsets:
            d = self.graph.offsets.index(0)
            return self.data2d[d, : min(self.shape)]
        return jnp.zeros((min(self.shape),), dtype=self.dtype)
