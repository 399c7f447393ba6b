"""Sparse matrix = frozen graph + value array (the SiGMA premise).

Mirrors the contract of ``/root/reference/src/matrix/sparse_matrix_interfaces
.f90``: a sparse matrix is a linear operator whose sparsity is a first-class
graph shared (not copied) between matrices, with accessors, batched
get/set/add mutators, iteration (here: whole-array COO export), permutation,
and I/O.  Differences forced by XLA:

* matrices are **immutable pytrees** — mutators return new matrices (value
  updates are pure ``data.at[pos].set/add``, O(nnz) functional updates);
* setting a *structurally absent* entry rebuilds graph + matrix on host —
  the same cost the reference pays in
  ``default_sparse_matrix_kernels.f90:176`` (clone graph, add edge, remap
  values), made explicit;
* the batch-64 edge cursor becomes a single vectorized ``entries()`` export.

Capability flags ``is_get_row_fast``/``is_get_column_fast``
(``sparse_matrix_interfaces.f90:159-169``) survive as class attributes and
drive algorithm selection in :mod:`sigma_tpu.matrix.algebra` exactly as in
the reference's SpGEMM dispatch (``sparse_matrix_algebra.f90:178-187``).
"""

from __future__ import annotations

import dataclasses
from typing import ClassVar, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sigma_tpu.graph.builder import GraphBuilder
from sigma_tpu.graph.graph import Graph
from sigma_tpu.operators.linear_operator import LinearOperator
from sigma_tpu.utils.dtypes import default_real_dtype

__all__ = ["SparseMatrix"]


class SparseMatrix(LinearOperator):
    """Abstract sparse matrix over a frozen topology.

    Concrete formats define: ``graph`` (a Graph pytree), ``data`` (value
    array whose flat layout matches ``graph.edge_positions``), ``matvec``,
    ``rmatvec``, ``matmat``.
    """

    graph: Graph
    data: jax.Array
    format: ClassVar[str] = "abstract"
    is_get_row_fast: ClassVar[bool] = False
    is_get_column_fast: ClassVar[bool] = False

    # -- shape/meta ------------------------------------------------------------
    @property
    def shape(self) -> Tuple[int, int]:
        return self.graph.shape

    @property
    def nnz(self) -> int:
        return self.graph.nnz

    @property
    def dtype(self):
        return self.data.dtype

    # -- constructors ------------------------------------------------------------
    @classmethod
    def from_graph(cls, graph: Graph, data: Optional[jax.Array] = None, dtype=None):
        """Attach a (zero) value array to an existing topology — the
        ``set_graph`` sharing idiom (``sparse_matrix_interfaces.f90:313``):
        many matrices may share one graph object."""
        g = cls._coerce_graph(graph)
        if data is None:
            data = jnp.zeros(cls._data_shape(g), dtype=dtype or default_real_dtype())
        else:
            data = jnp.asarray(data)
            if data.shape != cls._data_shape(g):
                raise ValueError(
                    f"data shape {data.shape} != expected {cls._data_shape(g)}"
                )
        return cls(graph=g, data=data)

    @classmethod
    def from_coo(cls, n, m, rows, cols, vals, dtype=None, sum_duplicates=True, **kw):
        rows = np.asarray(rows).ravel()
        cols = np.asarray(cols).ravel()
        vals = np.asarray(vals).ravel()
        dtype = dtype or default_real_dtype()
        if sum_duplicates:
            keys = rows.astype(np.int64) * m + cols
            ukeys, inv = np.unique(keys, return_inverse=True)
            # bincount, not np.add.at: the unbuffered ufunc is ~30x slower
            # at the 10M-row construction scale
            acc = np.bincount(
                inv, weights=vals.astype(np.float64), minlength=ukeys.size
            )
            rows, cols, vals = ukeys // m, ukeys % m, acc
            gcls = cls._graph_class()
            if not kw and hasattr(gcls, "from_sorted_coo"):
                # edges are now row-major sorted and unique: freeze without
                # re-sorting, and place values at arange(nnz) directly —
                # skips a second np.unique plus the edge_positions
                # searchsorted + device scatter of the generic path
                # (several fault-bound full passes at the 1M-row scale)
                g = gcls.from_sorted_coo(n, m, rows, cols)
                shape = cls._data_shape(g)
                flat = np.zeros(int(np.prod(shape)), dtype=np.dtype(dtype))
                flat[: vals.size] = vals
                return cls(graph=g, data=jnp.asarray(flat.reshape(shape)))
        g = cls._graph_class().from_coo(n, m, rows, cols, **kw)
        A = cls.from_graph(g, dtype=dtype)
        return A.set_values(rows, cols, vals)

    @classmethod
    def from_dense(cls, dense, tol: float = 0.0, **kw):
        dense = np.asarray(dense)
        rows, cols = np.nonzero(np.abs(dense) > tol)
        return cls.from_coo(
            dense.shape[0], dense.shape[1], rows, cols, dense[rows, cols],
            dtype=jnp.asarray(dense).dtype, **kw
        )

    @classmethod
    def _graph_class(cls):
        raise NotImplementedError

    @classmethod
    def _coerce_graph(cls, graph: Graph) -> Graph:
        want = cls._graph_class()
        if isinstance(graph, want):
            return graph
        rows, cols = graph.edges_numpy()
        return want.from_coo(graph.shape[0], graph.shape[1], rows, cols)

    @classmethod
    def _data_shape(cls, graph: Graph) -> Tuple[int, ...]:
        raise NotImplementedError

    # -- value access (vectorized get/set/add of sparse_matrix_interfaces) -----
    def entries(self) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """(rows, cols, values) of true edges — replaces get_entries cursors."""
        rows, cols = self.graph.edges_numpy()
        pos = self.graph.edge_positions(rows, cols)
        vals = np.asarray(self.data).reshape(-1)[pos]
        return rows, cols, vals

    def get_values(self, rows, cols) -> np.ndarray:
        """Batched entry read; absent entries read as 0 (get_value contract,
        ``sparse_matrix_interfaces.f90``)."""
        pos = self.graph.edge_positions(rows, cols)
        flat = np.asarray(self.data).reshape(-1)
        return np.where(pos >= 0, flat[np.clip(pos, 0, flat.size - 1)], 0.0)

    def get_value(self, i: int, j: int) -> float:
        return float(self.get_values([i], [j])[0])

    def get_row(self, i: int) -> Tuple[np.ndarray, np.ndarray]:
        """(column indices, values) of row i — the ``get_row`` slice
        accessor (``sparse_matrix_interfaces.f90`` deferred accessors;
        O(deg) for row-fast formats, O(nnz) otherwise)."""
        rows, cols, vals = self.entries()
        sel = rows == i
        return cols[sel], vals[sel]

    def get_column(self, j: int) -> Tuple[np.ndarray, np.ndarray]:
        """(row indices, values) of column j (``get_column`` accessor)."""
        rows, cols, vals = self.entries()
        sel = cols == j
        return rows[sel], vals[sel]

    def row_degree(self, i: int) -> int:
        """Stored entries in row i (``get_row_degree``)."""
        return int(self.graph.degree(i)) if hasattr(self.graph, "degree") else len(
            self.get_row(i)[0]
        )

    def diagonal(self) -> jax.Array:
        k = min(self.shape)
        idx = np.arange(k)
        return jnp.asarray(self.get_values(idx, idx), dtype=self.dtype)

    def _updated(self, data: jax.Array) -> "SparseMatrix":
        return dataclasses.replace(self, data=data)

    def with_data(self, data: jax.Array) -> "SparseMatrix":
        data = jnp.asarray(data)
        if data.shape != self.data.shape:
            raise ValueError(f"data shape {data.shape} != {self.data.shape}")
        return self._updated(data)

    def set_values(self, rows, cols, vals) -> "SparseMatrix":
        """Functional batched set; entries absent from the sparsity trigger a
        host-side graph rebuild (the reference's
        ``set_matrix_value_with_reallocation`` fill-in path)."""
        return self._scatter(rows, cols, vals, add=False)

    def add_values(self, rows, cols, vals) -> "SparseMatrix":
        """Functional batched accumulate (FEM-assembly style ``add_value``;
        duplicate (i, j) pairs in the batch accumulate)."""
        return self._scatter(rows, cols, vals, add=True)

    def add_block(self, rows, cols, block) -> "SparseMatrix":
        """Dense-block accumulate A[np.ix_(rows, cols)] += block — the
        ``set/add_multiple_values`` contract
        (``sparse_matrix_interfaces.f90:378-425``)."""
        rows = np.asarray(rows).ravel()
        cols = np.asarray(cols).ravel()
        block = np.asarray(block)
        rr = np.repeat(rows, cols.size)
        cc = np.tile(cols, rows.size)
        return self.add_values(rr, cc, block.reshape(-1))

    def _scatter(self, rows, cols, vals, add: bool) -> "SparseMatrix":
        rows = np.asarray(rows).ravel()
        cols = np.asarray(cols).ravel()
        vals = jnp.asarray(vals).reshape(-1).astype(self.dtype)
        pos = self.graph.edge_positions(rows, cols)
        if (pos < 0).any():
            return self._with_fill_in(rows, cols, vals, add)
        flat = self.data.reshape(-1)
        flat = flat.at[pos].add(vals) if add else flat.at[pos].set(vals)
        return self._updated(flat.reshape(self.data.shape))

    def _with_fill_in(self, rows, cols, vals, add: bool) -> "SparseMatrix":
        # host-side rebuild: thaw graph, add edges, refreeze, remap values
        # (default_sparse_matrix_kernels.f90:176-231 made explicit)
        b = GraphBuilder.from_graph(self.graph)
        b.add_edges(rows, cols)
        new_graph = self._coerce_graph_from_builder(b)
        new = type(self).from_graph(new_graph, dtype=self.dtype)
        orows, ocols, ovals = self.entries()
        opos = new_graph.edge_positions(orows, ocols)
        flat = new.data.reshape(-1).at[opos].set(jnp.asarray(ovals, dtype=self.dtype))
        new = new._updated(flat.reshape(new.data.shape))
        return new._scatter(rows, cols, vals, add)

    def _coerce_graph_from_builder(self, b: GraphBuilder) -> Graph:
        rows, cols = b.edges()
        return type(self.graph).from_coo(b.n, b.m, rows, cols)

    # -- structure-preserving transforms ---------------------------------------
    def scale(self, alpha) -> "SparseMatrix":
        return self._updated(self.data * alpha)

    def transpose_matrix(self) -> "SparseMatrix":
        """Materialized transpose in the same format (cf. the lazy ``.T``,
        which wraps without moving data)."""
        rows, cols, vals = self.entries()
        return type(self).from_coo(
            self.shape[1], self.shape[0], cols, rows, vals, dtype=self.dtype,
            **self._format_kwargs_transposed(),
        )

    def permute_rows(self, p) -> "SparseMatrix":
        rows, cols, vals = self.entries()
        p = np.asarray(p)
        return type(self).from_coo(
            self.shape[0], self.shape[1], p[rows], cols, vals, dtype=self.dtype,
            **self._format_kwargs(),
        )

    def permute_cols(self, p) -> "SparseMatrix":
        rows, cols, vals = self.entries()
        p = np.asarray(p)
        return type(self).from_coo(
            self.shape[0], self.shape[1], rows, p[cols], vals, dtype=self.dtype,
            **self._format_kwargs(),
        )

    def _format_kwargs(self) -> dict:
        return {}

    def _format_kwargs_transposed(self) -> dict:
        """Format kwargs for the TRANSPOSED shape (BSR swaps block dims)."""
        return self._format_kwargs()

    def to_dense(self) -> np.ndarray:
        rows, cols, vals = self.entries()
        d = np.zeros(self.shape, dtype=np.asarray(self.data).dtype)
        d[rows, cols] = vals
        return d

    def astype(self, dtype) -> "SparseMatrix":
        return self._updated(self.data.astype(dtype))

    def astype_exact(self, dtype) -> "SparseMatrix":
        """Cast values to a narrower dtype, RAISING unless every stored
        value round-trips exactly.  The production entry to the bf16-data
        SpMV path: stencil coefficients (small integers / dyadic rationals)
        are exactly representable in bfloat16, and halving the dominant
        HBM value stream raises DIA SpMV throughput ~1.6x (bench.py's
        ``dia_bf16data`` row) with bit-identical results."""
        src = np.asarray(self.data)
        cast = src.astype(dtype)
        if not np.array_equal(cast.astype(src.dtype), src):
            raise ValueError(
                f"matrix values are not exactly representable in {dtype}; "
                "use astype() to cast with rounding"
            )
        return self._updated(jnp.asarray(cast))

    def __repr__(self) -> str:
        return (
            f"{type(self).__name__}(shape={self.shape}, nnz={self.nnz}, "
            f"dtype={self.data.dtype})"
        )
