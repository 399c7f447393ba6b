"""Persistence: graph/matrix save-load (text + npz) and solver checkpoints.

Reference persistence primitives (write-only, no readers!):
``write_graph_to_file`` (``/root/reference/src/graph/graph_interfaces.f90:
406-435``: text "n m ne" header + edge list) and ``sparse_matrix_to_file``
(``sparse_matrix_interfaces.f90:601-653``: "nrow ncol nnz" + i j v triples).
Here both directions exist, in two encodings:

* the reference's whitespace text format (round-trips with Fortran output);
* npz (fast binary, exact dtypes) — the checkpoint/resume subsystem the
  reference lacks (SURVEY §5): matrices, graphs, and solver state (x vector
  + iteration metadata) restore bit-exactly.
"""

from __future__ import annotations

import json
from typing import Optional, Union

import jax.numpy as jnp
import numpy as np

from sigma_tpu.graph.graph import Graph
from sigma_tpu.matrix.base import SparseMatrix
from sigma_tpu.matrix.factory import MATRIX_FORMATS, choose_matrix_type

__all__ = [
    "write_graph",
    "read_graph",
    "write_matrix",
    "read_matrix",
    "write_matrix_market",
    "read_matrix_market",
    "save_matrix_npz",
    "load_matrix_npz",
    "save_checkpoint",
    "load_checkpoint",
    "from_scipy",
    "to_scipy",
]


def _write_triples(f, rows, cols, vals) -> None:
    # f64 cast: column_stack cannot promote bf16 against the int64
    # index columns (DTypePromotionError), and f64 is value-exact for
    # every stored dtype here
    np.savetxt(
        f,
        np.column_stack([rows, cols, np.asarray(vals, np.float64)]),
        fmt="%d %d %.17g",
    )


def write_graph(g: Graph, path) -> None:
    """Text "n m ne" + 0-based edge list (``write_graph_to_file``)."""
    rows, cols = g.edges_numpy()
    with open(path, "w") as f:
        f.write(f"{g.shape[0]} {g.shape[1]} {rows.size}\n")
        np.savetxt(f, np.column_stack([rows, cols]), fmt="%d %d")


def read_graph(path, frmt: Union[str, int] = "csr") -> Graph:
    from sigma_tpu.graph.factory import choose_graph_type

    with open(path) as f:
        n, m, ne = map(int, f.readline().split())
        data = np.loadtxt(f, dtype=np.int64, ndmin=2) if ne else np.empty((0, 2), np.int64)
    if data.shape[0] != ne:
        raise ValueError(f"expected {ne} edges, read {data.shape[0]}")
    return choose_graph_type(frmt).from_coo(n, m, data[:, 0], data[:, 1])


def write_matrix(A: SparseMatrix, path) -> None:
    """Text "nrow ncol nnz" + 0-based (i, j, v) triples
    (``sparse_matrix_to_file``, Matrix-Market-like)."""
    rows, cols, vals = A.entries()
    with open(path, "w") as f:
        f.write(f"{A.shape[0]} {A.shape[1]} {rows.size}\n")
        _write_triples(f, rows, cols, vals)


def read_matrix(A_or_path, frmt: Union[str, int] = "csr", dtype=None) -> SparseMatrix:
    cls = choose_matrix_type(frmt)
    with open(A_or_path) as f:
        n, m, ne = map(int, f.readline().split())
        if ne:
            data = np.loadtxt(f, ndmin=2)
        else:
            data = np.empty((0, 3))
    if data.shape[0] != ne:
        raise ValueError(f"expected {ne} entries, read {data.shape[0]}")
    return cls.from_coo(
        n, m, data[:, 0].astype(np.int64), data[:, 1].astype(np.int64),
        data[:, 2], dtype=dtype,
    )


def write_matrix_market(A: SparseMatrix, path, comment: str = "") -> None:
    """Standard MatrixMarket coordinate file (1-based, ``%%MatrixMarket``
    header) — interchange with the wider sparse ecosystem; the reference's
    ``sparse_matrix_to_file`` emits a headerless variant of this."""
    rows, cols, vals = A.entries()
    with open(path, "w") as f:
        f.write("%%MatrixMarket matrix coordinate real general\n")
        if comment:
            f.write(f"% {comment}\n")
        f.write(f"{A.shape[0]} {A.shape[1]} {rows.size}\n")
        _write_triples(f, rows + 1, cols + 1, vals)


def read_matrix_market(path, frmt: Union[str, int] = "csr", dtype=None) -> SparseMatrix:
    """Read a MatrixMarket coordinate file (general or symmetric)."""
    cls = choose_matrix_type(frmt)
    with open(path) as f:
        header = f.readline().strip().lower()
        if not header.startswith("%%matrixmarket"):
            raise ValueError(f"not a MatrixMarket file: {header!r}")
        if "coordinate" not in header:
            raise ValueError("only coordinate (sparse) MatrixMarket supported")
        skew = "skew-symmetric" in header
        symmetric = ("symmetric" in header and not skew) or "hermitian" in header
        pattern = "pattern" in header
        line = f.readline()
        while line.lstrip().startswith("%"):
            line = f.readline()
        n, m, ne = map(int, line.split())
        data = np.loadtxt(f, ndmin=2) if ne else np.empty((0, 3))
    if data.shape[0] != ne:
        raise ValueError(f"expected {ne} entries, read {data.shape[0]}")
    rows = data[:, 0].astype(np.int64) - 1
    cols = data[:, 1].astype(np.int64) - 1
    vals = np.ones(ne) if pattern or data.shape[1] < 3 else data[:, 2]
    if symmetric or skew:
        off = rows != cols
        mirrored = -vals[off] if skew else vals[off]
        rows, cols = (
            np.concatenate([rows, cols[off]]),
            np.concatenate([cols, rows[off]]),
        )
        vals = np.concatenate([vals, mirrored])
    return cls.from_coo(n, m, rows, cols, vals, dtype=dtype)


def save_matrix_npz(A: SparseMatrix, path) -> None:
    """Binary save: COO triples + format tag + dtype; exact round-trip.

    The value DTYPE is stored as a tag and restored by
    :func:`load_matrix_npz` (review fixes: np.savez writes bfloat16 as
    raw void bytes — values are widened to float32, an exact superset —
    and a load without the tag used to fall back to the platform
    default dtype, resuming checkpointed operators at the wrong
    precision)."""
    rows, cols, vals = A.entries()
    vals = np.asarray(vals)
    tag = str(jnp.dtype(vals.dtype))
    if vals.dtype not in (np.float32, np.float64):
        vals = vals.astype(np.float32 if tag == "bfloat16" else np.float64)
    np.savez_compressed(
        path,
        format=np.array(A.format),
        nrow=np.array(A.shape[0]),
        ncol=np.array(A.shape[1]),
        rows=rows,
        cols=cols,
        vals=vals,
        vals_dtype=np.array(tag),
    )


def load_matrix_npz(path, frmt: Optional[str] = None, dtype=None) -> SparseMatrix:
    """Load a :func:`save_matrix_npz` file; the saved value dtype is
    restored unless ``dtype`` overrides it (files from before the
    dtype tag load at the values' storage dtype)."""
    z = np.load(path, allow_pickle=False)
    name = frmt or str(z["format"])
    cls = MATRIX_FORMATS[name]
    if dtype is None:
        dtype = str(z["vals_dtype"]) if "vals_dtype" in z else z["vals"].dtype
    return cls.from_coo(
        int(z["nrow"]), int(z["ncol"]), z["rows"], z["cols"], z["vals"], dtype=dtype
    )


def save_checkpoint(path, x, *, iteration: int = 0, residual: float = 0.0, **extra):
    """Solver-state checkpoint: iterate + metadata (+ any extra arrays)."""
    meta = {"iteration": int(iteration), "residual": float(residual)}
    np.savez_compressed(
        path,
        x=np.asarray(x),
        meta=np.array(json.dumps(meta)),
        **{k: np.asarray(v) for k, v in extra.items()},
    )


def load_checkpoint(path):
    """Returns (x, meta_dict, extras_dict)."""
    z = np.load(path, allow_pickle=False)
    meta = json.loads(str(z["meta"]))
    extras = {
        k: z[k] for k in z.files if k not in ("x", "meta")
    }
    return jnp.asarray(z["x"]), meta, extras


def from_scipy(A_scipy, frmt: Union[str, int] = None, dtype=None) -> SparseMatrix:
    """Build from any scipy.sparse matrix (format inferred when not given:
    csr/csc/coo map to their namesakes, others to csr)."""
    fmt = frmt
    if fmt is None:
        name = getattr(A_scipy, "format", "csr")
        fmt = name if name in MATRIX_FORMATS else "csr"
    cls = choose_matrix_type(fmt)
    coo = A_scipy.tocoo()
    return cls.from_coo(
        coo.shape[0], coo.shape[1], coo.row, coo.col, coo.data, dtype=dtype
    )


def to_scipy(A: SparseMatrix):
    """Export to scipy.sparse.csr_matrix."""
    import scipy.sparse

    rows, cols, vals = A.entries()
    return scipy.sparse.csr_matrix(
        (vals, (rows, cols)), shape=A.shape
    )
