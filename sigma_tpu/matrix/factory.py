"""Polymorphic matrix construction / conversion by format name.

Mirrors ``/root/reference/src/matrix/sparse_matrix_factory.f90``
(``choose_matrix_type`` by int 1..5 :39-64 or by name :69-93).
"""

from __future__ import annotations

from typing import Type, Union

from sigma_tpu.matrix.base import SparseMatrix
from sigma_tpu.matrix.formats import (
    BSRMatrix,
    COOMatrix,
    CSCMatrix,
    CSRMatrix,
    DIAMatrix,
    ELLMatrix,
)

__all__ = [
    "MATRIX_FORMATS",
    "num_matrix_types",
    "choose_matrix_type",
    "convert_matrix",
]

MATRIX_FORMATS: dict[str, Type[SparseMatrix]] = {
    "coo": COOMatrix,
    "csr": CSRMatrix,
    "csc": CSCMatrix,
    "ell": ELLMatrix,
    "ellpack": ELLMatrix,
    "bsr": BSRMatrix,
    "dia": DIAMatrix,
}

num_matrix_types = 5
_BY_INT = ["coo", "csr", "csc", "ell", "bsr"]


def choose_matrix_type(frmt: Union[str, int]) -> Type[SparseMatrix]:
    if isinstance(frmt, int):
        if not 1 <= frmt <= num_matrix_types:
            raise ValueError(f"matrix format code {frmt} not in 1..{num_matrix_types}")
        frmt = _BY_INT[frmt - 1]
    cls = MATRIX_FORMATS.get(str(frmt).lower())
    if cls is None:
        raise ValueError(f"unknown matrix format {frmt!r}; choose from {_BY_INT}")
    return cls


def convert_matrix(A: SparseMatrix, frmt: Union[str, int], **kwargs) -> SparseMatrix:
    """Re-freeze a matrix in another format, preserving sparsity + values
    (the matrix analogue of convert_graph_type; exercised by the reference's
    matrix_test_copy.f90 across all format pairs)."""
    cls = choose_matrix_type(frmt)
    rows, cols, vals = A.entries()
    return cls.from_coo(
        A.shape[0], A.shape[1], rows, cols, vals, dtype=A.dtype, **kwargs
    )
