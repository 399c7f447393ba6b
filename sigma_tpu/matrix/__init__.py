from sigma_tpu.matrix.base import SparseMatrix
from sigma_tpu.matrix.formats import (
    BSRMatrix,
    COOMatrix,
    CSCMatrix,
    CSRMatrix,
    ELLMatrix,
)
from sigma_tpu.matrix.factory import (
    MATRIX_FORMATS,
    choose_matrix_type,
    convert_matrix,
    num_matrix_types,
)

__all__ = [
    "SparseMatrix",
    "CSRMatrix",
    "CSCMatrix",
    "COOMatrix",
    "ELLMatrix",
    "BSRMatrix",
    "MATRIX_FORMATS",
    "num_matrix_types",
    "choose_matrix_type",
    "convert_matrix",
]
