from sigma_tpu.matrix.algebra import (
    PtAPPlan,
    SparseSumPlan,
    SpGEMMPlan,
    plan_ptap,
    plan_rart,
    plan_sparse_add,
    plan_sparse_matmul,
    ptap,
    rart,
    sparse_add,
    sparse_matmul,
)
from sigma_tpu.matrix.banded import band_occupancy, bandwidth, to_banded_dia
from sigma_tpu.matrix.base import SparseMatrix
from sigma_tpu.matrix.composite import BlockMatrix
from sigma_tpu.matrix.formats import (
    BSRMatrix,
    DIAMatrix,
    COOMatrix,
    CSCMatrix,
    CSRMatrix,
    ELLMatrix,
)
from sigma_tpu.matrix.pruned import PrunedDIAMatrix, SymmetricPrunedDIAMatrix
from sigma_tpu.matrix.symmetric import SymmetricDIAMatrix
from sigma_tpu.matrix.factory import (
    MATRIX_FORMATS,
    choose_matrix_type,
    convert_matrix,
    num_matrix_types,
)

__all__ = [
    "SparseMatrix",
    "BlockMatrix",
    "CSRMatrix",
    "CSCMatrix",
    "COOMatrix",
    "ELLMatrix",
    "BSRMatrix",
    "DIAMatrix",
    "SymmetricDIAMatrix",
    "PrunedDIAMatrix",
    "SymmetricPrunedDIAMatrix",
    "MATRIX_FORMATS",
    "num_matrix_types",
    "choose_matrix_type",
    "convert_matrix",
    "sparse_add",
    "sparse_matmul",
    "ptap",
    "rart",
    "plan_sparse_add",
    "plan_sparse_matmul",
    "plan_ptap",
    "plan_rart",
    "SparseSumPlan",
    "SpGEMMPlan",
    "PtAPPlan",
    "to_banded_dia",
    "bandwidth",
    "band_occupancy",
]
