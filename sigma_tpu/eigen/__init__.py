from sigma_tpu.eigen.lobpcg import LOBPCGResult, lobpcg
from sigma_tpu.eigen.refine import RefinedEigenpairs, refine_eigenpairs
from sigma_tpu.eigen.shift_invert import ShiftInvertResult, shift_invert_lanczos
from sigma_tpu.eigen.lanczos import (
    LanczosResult,
    eigensolve,
    generalized_eigensolve,
    generalized_lanczos,
    lanczos,
)

__all__ = [
    "lobpcg",
    "LOBPCGResult",
    "refine_eigenpairs",
    "ShiftInvertResult",
    "shift_invert_lanczos",
    "RefinedEigenpairs",
    "LanczosResult",
    "lanczos",
    "generalized_lanczos",
    "eigensolve",
    "generalized_eigensolve",
]
