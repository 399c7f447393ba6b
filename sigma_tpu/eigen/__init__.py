from sigma_tpu.eigen.lobpcg import LOBPCGResult, lobpcg
from sigma_tpu.eigen.refine import RefinedEigenpairs, refine_eigenpairs
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
    "RefinedEigenpairs",
    "LanczosResult",
    "lanczos",
    "generalized_lanczos",
    "eigensolve",
    "generalized_eigensolve",
]
