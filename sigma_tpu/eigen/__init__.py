from sigma_tpu.eigen.lanczos import (
    LanczosResult,
    eigensolve,
    generalized_eigensolve,
    generalized_lanczos,
    lanczos,
)

__all__ = [
    "LanczosResult",
    "lanczos",
    "generalized_lanczos",
    "eigensolve",
    "generalized_eigensolve",
]
