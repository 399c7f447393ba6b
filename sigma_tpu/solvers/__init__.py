from sigma_tpu.solvers.amg import (
    AMGPreconditioner,
    amg_solve,
    smoothed_aggregation_amg,
)
from sigma_tpu.solvers.chebyshev import ChebyshevSmoother, chebyshev, estimate_lmax
from sigma_tpu.solvers.gmg import (
    StructuredAMGPreconditioner,
    structured_amg,
    structured_pair_amg,
)
from sigma_tpu.solvers.base import (
    BiCGStabSolver,
    CGSolver,
    GMRESSolver,
    JacobiSolver,
    LinearSolver,
    bicgstab,
    cg,
    gmres,
    jacobi,
    prepare_preconditioner,
)
from sigma_tpu.solvers.refine import refined_solve
from sigma_tpu.solvers.ildu import (
    ILDUPreconditioner,
    LDUSolver,
    TriangularLevels,
    ildu0_factorize,
    incomplete_cholesky,
    ldu,
)
from sigma_tpu.solvers.krylov import (
    SolveInfo,
    block_cg_solve,
    bicgstab_solve,
    cg_fused_solve,
    cg_solve,
    gmres_solve,
    minres_solve,
    stationary_solve,
)

__all__ = [
    "ChebyshevSmoother",
    "chebyshev",
    "refined_solve",
    "estimate_lmax",
    "AMGPreconditioner",
    "amg_solve",
    "smoothed_aggregation_amg",
    "StructuredAMGPreconditioner",
    "structured_amg",
    "structured_pair_amg",
    "LinearSolver",
    "CGSolver",
    "BiCGStabSolver",
    "GMRESSolver",
    "JacobiSolver",
    "LDUSolver",
    "cg",
    "bicgstab",
    "gmres",
    "jacobi",
    "ldu",
    "incomplete_cholesky",
    "prepare_preconditioner",
    "SolveInfo",
    "cg_solve",
    "cg_fused_solve",
    "block_cg_solve",
    "bicgstab_solve",
    "gmres_solve",
    "minres_solve",
    "stationary_solve",
    "ildu0_factorize",
    "ILDUPreconditioner",
    "TriangularLevels",
]
