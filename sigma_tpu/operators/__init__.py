from sigma_tpu.operators.linear_operator import (
    AdjointOperator,
    DenseOperator,
    DiagonalOperator,
    IdentityOperator,
    LinearOperator,
    MatvecOperator,
    OperatorWithSolver,
    ProductOperator,
    ScaledOperator,
    SumOperator,
    aslinearoperator,
    attach_solver,
)

__all__ = [
    "LinearOperator",
    "SumOperator",
    "ProductOperator",
    "AdjointOperator",
    "ScaledOperator",
    "IdentityOperator",
    "DiagonalOperator",
    "DenseOperator",
    "MatvecOperator",
    "OperatorWithSolver",
    "aslinearoperator",
    "attach_solver",
]
