"""Solver objects: hashable configs wrapping the functional Krylov kernels.

Mirrors the reference's factory-function style — ``cg(tolerance)``,
``bicgstab(tolerance)``, ``jacobi()``, ``ldu(incomplete, level)`` return
solver objects implementing the abstract ``linear_solver`` contract
(``/root/reference/src/linear_operator/linear_operator_interface.f90:61-73``:
setup / solve / solve with preconditioner).  There is deliberately **no
class distinction between solvers and preconditioners** — anything with
``setup(A) -> LinearOperator applying M^{-1}`` can precondition anything
else, exactly the design stated in ``src/solver/README.md``.

Solver objects are frozen dataclasses of static config only (hashable, so
they can ride in static pytree metadata, e.g. ``OperatorWithSolver``).
``setup`` work (diagonal extraction, incomplete factorization) runs on host
once; the returned preconditioner operators are pytrees applied inside the
jitted solve loop.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from sigma_tpu.operators.linear_operator import DiagonalOperator, LinearOperator
from sigma_tpu.solvers.krylov import (
    SolveInfo,
    bicgstab_solve,
    cg_solve,
    gmres_solve,
    stationary_solve,
)

__all__ = [
    "CGLSSolver",
    "cgls",
    "LinearSolver",
    "CGSolver",
    "BiCGStabSolver",
    "GMRESSolver",
    "JacobiSolver",
    "cg",
    "bicgstab",
    "gmres",
    "jacobi",
    "prepare_preconditioner",
]


def prepare_preconditioner(M, A) -> Optional[LinearOperator]:
    """Accept a LinearOperator (applies M^{-1} directly) or a solver-like
    object with ``setup`` (the reference's pc contract); returns an operator
    or None.  Host-side — call before entering jit."""
    if M is None:
        return None
    if isinstance(M, LinearOperator):
        return M
    if hasattr(M, "setup"):
        return M.setup(A)
    raise TypeError(f"cannot use {M!r} as a preconditioner")


class LinearSolver:
    """Abstract solver: ``solve(A, b, x0=None, M=None)`` returns x;
    ``solve_info`` also returns iteration/residual info."""

    def solve(self, A, b, x0=None, M=None):
        return self.solve_info(A, b, x0=x0, M=M)[0]

    def solve_info(self, A, b, x0=None, M=None):
        raise NotImplementedError

    def setup(self, A) -> LinearOperator:
        """Any solver can serve as a preconditioner — the reference's core
        design decision ("There is no distinction in the class hierarchy
        between solvers and preconditioners", src/solver/README.md), which
        is what enables nested multilevel / domain-decomposition methods.
        The returned operator applies z = (approximate A^{-1}) r by running
        this solver; the inner solve is jit-traceable, so it nests inside
        an outer Krylov loop as a flexible preconditioner."""
        return _SolverApply(op=A, config=self)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class _SolverApply(LinearOperator):
    """z = M^{-1} r implemented as an inner solve (nested-Krylov pc).

    The right-hand side is normalized before the inner solve so the inner
    solver's *absolute* tolerance acts relatively — otherwise a shrinking
    outer residual eventually satisfies the inner tolerance at x0 = 0 and
    the preconditioner degenerates to z = 0 (rho breakdown, NaN).  A
    truncated inner Krylov solve is still a *variable* operator: use the
    outer solver's ``flexible=True`` mode with it.
    """

    op: LinearOperator
    config: "LinearSolver" = dataclasses.field(metadata=dict(static=True))

    @property
    def shape(self):
        return self.op.shape

    def matvec(self, r):
        nrm = jnp.linalg.norm(r)
        safe = jnp.maximum(nrm, jnp.asarray(jnp.finfo(r.dtype).tiny, r.dtype))
        z = self.config.solve(self.op, r / safe)
        return jnp.where(nrm > 0, z * safe, jnp.zeros_like(r))

    def rmatvec(self, r):
        # the adjoint preconditioner solves against A^T (review fix:
        # aliasing rmatvec = matvec applied M^{-1} where M^{-T} was
        # required on nonsymmetric inner operators; for symmetric ones
        # A^T is A and this reduces to the same solve)
        from sigma_tpu.operators.linear_operator import AdjointOperator

        nrm = jnp.linalg.norm(r)
        safe = jnp.maximum(nrm, jnp.asarray(jnp.finfo(r.dtype).tiny, r.dtype))
        z = self.config.solve(AdjointOperator(self.op), r / safe)
        return jnp.where(nrm > 0, z * safe, jnp.zeros_like(r))


@dataclasses.dataclass(frozen=True)
class CGSolver(LinearSolver):
    """Conjugate gradients (cg_solvers.f90; factory ``cg(tol)`` at :36)."""

    tolerance: float = 1e-15
    rtol: float = 0.0
    maxiter: Optional[int] = None

    def solve_info(self, A, b, x0=None, M=None):
        M = prepare_preconditioner(M, A)
        return cg_solve(
            A, b, x0, tol=self.tolerance, rtol=self.rtol, maxiter=self.maxiter, M=M
        )


@dataclasses.dataclass(frozen=True)
class BiCGStabSolver(LinearSolver):
    """BiCG-stab (bicgstab_solvers.f90; factory ``bicgstab(tol)`` at :36)."""

    tolerance: float = 1e-12
    rtol: float = 0.0
    maxiter: Optional[int] = None

    def solve_info(self, A, b, x0=None, M=None):
        M = prepare_preconditioner(M, A)
        return bicgstab_solve(
            A, b, x0, tol=self.tolerance, rtol=self.rtol, maxiter=self.maxiter, M=M
        )


@dataclasses.dataclass(frozen=True)
class GMRESSolver(LinearSolver):
    """Restarted GMRES (extension; absent in the reference)."""

    tolerance: float = 1e-12
    rtol: float = 0.0
    restart: int = 32
    maxiter: Optional[int] = None

    def solve_info(self, A, b, x0=None, M=None):
        M = prepare_preconditioner(M, A)
        return gmres_solve(
            A,
            b,
            x0,
            tol=self.tolerance,
            rtol=self.rtol,
            restart=self.restart,
            maxiter=self.maxiter,
            M=M,
        )


@dataclasses.dataclass(frozen=True)
class CGLSSolver(LinearSolver):
    """Least-squares CG on the normal equations (extension; the reference's
    solver layer handles square operators only).  ``solve`` returns the LS
    minimizer of ||b - A x||; tolerance applies to ||A^T r||."""

    tolerance: float = 1e-12
    rtol: float = 0.0
    maxiter: Optional[int] = None

    def solve_info(self, A, b, x0=None, M=None):
        from sigma_tpu.solvers.krylov import cgls_solve

        M = prepare_preconditioner(M, A)
        return cgls_solve(
            A, b, x0, tol=self.tolerance, rtol=self.rtol, maxiter=self.maxiter, M=M
        )


@dataclasses.dataclass(frozen=True)
class JacobiSolver(LinearSolver):
    """Diagonal (Jacobi) preconditioner/solver (jacobi_solvers.f90:26-81:
    stores 1/A_ii; solve = D^{-1} b).  As a standalone 'solver' it applies
    one diagonal scaling, exactly like the reference; use
    ``stationary_solve`` for the Richardson-iteration usage of the tests."""

    def setup(self, A) -> LinearOperator:
        d = A.diagonal() if hasattr(A, "diagonal") else jnp.asarray(
            [A.get_value(i, i) for i in range(A.shape[0])]
        )
        # zero diagonals (e.g. padded rows of a distributed matrix) pass
        # through unscaled instead of poisoning the solve with inf/NaN
        safe = jnp.where(d != 0, d, 1.0)
        return DiagonalOperator(1.0 / safe)

    def solve_info(self, A, b, x0=None, M=None):
        x = self.setup(A).matvec(b)
        r = b - A.matvec(x)
        rn = jnp.linalg.norm(r)
        return x, SolveInfo(jnp.asarray(1, jnp.int32), rn, jnp.isfinite(rn))


def cg(tolerance: float = 1e-15, rtol: float = 0.0, maxiter=None) -> CGSolver:
    return CGSolver(tolerance=tolerance, rtol=rtol, maxiter=maxiter)


def bicgstab(tolerance: float = 1e-12, rtol: float = 0.0, maxiter=None) -> BiCGStabSolver:
    return BiCGStabSolver(tolerance=tolerance, rtol=rtol, maxiter=maxiter)


def gmres(
    tolerance: float = 1e-12, rtol: float = 0.0, restart: int = 32, maxiter=None
) -> GMRESSolver:
    return GMRESSolver(tolerance=tolerance, rtol=rtol, restart=restart, maxiter=maxiter)


def cgls(tolerance: float = 1e-12, rtol: float = 0.0, maxiter=None) -> CGLSSolver:
    return CGLSSolver(tolerance=tolerance, rtol=rtol, maxiter=maxiter)


def jacobi() -> JacobiSolver:
    return JacobiSolver()
