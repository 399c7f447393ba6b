"""Mixed-precision eigenpair refinement: inverse iteration through the
f64-residual / f32-Krylov pipeline, then an exact Rayleigh-Ritz.

Why it exists (measured at the 10.1M-row Dirichlet Laplacian,
BENCHMARKS.md "North-star eigensolve"): f32 LOBPCG stagnates with
vector-limited eigenvalue errors of 1-2% for eigenvalues near
``eps * ||A||`` — and its own f32 Ritz printout UNDERSTATES that error
(rounding happened to land toward the exact values), which only a
working-precision Rayleigh quotient exposes.  One refined
inverse-iteration step per vector — ``y = A^{-1} x`` amplifies mode q
by ``1/lambda_q``, suppressing the stagnation's high-mode contamination
by ``~lambda_min/lambda_q`` — followed by a working-precision
Rayleigh-Ritz on the block, recovered six digits (3e-5 relative vs the
analytic spectrum) in one step, with all Krylov work on the f32 kernels
(:func:`sigma_tpu.solvers.refine.refined_solve`).

The reference's eigensolver is all-f64 LAPACK at toy sizes
(``eigensolver.f90``); this is the TPU-native discipline that reaches
reference-grade eigenvalues at scales it never touched.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["refine_eigenpairs", "RefinedEigenpairs"]


class RefinedEigenpairs(NamedTuple):
    eigenvalues: np.ndarray  # (m,) ascending, working precision
    eigenvectors: jax.Array  # (n, m) working precision, B-orthonormal
    rayleigh_before: np.ndarray  # working-precision RQ of the INPUT block


def refine_eigenpairs(
    A,
    V,
    *,
    M_lo=None,
    inner_solve=None,
    steps: int = 1,
    rtol: float = 1e-12,
    max_outer: int = 8,
    inner_tol: float = 1e-6,
    inner_maxiter: int = 300,
) -> RefinedEigenpairs:
    """Refine approximate eigenvectors ``V`` (n, m) of SPD ``A`` toward
    the LOWEST eigenpairs.

    ``A`` is the working-precision operator (e.g. f64); each of the
    ``steps`` sweeps applies one inverse-iteration step per column via
    :func:`sigma_tpu.solvers.refine.refined_solve` (low-precision inner
    Krylov, optionally preconditioned by ``M_lo``; or a custom
    ``inner_solve(r_lo) -> d_lo``), then a working-precision
    Rayleigh-Ritz on the refined block separates the low cluster.

    Returns working-precision eigenvalues (ascending), the Ritz vectors,
    and the Rayleigh quotients of the INPUT block — the honest accuracy
    of what was passed in (an f32 eigensolver's own Ritz values can
    understate their error)."""
    from sigma_tpu.solvers.refine import refined_solve

    V = jnp.asarray(V, dtype=getattr(A, "dtype", jnp.float64))
    n, m = V.shape

    # working-precision RQ of the input block (diagnostic)
    AV = A.matmat(V)
    rq_before = np.sort(
        np.asarray(
            jnp.einsum("nj,nj->j", V, AV)
            / jnp.einsum("nj,nj->j", V, V)
        )
    )

    for _ in range(max(steps, 1)):
        cols = []
        for j in range(m):
            y, _ = refined_solve(
                A,
                V[:, j],
                tol=0.0,
                rtol=rtol,
                M_lo=M_lo,
                inner_solve=inner_solve,
                max_outer=max_outer,
                inner_tol=inner_tol,
                inner_maxiter=inner_maxiter,
            )
            cols.append(y / jnp.linalg.norm(y))
        V = jnp.stack(cols, axis=1)

    # working-precision Rayleigh-Ritz on the refined block
    import scipy.linalg as sla

    G = np.asarray(V.T @ V)
    H = np.asarray(V.T @ A.matmat(V))
    H = 0.5 * (H + H.T)
    w, Q = sla.eigh(H, G)
    order = np.argsort(w)
    w = w[order]
    Vr = V @ jnp.asarray(Q[:, order], V.dtype)
    Vr = Vr / jnp.linalg.norm(Vr, axis=0, keepdims=True)
    return RefinedEigenpairs(
        eigenvalues=w, eigenvectors=Vr, rayleigh_before=rq_before
    )
