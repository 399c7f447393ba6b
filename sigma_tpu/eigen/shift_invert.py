"""Shift-invert Lanczos with mixed-precision ladder solves: f64-grade
extreme eigenpairs of huge SPD operators whose fast kernels are f32.

The at-scale recipe behind the 1M-row unstructured eigenpair result
(BENCHMARKS.md round 5: lowest three eigenvalues at 1e-12 Ritz
residuals): a HOST-side float64 Lanczos recurrence on
``B = (A - sigma)^{-1}`` where every application of ``B`` is an
iterative-refinement ladder — float64 residual sweeps through a host
CSR matvec (scipy), float32 Krylov inner solves on the device kernels
(optionally preconditioned).  Nothing float64 ever reaches the TPU
(``jax_enable_x64`` faults this stack's worker inside large jitted
programs — CLAUDE.md round-5 gotcha), yet the recurrence, the
reorthogonalization, and the final Rayleigh-Ritz are all genuinely
double precision.

Shift guidance (measured, BENCHMARKS.md round 5): against a
near-continuum low spectrum, plain ``sigma = 0`` contracts at only
~0.81/step and an aggressive ``sigma ~ 0.99 lambda_1`` breaks the f32
inner solves (kappa(M^-1(A - sigma)) ~ 1/(1 - sigma/lambda_1)); the
working point is ``sigma ~ 0.9 lambda_1`` from any safe lower bound
(e.g. an f32 Rayleigh estimate, accurate to residual^2/gap).

Re-designs ``/root/reference/src/eigensolver.f90:95-140`` (generalized
Lanczos with a per-step solve, all-f64 LAPACK at toy sizes) as the
TPU-native precision split.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import numpy as np

__all__ = ["shift_invert_lanczos", "ShiftInvertResult"]


class ShiftInvertResult(NamedTuple):
    # m may be smaller than requested if the Lanczos recurrence broke
    # down (invariant subspace) before m steps — check `steps`
    eigenvalues: np.ndarray   # (m,) lowest, ascending, float64
    eigenvectors: np.ndarray  # (n, m) float64, orthonormal
    residuals: np.ndarray     # (m,) ||A v - lambda v|| per pair
    steps: int                # Lanczos steps taken


def shift_invert_lanczos(
    n,
    rows,
    cols,
    vals,
    *,
    sigma: float,
    inner_solve: Callable[[np.ndarray], np.ndarray],
    m: int = 3,
    k: int = 64,
    sweeps: int = 3,
    v0: Optional[np.ndarray] = None,
    seed: int = 0,
) -> ShiftInvertResult:
    """Lowest ``m`` eigenpairs of the SPD operator given by COO triples.

    ``sigma``: the shift (must be a strict lower bound on lambda_1; see
    the module docstring for the measured sweet spot).
    ``inner_solve(r32) -> d32``: an f32 approximate solve of
    ``(A - sigma I) d = r`` on unit-norm ``r`` — typically a jitted
    GMG-preconditioned CG over a shifted device operator; its relative
    accuracy only needs to be ~1e-4 or better, the ladder squares it
    per sweep.  ``k``: Lanczos steps (convergence is exponential;
    measured ~0.83/step on the 1M mesh at sigma = 0.9 lambda_1).

    Host cost: one scipy-CSR f64 matvec per ladder sweep (~0.05 s per
    70M nnz) + two-pass reorthogonalization GEMMs; host memory holds
    the (n, k) f64 basis.  Triples must be duplicate-free (scipy SUMS
    duplicates, unlike the matrix classes' last-value-wins packing —
    mixed semantics would silently change the operator).
    """
    import scipy.sparse as sp

    rows = np.asarray(rows, dtype=np.int64).ravel()
    cols = np.asarray(cols, dtype=np.int64).ravel()
    vals64 = np.asarray(vals, dtype=np.float64).ravel()
    n = int(n)
    Asp = sp.csr_matrix((vals64, (rows, cols)), shape=(n, n))
    # A - sigma*I on EVERY row: rows with no stored diagonal triple get
    # an appended (i, i, -sigma) entry — subtracting only from stored
    # diagonals would silently solve the wrong resolvent there
    shifted = vals64.copy()
    dm = rows == cols
    shifted[dm] -= sigma
    present = np.zeros(n, dtype=bool)
    present[rows[dm]] = True
    missing = np.nonzero(~present)[0]
    Ssp = sp.csr_matrix(
        (
            np.concatenate([shifted, np.full(missing.size, -sigma)]),
            (
                np.concatenate([rows, missing]),
                np.concatenate([cols, missing]),
            ),
        ),
        shape=(n, n),
    )

    def solve64(b64):
        x64 = np.zeros(n)
        bn = np.linalg.norm(b64)
        for _ in range(sweeps):
            r = b64 - Ssp @ x64
            rn = np.linalg.norm(r)
            if rn < 1e-13 * bn:
                break
            d = np.asarray(
                inner_solve((r / rn).astype(np.float32)), dtype=np.float64
            )
            x64 = x64 + rn * d
        return x64

    rng = np.random.default_rng(seed)
    v = (
        np.asarray(v0, dtype=np.float64)
        if v0 is not None
        else rng.standard_normal(n)
    )
    v = v / np.linalg.norm(v)
    V = np.zeros((n, k), dtype=np.float64)
    al = np.zeros(k)
    be = np.zeros(k)
    steps = k
    for i in range(k):
        V[:, i] = v
        w = solve64(v)
        al[i] = v @ w
        w -= al[i] * v
        if i:
            w -= be[i - 1] * V[:, i - 1]
        # two-pass full reorthogonalization (the recurrence is f64 but
        # selective orthogonality still decays; CGS2 is two GEMMs)
        Vi = V[:, : i + 1]
        w -= Vi @ (Vi.T @ w)
        w -= Vi @ (Vi.T @ w)
        be[i] = np.linalg.norm(w)
        # scale-FREE breakdown guard: eps*n*(|a| + beta_prev), the
        # lanczos.py round-3 form — an O(1) floor falsely fires on
        # every step of a small-scaled resolvent (||B'|| ~ 1e-14 for
        # an unscaled elasticity-magnitude operator) and truncates the
        # basis to garbage
        beta_prev = be[i - 1] if i else 0.0
        if be[i] < np.finfo(np.float64).eps * n * (abs(al[i]) + beta_prev):
            steps = i + 1
            break
        v = w / be[i]
    T = (
        np.diag(al[:steps])
        + np.diag(be[: steps - 1], 1)
        + np.diag(be[: steps - 1], -1)
    )
    th, Q = np.linalg.eigh(T)
    # breakdown before m steps: the Krylov space holds only `steps`
    # Ritz pairs — return that many rather than uninitialized slots
    m = min(m, steps)
    idx = np.argsort(-th)[:m]  # largest theta of (A - sigma)^{-1}
    lam = np.empty(m)
    res = np.empty(m)
    W = np.empty((n, m))
    for out_j, j in enumerate(idx):
        y = V[:, :steps] @ Q[:, j]
        y /= np.linalg.norm(y)
        Ay = Asp @ y
        lam[out_j] = y @ Ay
        res[out_j] = np.linalg.norm(Ay - lam[out_j] * y)
        W[:, out_j] = y
    order = np.argsort(lam)
    return ShiftInvertResult(
        eigenvalues=lam[order],
        eigenvectors=W[:, order],
        residuals=res[order],
        steps=steps,
    )
