"""LOBPCG block eigensolver tests (extension; reference has only Lanczos).

Pins: eigenvalue accuracy vs dense eigh, preconditioning effectiveness
(AMG / Chebyshev from the solver layer), orthonormality, and the
amg_solve standalone V-cycle solver.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from sigma_tpu import CSRMatrix
from sigma_tpu.eigen import lobpcg
from sigma_tpu.solvers import amg_solve, smoothed_aggregation_amg


from conftest import laplacian_2d  # noqa: E402


def test_lobpcg_lowest_eigenpairs(rng):
    d = laplacian_2d(16)
    A = CSRMatrix.from_dense(d)
    res = lobpcg(A, m=5, tol=1e-9, maxiter=400)
    ref = np.linalg.eigvalsh(d)[:5]
    lam = np.sort(np.asarray(res.eigenvalues))
    assert np.max(np.abs(lam - ref)) < 1e-9
    V = np.asarray(res.eigenvectors)
    # eigen-residuals and orthonormality
    assert np.max(np.abs(d @ V - V * np.asarray(res.eigenvalues))) < 1e-7
    assert np.linalg.norm(V.T @ V - np.eye(5)) < 1e-10


def test_lobpcg_amg_preconditioned_faster(rng):
    d = laplacian_2d(24)
    A = CSRMatrix.from_dense(d)
    M = smoothed_aggregation_amg(A)
    res_pc = lobpcg(A, m=4, M=M, tol=1e-9, maxiter=200)
    res_plain = lobpcg(A, m=4, tol=1e-9, maxiter=400)
    ref = np.linalg.eigvalsh(d)[:4]
    assert np.max(np.abs(np.sort(np.asarray(res_pc.eigenvalues)) - ref)) < 1e-9
    assert int(res_pc.iterations) * 3 < int(res_plain.iterations)


def test_lobpcg_explicit_guess(rng):
    d = laplacian_2d(10)
    A = CSRMatrix.from_dense(d)
    X0 = rng.standard_normal((100, 3))
    res = lobpcg(A, X0=X0, tol=1e-10, maxiter=400)
    ref = np.linalg.eigvalsh(d)[:3]
    assert np.max(np.abs(np.sort(np.asarray(res.eigenvalues)) - ref)) < 1e-9


def test_lobpcg_block_size_validation():
    A = CSRMatrix.from_dense(np.eye(10))
    with pytest.raises(ValueError):
        lobpcg(A, m=4)  # 3m >= n


def test_amg_solve_standalone(rng):
    d = laplacian_2d(20)
    A = CSRMatrix.from_dense(d)
    xstar = rng.standard_normal(400)
    b = jnp.asarray(d @ xstar)
    x, info = amg_solve(A, b, tol=1e-10)
    assert np.max(np.abs(np.asarray(x) - xstar)) < 1e-8
    assert bool(info.converged)
    assert int(info.iterations) < 40  # grid-independent-ish V-cycle count
