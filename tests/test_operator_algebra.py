"""Lazy operator algebra — mirrors linear_operator_test_algebra.f90
(L = A+B and L = A*B with mixed CSR×CSC storage; probes + matvec vs the
explicitly composed dense result, tol 1e-14)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sigma_tpu.matrix import CSCMatrix, CSRMatrix
from sigma_tpu.operators import (
    DenseOperator,
    DiagonalOperator,
    IdentityOperator,
    aslinearoperator,
)


def random_sparse(rng, n, m, p=0.15):
    return np.where(rng.random((n, m)) < p, rng.standard_normal((n, m)), 0.0)


def test_operator_sum_mixed_formats(rng):
    n = 32
    dA = random_sparse(rng, n, n)
    dB = random_sparse(rng, n, n)
    A = CSRMatrix.from_dense(dA)
    B = CSCMatrix.from_dense(dB)
    L = A + B
    x = rng.standard_normal(n)
    np.testing.assert_allclose(L @ x, (dA + dB) @ x, atol=1e-14)
    np.testing.assert_allclose(L.T @ x, (dA + dB).T @ x, atol=1e-14)
    np.testing.assert_allclose(float(L.get_value(3, 4)), dA[3, 4] + dB[3, 4], atol=1e-14)
    np.testing.assert_allclose(L.to_dense(), dA + dB, atol=1e-14)


def test_operator_product_mixed_formats(rng):
    n, k, m = 24, 30, 20
    dA = random_sparse(rng, n, k)
    dB = random_sparse(rng, k, m)
    L = CSRMatrix.from_dense(dA) @ CSCMatrix.from_dense(dB)
    assert L.shape == (n, m)
    x = rng.standard_normal(m)
    np.testing.assert_allclose(L @ x, dA @ dB @ x, atol=1e-13)
    y = rng.standard_normal(n)
    np.testing.assert_allclose(L.T @ y, (dA @ dB).T @ y, atol=1e-13)


def test_scale_neg_sub(rng):
    n = 16
    dA = random_sparse(rng, n, n)
    dB = random_sparse(rng, n, n)
    A, B = CSRMatrix.from_dense(dA), CSRMatrix.from_dense(dB)
    x = rng.standard_normal(n)
    np.testing.assert_allclose((2.0 * A) @ x, 2 * dA @ x, atol=1e-14)
    np.testing.assert_allclose((-A) @ x, -dA @ x, atol=1e-14)
    np.testing.assert_allclose((A - B) @ x, (dA - dB) @ x, atol=1e-14)
    np.testing.assert_allclose((A + B + A) @ x, (2 * dA + dB) @ x, atol=1e-14)


def test_adjoint_involution(rng):
    dA = random_sparse(rng, 10, 14)
    A = CSRMatrix.from_dense(dA)
    assert A.T.T is A
    np.testing.assert_allclose(A.T.to_dense(), dA.T, atol=1e-15)


def test_identity_diagonal_dense(rng):
    n = 12
    I = IdentityOperator(n)
    d = rng.standard_normal(n)
    D = DiagonalOperator(jnp.asarray(d))
    x = rng.standard_normal(n)
    np.testing.assert_allclose(I @ x, x)
    np.testing.assert_allclose(D @ x, d * x)
    M = rng.standard_normal((n, n))
    np.testing.assert_allclose(aslinearoperator(M) @ x, M @ x, atol=1e-14)
    np.testing.assert_allclose((D @ aslinearoperator(M) + I) @ x, d * (M @ x) + x, atol=1e-13)


def test_composites_jit(rng):
    n = 16
    dA = random_sparse(rng, n, n)
    dB = random_sparse(rng, n, n)
    L = CSRMatrix.from_dense(dA) @ CSCMatrix.from_dense(dB) + 0.5 * CSRMatrix.from_dense(dA)
    x = jnp.asarray(rng.standard_normal(n))
    f = jax.jit(lambda L, x: L.matvec(x))
    np.testing.assert_allclose(
        f(L, x), dA @ dB @ np.asarray(x) + 0.5 * dA @ np.asarray(x), atol=1e-13
    )


def test_shape_mismatch_raises(rng):
    A = CSRMatrix.from_dense(random_sparse(rng, 4, 5))
    B = CSRMatrix.from_dense(random_sparse(rng, 5, 4))
    with pytest.raises(ValueError):
        _ = A + B
    with pytest.raises(ValueError):
        _ = A @ A


def test_composite_rmatmat_delegation(rng):
    # review regression: adjoint/sum/product/scaled fell back to the
    # per-column vmap instead of delegating multi-RHS applies
    from sigma_tpu import CSRMatrix
    from sigma_tpu.operators import ScaledOperator

    n = 40
    dA = rng.standard_normal((n, n))
    dB = rng.standard_normal((n, n))
    A = CSRMatrix.from_dense(dA)
    B = CSRMatrix.from_dense(dB)
    X = jnp.asarray(rng.standard_normal((n, 3)))
    assert np.allclose(np.asarray(A.T.rmatmat(X)), dA @ np.asarray(X))
    assert np.allclose(
        np.asarray((A + B).rmatmat(X)), (dA + dB).T @ np.asarray(X)
    )
    assert np.allclose(
        np.asarray((A @ B).rmatmat(X)), (dA @ dB).T @ np.asarray(X),
        atol=1e-10,
    )
    S = ScaledOperator(jnp.asarray(2.0), A)
    assert np.allclose(np.asarray(S.rmatmat(X)), 2.0 * dA.T @ np.asarray(X))
