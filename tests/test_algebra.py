"""Explicit algebra tests: sum / SpGEMM / PtAP / RARt vs dense oracles.

Mirrors ``/root/reference/test/matrix_test_sum.f90`` (edge-union sum over
format pairs), ``matrix_test_product.f90`` (SpGEMM over format triples,
dense matmul oracle, tol 1e-14), ``matrix_test_ptap.f90`` (random 256->128
coarsening, dense P^T A P oracle) — rebuilt with parametrized fixtures plus
the plan-reuse paths the reference lacks.
"""

import numpy as np
import pytest

from sigma_tpu import (
    BSRMatrix,
    COOMatrix,
    CSCMatrix,
    CSRMatrix,
    ELLMatrix,
)
from sigma_tpu.matrix.algebra import (
    plan_ptap,
    plan_rart,
    plan_sparse_add,
    plan_sparse_matmul,
    ptap,
    rart,
    sparse_add,
    sparse_matmul,
)

FORMATS = [CSRMatrix, CSCMatrix, COOMatrix, ELLMatrix, BSRMatrix]
TOL = 1e-14


def random_sparse(rng, cls, n, m, p=0.1):
    dense = np.where(rng.random((n, m)) < p, rng.standard_normal((n, m)), 0.0)
    # guarantee at least one entry
    dense[rng.integers(n), rng.integers(m)] = rng.standard_normal() + 2.0
    return cls.from_dense(dense), dense


@pytest.mark.parametrize("cls_a", FORMATS)
@pytest.mark.parametrize("cls_b", FORMATS)
def test_sum_format_pairs(rng, cls_a, cls_b):
    A, dA = random_sparse(rng, cls_a, 24, 17)
    B, dB = random_sparse(rng, cls_b, 24, 17)
    C = sparse_add(A, B)
    assert isinstance(C, cls_a)
    assert np.max(np.abs(C.to_dense() - (dA + dB))) < TOL


def test_sum_scaled(rng):
    A, dA = random_sparse(rng, CSRMatrix, 30, 30)
    B, dB = random_sparse(rng, CSCMatrix, 30, 30)
    C = sparse_add(A, B, alpha=2.5, beta=-0.5)
    assert np.max(np.abs(C.to_dense() - (2.5 * dA - 0.5 * dB))) < TOL


def test_sum_plan_reuse(rng):
    A, dA = random_sparse(rng, CSRMatrix, 20, 20)
    B, dB = random_sparse(rng, ELLMatrix, 20, 20)
    plan = plan_sparse_add(A, B)
    C1 = plan(A, B)
    A2 = A.with_data(A.data * 3.0)
    C2 = plan(A2, B)
    assert np.max(np.abs(C1.to_dense() - (dA + dB))) < TOL
    assert np.max(np.abs(C2.to_dense() - (3.0 * dA + dB))) < TOL


@pytest.mark.parametrize("cls_a", FORMATS)
@pytest.mark.parametrize("cls_b", FORMATS)
def test_product_format_pairs(rng, cls_a, cls_b):
    A, dA = random_sparse(rng, cls_a, 18, 25)
    B, dB = random_sparse(rng, cls_b, 25, 13)
    C = sparse_matmul(A, B)
    assert np.max(np.abs(C.to_dense() - dA @ dB)) < TOL


@pytest.mark.parametrize("out_cls", FORMATS)
def test_product_output_format(rng, out_cls):
    A, dA = random_sparse(rng, CSRMatrix, 16, 16)
    B, dB = random_sparse(rng, CSRMatrix, 16, 16)
    C = sparse_matmul(A, B, out_format=out_cls)
    assert isinstance(C, out_cls)
    assert np.max(np.abs(C.to_dense() - dA @ dB)) < TOL


def test_product_plan_reuse(rng):
    A, dA = random_sparse(rng, CSRMatrix, 20, 22)
    B, dB = random_sparse(rng, CSCMatrix, 22, 18)
    plan = plan_sparse_matmul(A, B)
    B2 = B.with_data(B.data * -2.0)
    assert np.max(np.abs(plan(A, B).to_dense() - dA @ dB)) < TOL
    assert np.max(np.abs(plan(A, B2).to_dense() - dA @ (-2.0 * dB))) < TOL


def test_product_empty_inner(rng):
    # rows of A whose columns have no matching B rows
    A = CSRMatrix.from_coo(4, 5, [0, 3], [1, 4], [2.0, 3.0])
    B = CSRMatrix.from_coo(5, 3, [2], [0], [1.0])
    C = sparse_matmul(A, B)
    assert np.max(np.abs(C.to_dense())) == 0.0


def _coarsening(rng, n_fine, n_coarse):
    """Random aggregation P (n_fine x n_coarse) like matrix_test_ptap's
    256->128 coarsening graph."""
    dense = np.zeros((n_fine, n_coarse))
    agg = rng.integers(0, n_coarse, size=n_fine)
    dense[np.arange(n_fine), agg] = 1.0
    extra = rng.random((n_fine, n_coarse)) < 0.02
    dense[extra] = 0.5
    return dense


@pytest.mark.parametrize("cls", [CSRMatrix, CSCMatrix, ELLMatrix])
def test_ptap(rng, cls):
    n_fine, n_coarse = 64, 32
    A, dA = random_sparse(rng, cls, n_fine, n_fine, p=0.08)
    dP = _coarsening(rng, n_fine, n_coarse)
    P = cls.from_dense(dP)
    B = ptap(A, P)
    assert B.shape == (n_coarse, n_coarse)
    assert np.max(np.abs(B.to_dense() - dP.T @ dA @ dP)) < TOL


def test_ptap_plan_reuse(rng):
    n_fine, n_coarse = 48, 24
    A, dA = random_sparse(rng, CSRMatrix, n_fine, n_fine, p=0.1)
    dP = _coarsening(rng, n_fine, n_coarse)
    P = CSRMatrix.from_dense(dP)
    plan = plan_ptap(A, P)
    A2 = A.with_data(A.data * 0.5)
    assert np.max(np.abs(plan(A, P).to_dense() - dP.T @ dA @ dP)) < TOL
    assert np.max(np.abs(plan(A2, P).to_dense() - 0.5 * dP.T @ dA @ dP)) < TOL


@pytest.mark.parametrize("cls", [CSRMatrix, COOMatrix])
def test_rart(rng, cls):
    n_fine, n_coarse = 54, 27
    A, dA = random_sparse(rng, cls, n_fine, n_fine, p=0.1)
    dR = _coarsening(rng, n_fine, n_coarse).T  # (n_coarse, n_fine)
    R = cls.from_dense(dR)
    B = rart(A, R)
    assert B.shape == (n_coarse, n_coarse)
    assert np.max(np.abs(B.to_dense() - dR @ dA @ dR.T)) < TOL


def test_rart_plan_reuse(rng):
    n_fine, n_coarse = 40, 20
    A, dA = random_sparse(rng, CSRMatrix, n_fine, n_fine, p=0.1)
    dR = _coarsening(rng, n_fine, n_coarse).T
    R = CSRMatrix.from_dense(dR)
    plan = plan_rart(A, R)
    A2 = A.with_data(A.data * 2.0)
    assert np.max(np.abs(plan(A2, R).to_dense() - 2.0 * dR @ dA @ dR.T)) < TOL


def test_galerkin_laplacian(rng):
    """PtAP of a 1D Laplacian under linear-interpolation P gives the coarse
    Laplacian (scaled) — the multigrid sanity check."""
    n = 33  # fine points, coarse = 16
    nc = (n - 1) // 2
    dA = 2 * np.eye(n) - np.eye(n, k=1) - np.eye(n, k=-1)
    dP = np.zeros((n, nc))
    for j in range(nc):
        f = 2 * j + 1
        dP[f, j] = 1.0
        dP[f - 1, j] = 0.5
        if f + 1 < n:
            dP[f + 1, j] = 0.5
    A = CSRMatrix.from_dense(dA)
    P = CSRMatrix.from_dense(dP)
    B = ptap(A, P)
    assert np.max(np.abs(B.to_dense() - dP.T @ dA @ dP)) < TOL
    # coarse operator is again tridiagonal with 0.5*[−1, 2, −1] stencil
    dB = B.to_dense()
    assert abs(dB[3, 3] - 1.0) < TOL and abs(dB[3, 4] + 0.5) < TOL


def test_string_out_format(rng):
    """The documented string form of out_format (review regression)."""
    A, dA = random_sparse(rng, CSRMatrix, 12, 12)
    B, dB = random_sparse(rng, CSRMatrix, 12, 12)
    C = sparse_add(A, B, out_format="ell")
    assert C.format == "ell"
    D = sparse_matmul(A, B, out_format="csc")
    assert D.format == "csc"
    assert np.max(np.abs(D.to_dense() - dA @ dB)) < TOL
