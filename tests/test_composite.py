"""Composite block matrix tests.

Mirrors ``/root/reference/test/matrix_test_composite.f90`` (2x2 block matrix
with ER-Laplacian diagonal blocks and a *shared* off-diagonal coupling
topology used by both the (1,2) and (2,1) blocks; global value access
across blocks; matvec vs assembled dense result) and
``matrix_test_strategy.f90`` (the 1x1 wrapper case, full operation sweep).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sigma_tpu import CSCMatrix, CSRMatrix, ELLMatrix
from sigma_tpu.graph import CSRGraph
from sigma_tpu.matrix.composite import BlockMatrix

TOL = 1e-14


def er_laplacian(rng, n, p=0.15):
    adj = rng.random((n, n)) < p
    adj = np.triu(adj, 1)
    adj = adj | adj.T
    d = np.diag(adj.sum(1).astype(float))
    return d - adj.astype(float) + np.eye(n)


@pytest.fixture
def block_2x2(rng):
    n1, n2 = 20, 14
    dA = er_laplacian(rng, n1)
    dB = er_laplacian(rng, n2)
    dC = np.where(rng.random((n1, n2)) < 0.2, rng.standard_normal((n1, n2)), 0.0)
    dC[0, 0] = 1.5  # ensure nonempty
    A = BlockMatrix.from_blocks(
        [
            [CSRMatrix.from_dense(dA), CSRMatrix.from_dense(dC)],
            [CSCMatrix.from_dense(dC.T), ELLMatrix.from_dense(dB)],
        ]
    )
    dense = np.block([[dA, dC], [dC.T, dB]])
    return A, dense


def test_shapes_and_offsets(block_2x2):
    A, dense = block_2x2
    assert A.shape == dense.shape
    assert A.block_shape == (2, 2)
    assert list(A.row_offsets) == [0, 20, 34]
    assert list(A.col_offsets) == [0, 20, 34]


def test_matvec_vs_assembled(block_2x2, rng):
    A, dense = block_2x2
    x = rng.standard_normal(dense.shape[1])
    y = np.asarray(A.matvec(jnp.asarray(x)))
    assert np.max(np.abs(y - dense @ x)) < TOL
    yt = np.asarray(A.rmatvec(jnp.asarray(x)))
    assert np.max(np.abs(yt - dense.T @ x)) < TOL
    X = rng.standard_normal((dense.shape[1], 5))
    Y = np.asarray(A.matmat(jnp.asarray(X)))
    assert np.max(np.abs(Y - dense @ X)) < TOL


def test_matvec_jits(block_2x2, rng):
    A, dense = block_2x2
    x = jnp.asarray(rng.standard_normal(dense.shape[1]))
    y = jax.jit(lambda M, v: M.matvec(v))(A, x)
    assert np.max(np.abs(np.asarray(y) - dense @ np.asarray(x))) < TOL


def test_global_get(block_2x2, rng):
    A, dense = block_2x2
    ii = rng.integers(0, dense.shape[0], 50)
    jj = rng.integers(0, dense.shape[1], 50)
    got = A.get_values(ii, jj)
    assert np.max(np.abs(got - dense[ii, jj])) < TOL


def test_global_set_add(block_2x2):
    A, dense = block_2x2
    # entries spanning all four blocks, at existing sparsity positions
    rows, cols, _ = A.entries()
    pick = slice(0, len(rows), max(1, len(rows) // 7))
    ii, jj = rows[pick], cols[pick]
    A2 = A.set_values(ii, jj, np.full(len(ii), 7.0))
    assert np.max(np.abs(A2.get_values(ii, jj) - 7.0)) < TOL
    A3 = A2.add_values(ii, jj, np.full(len(ii), 1.0))
    assert np.max(np.abs(A3.get_values(ii, jj) - 8.0)) < TOL


def test_to_dense_roundtrip(block_2x2):
    A, dense = block_2x2
    assert np.max(np.abs(A.to_dense() - dense)) < TOL


def test_shared_graph_blocks(rng):
    """One coupling topology reused by (1,2) as CSR and (2,1) as CSC with the
    transpose — structural sharing of the immutable graph pytree
    (the refcount test at matrix_test_composite.f90:168-186)."""
    n1, n2 = 12, 9
    rows = np.array([0, 3, 5, 11, 7])
    cols = np.array([1, 8, 0, 2, 7])
    g = CSRGraph.from_coo(n1, n2, rows, cols)
    vals = rng.standard_normal(5)
    C12 = CSRMatrix.from_graph(g).set_values(rows, cols, vals)
    C21 = C12.transpose_matrix()
    dA = er_laplacian(rng, n1)
    dB = er_laplacian(rng, n2)
    A = BlockMatrix.from_blocks(
        [
            [CSRMatrix.from_dense(dA), C12],
            [C21, CSRMatrix.from_dense(dB)],
        ]
    )
    dC = C12.to_dense()
    dense = np.block([[dA, dC], [dC.T, dB]])
    x = rng.standard_normal(n1 + n2)
    assert np.max(np.abs(np.asarray(A.matvec(jnp.asarray(x))) - dense @ x)) < TOL
    # the two blocks literally share one topology object
    assert C12.graph is g


def test_absent_blocks(rng):
    """None blocks are structural zeros: block-diagonal grid."""
    d1 = er_laplacian(rng, 10)
    d2 = er_laplacian(rng, 6)
    A = BlockMatrix.empty([10, 6], [10, 6])
    A = A.set_block(0, 0, CSRMatrix.from_dense(d1))
    A = A.set_block(1, 1, CSRMatrix.from_dense(d2))
    dense = np.block(
        [[d1, np.zeros((10, 6))], [np.zeros((6, 10)), d2]]
    )
    x = rng.standard_normal(16)
    assert np.max(np.abs(np.asarray(A.matvec(jnp.asarray(x))) - dense @ x)) < TOL
    assert A.get_value(3, 12) == 0.0
    assert A.nnz == CSRMatrix.from_dense(d1).nnz + CSRMatrix.from_dense(d2).nnz


def test_strategy_wrapper(rng):
    """1x1 BlockMatrix wraps a CSR leaf opaquely (matrix_test_strategy)."""
    d = er_laplacian(rng, 15)
    leaf = CSRMatrix.from_dense(d)
    A = BlockMatrix.wrap(leaf)
    assert A.shape == (15, 15)
    assert A.is_get_row_fast and not A.is_get_column_fast
    x = rng.standard_normal(15)
    assert np.max(np.abs(np.asarray(A.matvec(jnp.asarray(x))) - d @ x)) < TOL
    ii = rng.integers(0, 15, 20)
    jj = rng.integers(0, 15, 20)
    assert np.max(np.abs(A.get_values(ii, jj) - d[ii, jj])) < TOL
    assert np.max(np.abs(A.to_dense() - d)) < TOL


def test_capability_flags(block_2x2):
    A, _ = block_2x2
    # mixed CSR/CSC/ELL grid: neither all-rows-fast nor all-cols-fast
    assert not A.is_get_row_fast
    assert not A.is_get_column_fast
    ok = BlockMatrix.from_blocks(
        [[CSRMatrix.from_dense(np.eye(4)), CSRMatrix.from_dense(np.eye(4))]]
    )
    assert ok.is_get_row_fast


def test_shape_validation():
    with pytest.raises(ValueError):
        BlockMatrix.from_blocks(
            [
                [CSRMatrix.from_dense(np.eye(3)), CSRMatrix.from_dense(np.eye(4))],
                [CSRMatrix.from_dense(np.eye(4)), CSRMatrix.from_dense(np.eye(4))],
            ]
        )
    A = BlockMatrix.empty([3, 4], [3, 4])
    with pytest.raises(ValueError):
        A.set_block(0, 1, CSRMatrix.from_dense(np.eye(3)))


def test_solver_on_composite(block_2x2, rng):
    """Composite operator feeds straight into CG (it is a LinearOperator)."""
    from sigma_tpu.solvers import cg_solve

    A, dense = block_2x2
    # symmetrize: our 2x2 grid is already symmetric by construction
    xstar = rng.standard_normal(dense.shape[0])
    b = dense @ xstar
    x, info = cg_solve(A, jnp.asarray(b), tol=1e-14, maxiter=2000)
    assert np.max(np.abs(np.asarray(x) - xstar)) < 1e-8


def test_nested_blockmatrix_set(rng):
    """Nested composites support writes, matching reads (review regression)."""
    inner = BlockMatrix.wrap(CSRMatrix.from_dense(np.eye(3)))
    outer = BlockMatrix.from_blocks([[inner]])
    out2 = outer.set_values([2], [2], [9.0])
    assert out2.get_value(2, 2) == 9.0


def test_blockmatrix_bounds(block_2x2):
    A, dense = block_2x2
    with pytest.raises(IndexError):
        A.get_values([-1], [0])
    with pytest.raises(IndexError):
        A.get_values([dense.shape[0]], [0])


def test_block_matrix_ducktyped_nnz_entries_rmatmat(rng):
    # review regressions: nnz counted only SparseMatrix leaves (0 for
    # pruned/nested blocks), entries() densified pruned leaves, and
    # rmatmat fell back to the per-column vmap
    from sigma_tpu.matrix.composite import BlockMatrix
    from sigma_tpu.matrix.pruned import PrunedDIAMatrix

    n = 600
    dense = np.zeros((n, n))
    i = np.arange(n)
    dense[i, i] = 3.0
    dense[i[:-1], i[1:]] = -1.0
    rows, cols = np.nonzero(dense)
    P = PrunedDIAMatrix.from_coo(n, n, rows, cols, dense[rows, cols],
                                 tile_rows=1024, group=2)
    A = BlockMatrix.from_blocks([[P, None], [None, P]])
    assert A.nnz == 2 * P.nnz
    nested = BlockMatrix.from_blocks([[A]])
    assert nested.nnz == A.nnz
    r, c, v = A.entries()
    d2 = np.zeros((2 * n, 2 * n))
    d2[r, c] = v
    big = np.zeros((2 * n, 2 * n))
    big[:n, :n] = dense
    big[n:, n:] = dense
    assert np.abs(d2 - big).max() == 0.0
    X = jnp.asarray(rng.standard_normal((2 * n, 3)))
    Y = np.asarray(A.rmatmat(X))
    assert np.abs(Y - big.T @ np.asarray(X)).max() < 1e-10
