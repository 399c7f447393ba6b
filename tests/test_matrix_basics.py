"""Matrix interface contract vs a dense mirror, swept over all formats.

Mirrors /root/reference/test/matrix_test_basics.f90 (get/set, iteration,
matvec, matvec_t, permutation vs dense, all formats), matrix_test_copy.f90,
matrix_test_set_multiple_entries.f90, matrix_test_set_entry_with_realloc.f90
and the capability-flag assertions of matrix_test_query_slice_speed.f90.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sigma_tpu.matrix import (
    choose_matrix_type,
    convert_matrix,
    num_matrix_types,
)

ALL = list(range(1, num_matrix_types + 1))


def random_sparse(rng, n, m, p=0.12):
    dense = np.where(rng.random((n, m)) < p, rng.standard_normal((n, m)), 0.0)
    return dense


@pytest.mark.parametrize("frmt", ALL)
def test_construction_and_access(frmt, rng):
    n, m = 40, 56
    dense = random_sparse(rng, n, m)
    A = choose_matrix_type(frmt).from_dense(dense)
    assert A.shape == (n, m)
    assert A.nnz == np.count_nonzero(dense)
    np.testing.assert_allclose(A.to_dense(), dense, atol=0)
    rows, cols = np.nonzero(dense)
    np.testing.assert_allclose(A.get_values(rows, cols), dense[rows, cols])
    zi, zj = np.nonzero(dense == 0)
    np.testing.assert_array_equal(A.get_values(zi[:5], zj[:5]), 0.0)
    ri, ci, vi = A.entries()
    mirror = np.zeros_like(dense)
    mirror[ri, ci] = vi
    np.testing.assert_allclose(mirror, dense)


@pytest.mark.parametrize("frmt", ALL)
def test_matvec_matvec_t_vs_dense(frmt, rng):
    n, m = 48, 40
    dense = random_sparse(rng, n, m)
    A = choose_matrix_type(frmt).from_dense(dense)
    x = rng.standard_normal(m)
    y = rng.standard_normal(n)
    np.testing.assert_allclose(A.matvec(jnp.asarray(x)), dense @ x, atol=1e-14)
    np.testing.assert_allclose(A.rmatvec(jnp.asarray(y)), dense.T @ y, atol=1e-14)
    # operator sugar
    np.testing.assert_allclose(A @ x, dense @ x, atol=1e-14)
    np.testing.assert_allclose(A.T @ y, dense.T @ y, atol=1e-14)


@pytest.mark.parametrize("frmt", ALL)
def test_multivector_spmm(frmt, rng):
    """Multi-vector SpMM — the capability the reference lacks (README.md:83)."""
    n, m, k = 40, 32, 7
    dense = random_sparse(rng, n, m)
    A = choose_matrix_type(frmt).from_dense(dense)
    X = rng.standard_normal((m, k))
    Y = rng.standard_normal((n, k))
    np.testing.assert_allclose(A.matmat(jnp.asarray(X)), dense @ X, atol=1e-13)
    np.testing.assert_allclose(A.rmatmat(jnp.asarray(Y)), dense.T @ Y, atol=1e-13)


@pytest.mark.parametrize("frmt", ALL)
def test_matvec_under_jit(frmt, rng):
    n = 32
    dense = random_sparse(rng, n, n)
    A = choose_matrix_type(frmt).from_dense(dense)
    x = jnp.asarray(rng.standard_normal(n))
    f = jax.jit(lambda A, x: A.matvec(x))
    np.testing.assert_allclose(f(A, x), dense @ np.asarray(x), atol=1e-14)


@pytest.mark.parametrize("frmt", ALL)
def test_set_add_values(frmt, rng):
    n = 24
    dense = random_sparse(rng, n, n, p=0.2)
    A = choose_matrix_type(frmt).from_dense(dense)
    rows, cols = np.nonzero(dense)
    k = min(10, rows.size)
    sel = rng.choice(rows.size, size=k, replace=False)
    newvals = rng.standard_normal(k)
    A2 = A.set_values(rows[sel], cols[sel], newvals)
    dense2 = dense.copy()
    dense2[rows[sel], cols[sel]] = newvals
    np.testing.assert_allclose(A2.to_dense(), dense2)
    A3 = A2.add_values(rows[sel], cols[sel], newvals)
    dense3 = dense2.copy()
    dense3[rows[sel], cols[sel]] += newvals
    np.testing.assert_allclose(A3.to_dense(), dense3)
    # original untouched (functional semantics)
    np.testing.assert_allclose(A.to_dense(), dense)


@pytest.mark.parametrize("frmt", ALL)
def test_set_with_fill_in(frmt, rng):
    """Setting a structurally-absent entry rebuilds sparsity — mirrors
    matrix_test_set_entry_with_realloc.f90."""
    n = 20
    dense = random_sparse(rng, n, n, p=0.15)
    A = choose_matrix_type(frmt).from_dense(dense)
    zi, zj = np.nonzero(dense == 0)
    A2 = A.set_values([zi[3], zi[7]], [zj[3], zj[7]], [5.0, -2.0])
    dense2 = dense.copy()
    dense2[zi[3], zj[3]] = 5.0
    dense2[zi[7], zj[7]] = -2.0
    np.testing.assert_allclose(A2.to_dense(), dense2)
    assert A2.nnz == A.nnz + 2


@pytest.mark.parametrize("frmt", ALL)
def test_add_block(frmt, rng):
    """Dense-block accumulate — mirrors matrix_test_set_multiple_entries.f90."""
    n = 16
    dense = random_sparse(rng, n, n, p=0.3)
    A = choose_matrix_type(frmt).from_dense(dense)
    # distinct rows/cols (numpy ix_ mirror does not accumulate duplicates);
    # entries absent from the sparsity exercise the fill-in path
    rows = np.array([2, 7])
    cols = np.array([1, 11])
    block = rng.standard_normal((2, 2))
    A2 = A.add_block(rows, cols, block)
    dense2 = dense.copy()
    dense2[np.ix_(rows, cols)] += block
    np.testing.assert_allclose(A2.to_dense(), dense2)


@pytest.mark.parametrize("frmt", ALL)
def test_permute_and_transpose(frmt, rng):
    n, m = 24, 18
    dense = random_sparse(rng, n, m)
    A = choose_matrix_type(frmt).from_dense(dense)
    p, q = rng.permutation(n), rng.permutation(m)
    mirror = np.zeros_like(dense); mirror[p, :] = dense
    np.testing.assert_allclose(A.permute_rows(p).to_dense(), mirror)
    mirror = np.zeros_like(dense); mirror[:, q] = dense
    np.testing.assert_allclose(A.permute_cols(q).to_dense(), mirror)
    np.testing.assert_allclose(A.transpose_matrix().to_dense(), dense.T)


@pytest.mark.parametrize("src", ALL)
@pytest.mark.parametrize("dst", ALL)
def test_copy_all_format_pairs(src, dst, rng):
    dense = random_sparse(rng, 24, 30)
    A = choose_matrix_type(src).from_dense(dense)
    B = convert_matrix(A, dst)
    np.testing.assert_allclose(B.to_dense(), dense)


def test_capability_flags():
    """Mirrors matrix_test_query_slice_speed.f90 (it asserts the
    is_get_row/column_fast metadata, not wall-clock)."""
    assert choose_matrix_type("csr").is_get_row_fast
    assert not choose_matrix_type("csr").is_get_column_fast
    assert choose_matrix_type("csc").is_get_column_fast
    assert not choose_matrix_type("csc").is_get_row_fast
    assert choose_matrix_type("ell").is_get_row_fast
    assert not choose_matrix_type("coo").is_get_row_fast


def test_diagonal_and_scale(rng):
    n = 16
    dense = random_sparse(rng, n, n, p=0.3)
    np.fill_diagonal(dense, rng.standard_normal(n))
    for frmt in ALL:
        A = choose_matrix_type(frmt).from_dense(dense)
        np.testing.assert_allclose(A.diagonal(), np.diag(dense))
        np.testing.assert_allclose(A.scale(2.5).to_dense(), 2.5 * dense)


def test_shared_graph_between_matrices(rng):
    """Two matrices over one graph object — the set_graph sharing idiom
    (sparse_matrix_interfaces.f90:313; refcounts replaced by GC)."""
    from sigma_tpu.graph import GraphBuilder, build_graph
    from sigma_tpu.matrix import CSRMatrix

    dense = random_sparse(rng, 12, 12, p=0.3)
    g = build_graph(GraphBuilder.from_dense(dense != 0), "csr")
    A = CSRMatrix.from_graph(g)
    B = CSRMatrix.from_graph(g)
    assert A.graph is B.graph
    ri, ci = np.nonzero(dense)
    A = A.set_values(ri, ci, dense[ri, ci])
    np.testing.assert_allclose(A.to_dense(), dense)
    np.testing.assert_array_equal(B.to_dense(), 0.0)


def test_bsr_block_shapes(rng):
    from sigma_tpu.matrix import BSRMatrix

    dense = random_sparse(rng, 20, 28, p=0.1)
    for bs in [(4, 4), (8, 8), (2, 4)]:
        A = BSRMatrix.from_dense(dense, block_shape=bs)
        assert A.graph.block_shape == bs
        np.testing.assert_allclose(A.to_dense(), dense)
        x = rng.standard_normal(28)
        np.testing.assert_allclose(A @ x, dense @ x, atol=1e-13)


def test_bsr_transpose_nonsquare_blocks(rng):
    """transpose_matrix swaps BSR block dims (review regression)."""
    from sigma_tpu import BSRMatrix

    d = rng.standard_normal((4, 8))
    M = BSRMatrix.from_dense(d, block_shape=(2, 4))
    Mt = M.transpose_matrix()
    assert Mt.graph.block_shape == (4, 2)
    assert np.max(np.abs(Mt.to_dense() - d.T)) < 1e-14


def test_from_coo_duplicates_and_sorted_fast_path(rng):
    """CSR's from_coo fast path (trusted from_sorted_coo freeze + direct
    value placement) must agree with the generic scatter path for
    unsorted, duplicated COO input — for every format."""
    n, m = 23, 17
    k = 140
    r = rng.integers(0, n, k)
    c = rng.integers(0, m, k)
    v = rng.standard_normal(k)
    dense = np.zeros((n, m))
    np.add.at(dense, (r, c), v)
    for frmt in ALL:
        A = choose_matrix_type(frmt).from_coo(n, m, r, c, v)
        np.testing.assert_allclose(A.to_dense(), dense, atol=1e-12)
        # rectangular diagonal (CSR overrides with a mask-based read)
        np.testing.assert_allclose(
            A.diagonal(), np.diag(dense), atol=1e-12
        )


def test_from_sorted_coo_matches_from_coo(rng):
    from sigma_tpu.graph.graph import CSRGraph

    n, m = 19, 31
    dense = random_sparse(rng, n, m, p=0.2)
    r, c = np.nonzero(dense)  # row-major sorted, unique by construction
    g1 = CSRGraph.from_coo(n, m, r, c)
    g2 = CSRGraph.from_sorted_coo(n, m, r, c)
    np.testing.assert_array_equal(g1.indptr, g2.indptr)
    np.testing.assert_array_equal(g1.indices, g2.indices)
    np.testing.assert_array_equal(g1.row_ids, g2.row_ids)
    assert g1.nnz == g2.nnz and g1.shape == g2.shape
