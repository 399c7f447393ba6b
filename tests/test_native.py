"""Native host core tests: C++ kernels vs their numpy fallbacks.

The compiled library (``native/sigma_host.cpp``) accelerates host-side
topology freezing and reordering; these tests pin exact agreement between
the native path and the pure-numpy fallback on random inputs, plus the
speedup sanity on a large build.
"""

import numpy as np
import pytest

from sigma_tpu import native
from sigma_tpu.graph import CSRGraph

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library unavailable (no g++)"
)


def test_csr_from_coo_matches_numpy(rng):
    n, m, ne = 50, 40, 600
    rows = rng.integers(0, n, ne)
    cols = rng.integers(0, m, ne)
    r, c, ptr = native.csr_from_coo(n, m, rows, cols)
    keys = np.unique(rows.astype(np.int64) * m + cols)
    assert np.array_equal(r, keys // m)
    assert np.array_equal(c, keys % m)
    ref_ptr = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(np.bincount(keys // m, minlength=n), out=ref_ptr[1:])
    assert np.array_equal(ptr, ref_ptr)


def test_csr_from_coo_empty_rows():
    r, c, ptr = native.csr_from_coo(5, 5, [3, 3, 3], [2, 1, 2])
    assert np.array_equal(r, [3, 3])
    assert np.array_equal(c, [1, 2])
    assert np.array_equal(ptr, [0, 0, 0, 0, 2, 2])


def test_bfs_order_is_level_order(rng):
    n = 40
    dense = np.triu(rng.random((n, n)) < 0.1, 1)
    dense = dense | dense.T
    g = CSRGraph.from_dense(dense)
    rows, cols = g.edges_numpy()
    ptr = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(np.bincount(rows, minlength=n), out=ptr[1:])
    p = native.bfs_order(ptr, cols, 0)
    assert np.array_equal(np.sort(p), np.arange(n))


def test_greedy_coloring_proper(rng):
    n = 60
    dense = np.triu(rng.random((n, n)) < 0.1, 1)
    dense = dense | dense.T
    rows, cols = np.nonzero(dense)
    ptr = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(np.bincount(rows, minlength=n), out=ptr[1:])
    colors, nc = native.greedy_coloring(ptr, cols)
    off = rows != cols
    assert (colors[rows[off]] != colors[cols[off]]).all()
    assert nc <= int(dense.sum(1).max()) + 1


def test_triangular_levels():
    # strict lower-triangular chain 1<-0, 2<-1, plus independent 3
    # rows: 1 depends on 0; 2 on 1; 3 none; 4 on 0 and 2
    ptr = np.array([0, 0, 1, 2, 2, 4], dtype=np.int64)
    idx = np.array([0, 1, 0, 2], dtype=np.int64)
    lvl, nl = native.triangular_levels(ptr, idx)
    assert np.array_equal(lvl, [0, 1, 2, 0, 3])
    assert nl == 4


def test_edge_positions(rng):
    n, m = 30, 25
    dense = rng.random((n, m)) < 0.2
    rows, cols = np.nonzero(dense)
    ptr = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(np.bincount(rows, minlength=n), out=ptr[1:])
    qr = rng.integers(0, n, 100)
    qc = rng.integers(0, m, 100)
    pos = native.edge_positions(qr, qc, ptr, cols)
    for k in range(100):
        if dense[qr[k], qc[k]]:
            assert rows[pos[k]] == qr[k] and cols[pos[k]] == qc[k]
        else:
            assert pos[k] == -1


def test_native_matches_numpy_freeze(rng):
    """native.csr_from_coo must agree exactly with the (wired) numpy freeze
    path — the native variant is bound and kept for environments where the
    numpy SIMD sort is unavailable, so divergence may not ship."""
    n = 200
    ne = 3000
    rows = rng.integers(0, n, ne)
    cols = rng.integers(0, n, ne)
    g = CSRGraph.from_coo(n, n, rows, cols)  # numpy path (the default)
    r_np, c_np = g.edges_numpy()
    r_nat, c_nat, ptr = native.csr_from_coo(n, n, rows, cols)
    assert np.array_equal(r_np, r_nat)
    assert np.array_equal(c_np, c_nat)
    assert ptr[-1] == r_nat.size


def test_native_bfs_matches_python_fallback(rng, monkeypatch):
    """The C++ BFS and the pure-python fallback must produce the identical
    visit-rank permutation from start=0 (same lowest-unvisited restart
    rule)."""
    import sigma_tpu.native as native_mod
    from sigma_tpu.graph.permutations import breadth_first_search

    n = 60
    dense = np.triu(rng.random((n, n)) < 0.08, 1)
    dense = dense | dense.T
    g = CSRGraph.from_dense(dense)
    p_native = breadth_first_search(g)
    # disable native: force the python branch
    monkeypatch.setattr(native_mod, "_lib", None)
    monkeypatch.setattr(native_mod, "_tried", True)
    p_python = breadth_first_search(g)
    assert np.array_equal(p_native, p_python)


def _disable_native(monkeypatch):
    import sigma_tpu.native as native_mod

    monkeypatch.setattr(native_mod, "_lib", None)
    monkeypatch.setattr(native_mod, "_tried", True)


def test_native_ilu0_matches_numpy(rng, monkeypatch):
    """The C++ ILU(0) numeric sweep must reproduce the numpy fallback's
    factors exactly (same ikj order, same arithmetic)."""
    from sigma_tpu import CSRMatrix
    from sigma_tpu.solvers.ildu import ildu0_factorize

    n = 80
    dense = np.triu(rng.random((n, n)) < 0.12, 1)
    dense = (dense | dense.T) * rng.standard_normal((n, n))
    dense = dense + np.diag(np.abs(dense).sum(1) + 1.0)
    A = CSRMatrix.from_dense(dense)
    (Lp1, Li1, Lx1), d1, (Up1, Ui1, Ux1) = ildu0_factorize(A)
    _disable_native(monkeypatch)
    (Lp2, Li2, Lx2), d2, (Up2, Ui2, Ux2) = ildu0_factorize(A)
    assert np.array_equal(Lp1, Lp2) and np.array_equal(Li1, Li2)
    assert np.array_equal(Up1, Up2) and np.array_equal(Ui1, Ui2)
    np.testing.assert_allclose(Lx1, Lx2, rtol=1e-15)
    np.testing.assert_allclose(d1, d2, rtol=1e-15)
    np.testing.assert_allclose(Ux1, Ux2, rtol=1e-15)


def test_native_ilu0_zero_pivot_raises():
    from sigma_tpu import CSRMatrix
    from sigma_tpu.solvers.ildu import ildu0_factorize

    dense = np.array([[0.0, 1.0], [1.0, 1.0]])
    with pytest.raises(ZeroDivisionError):
        ildu0_factorize(CSRMatrix.from_dense(dense))


def test_native_pack_levels_matches_numpy(rng, monkeypatch):
    """Level packing (C++) vs the per-row numpy fallback: identical padded
    arrays for both sweep directions."""
    from sigma_tpu.solvers.ildu import TriangularLevels

    n = 70
    for reverse in (False, True):
        tri = np.triu if reverse else np.tril
        strict = tri(rng.random((n, n)) < 0.15, 1 if reverse else -1)
        strict = strict * rng.standard_normal((n, n))
        rows, cols = np.nonzero(strict)
        order = np.lexsort((cols, rows))
        rows, cols = rows[order], cols[order]
        ptr = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(np.bincount(rows, minlength=n), out=ptr[1:])
        data = strict[rows, cols]
        t1 = TriangularLevels.from_csr(
            ptr, cols, data, n, reverse=reverse, dtype=np.float64
        )
        _disable_native(monkeypatch)
        t2 = TriangularLevels.from_csr(
            ptr, cols, data, n, reverse=reverse, dtype=np.float64
        )
        monkeypatch.undo()
        assert np.array_equal(np.asarray(t1.rows), np.asarray(t2.rows))
        assert np.array_equal(np.asarray(t1.cols), np.asarray(t2.cols))
        assert np.array_equal(np.asarray(t1.vals), np.asarray(t2.vals))


def test_native_aggregate_matches_numpy(rng, monkeypatch):
    from sigma_tpu import CSRMatrix
    from sigma_tpu.solvers.amg import greedy_aggregate

    n = 90
    dense = np.triu(rng.random((n, n)) < 0.1, 1)
    dense = (dense | dense.T).astype(float) + np.eye(n)
    A = CSRMatrix.from_dense(dense)
    a1 = greedy_aggregate(A)
    _disable_native(monkeypatch)
    a2 = greedy_aggregate(A)
    assert np.array_equal(a1, a2)


def _rand_csr(rng, n, m, density=0.2):
    from sigma_tpu import CSRMatrix

    k = max(1, int(n * m * density))
    r = rng.integers(0, n, k)
    c = rng.integers(0, m, k)
    v = rng.standard_normal(k)
    return CSRMatrix.from_coo(n, m, r, c, v, dtype=np.float64)


def test_native_spgemm_matches_plan(rng, monkeypatch):
    """One-shot sparse_matmul (compiled Gustavson path) vs the plan path
    (contribution map, exercised with native disabled): same sparsity,
    same values."""
    from sigma_tpu.matrix.algebra import sparse_matmul

    A = _rand_csr(rng, 31, 17)
    B = _rand_csr(rng, 17, 23)
    C1 = sparse_matmul(A, B)
    _disable_native(monkeypatch)
    C2 = sparse_matmul(A, B)
    monkeypatch.undo()
    assert C1.nnz == C2.nnz
    np.testing.assert_allclose(
        np.asarray(C1.to_dense()), np.asarray(C2.to_dense()), atol=1e-12
    )


def test_native_csr_add_matches_plan(rng, monkeypatch):
    from sigma_tpu.matrix.algebra import sparse_add

    A = _rand_csr(rng, 29, 13)
    B = _rand_csr(rng, 29, 13)
    C1 = sparse_add(A, B, alpha=1.5, beta=-0.25)
    _disable_native(monkeypatch)
    C2 = sparse_add(A, B, alpha=1.5, beta=-0.25)
    monkeypatch.undo()
    assert C1.nnz == C2.nnz
    np.testing.assert_allclose(
        np.asarray(C1.to_dense()), np.asarray(C2.to_dense()), atol=1e-12
    )


def test_native_triple_products_match_plan(rng, monkeypatch):
    from sigma_tpu.matrix.algebra import ptap, rart

    A = _rand_csr(rng, 24, 24)
    P = _rand_csr(rng, 24, 6, density=0.3)
    R = _rand_csr(rng, 6, 24, density=0.3)
    G1 = ptap(A, P)
    H1 = rart(A, R)
    _disable_native(monkeypatch)
    G2 = ptap(A, P)
    H2 = rart(A, R)
    monkeypatch.undo()
    np.testing.assert_allclose(
        np.asarray(G1.to_dense()), np.asarray(G2.to_dense()), atol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(H1.to_dense()), np.asarray(H2.to_dense()), atol=1e-12
    )


def test_native_csr_transpose():
    if not native.available():
        pytest.skip("native core unavailable")
    # 3x4: rows sorted CSR; transpose must come out row-sorted too
    indptr = np.array([0, 2, 3, 5], dtype=np.int64)
    cols = np.array([0, 2, 1, 0, 3], dtype=np.int64)
    vals = np.array([1.0, 2.0, 3.0, 4.0, 5.0])
    tptr, tcol, tval = native.csr_transpose(indptr, cols, vals, 4)
    assert np.array_equal(tptr, [0, 2, 3, 4, 5])
    assert np.array_equal(tcol, [0, 2, 1, 0, 2])
    np.testing.assert_allclose(tval, [1.0, 4.0, 3.0, 2.0, 5.0])


def test_from_csr_arrays_trusted_build(rng):
    """CSRMatrix.from_csr_arrays (no re-sort) equals from_coo on the same
    sorted input."""
    from sigma_tpu import CSRMatrix

    A = _rand_csr(rng, 19, 11)
    indptr = np.asarray(A.graph.indptr)
    cols = np.asarray(A.graph.indices)[: A.nnz]
    vals = np.asarray(A.data)[: A.nnz]
    B = CSRMatrix.from_csr_arrays(19, 11, indptr, cols, vals, dtype=A.dtype)
    assert B.nnz == A.nnz
    np.testing.assert_allclose(
        np.asarray(B.to_dense()), np.asarray(A.to_dense()), atol=0
    )


def test_csr_entries_layout(rng):
    """CSRMatrix.entries() fast path: row-major sorted triplets identical to
    the generic (edge_positions) implementation."""
    from sigma_tpu import CSRMatrix
    from sigma_tpu.matrix.base import SparseMatrix

    A = _rand_csr(rng, 21, 15)
    r1, c1, v1 = A.entries()
    r2, c2, v2 = SparseMatrix.entries(A)
    assert np.array_equal(r1, r2) and np.array_equal(c1, c2)
    np.testing.assert_allclose(v1, v2, atol=0)
