"""Reordering algorithms (mirrors the role of permutations.f90 in tests)."""

import numpy as np
import pytest

from sigma_tpu.graph import (
    GraphBuilder,
    breadth_first_search,
    build_graph,
    greedy_color_ordering,
    greedy_coloring,
)


def path_graph(n):
    b = GraphBuilder(n)
    for i in range(n - 1):
        b.add_edge(i, i + 1)
        b.add_edge(i + 1, i)
    for i in range(n):
        b.add_edge(i, i)
    return build_graph(b, "csr")


def random_sym_graph(rng, n, p=0.1):
    d = (rng.random((n, n)) < p).astype(np.int64)
    d = ((d + d.T) > 0).astype(np.int64)
    np.fill_diagonal(d, 1)
    return build_graph(GraphBuilder.from_dense(d), "csr"), d


def test_bfs_is_permutation(rng):
    g, _ = random_sym_graph(rng, 50)
    p = breadth_first_search(g)
    assert np.array_equal(np.sort(p), np.arange(50))


def test_bfs_path_graph_identity():
    # BFS from 0 on a path graph visits in order
    g = path_graph(10)
    p = breadth_first_search(g)
    np.testing.assert_array_equal(p, np.arange(10))


def test_bfs_disconnected():
    b = GraphBuilder(6)
    b.add_edge(0, 1); b.add_edge(1, 0)
    b.add_edge(4, 5); b.add_edge(5, 4)
    p = breadth_first_search(build_graph(b, "csr"))
    assert np.array_equal(np.sort(p), np.arange(6))


def test_greedy_coloring_proper(rng):
    g, dense = random_sym_graph(rng, 60, p=0.08)
    colors, nc = greedy_coloring(g)
    assert nc >= 1
    i, j = np.nonzero(dense)
    off = i != j
    assert (colors[i[off]] != colors[j[off]]).all()
    # greedy bound: nc <= max_degree + 1
    assert nc <= dense.sum(axis=1).max() + 1


def test_color_ordering_blocks(rng):
    g, dense = random_sym_graph(rng, 60, p=0.08)
    p, ptr = greedy_color_ordering(g)
    assert np.array_equal(np.sort(p), np.arange(60))
    colors, nc = greedy_coloring(g)
    assert ptr.size == nc + 1 and ptr[-1] == 60
    # vertices in new-index block [ptr[c], ptr[c+1]) all share color c
    inv = np.empty_like(p)
    inv[p] = np.arange(60)  # new -> old
    for c in range(nc):
        assert (colors[inv[ptr[c] : ptr[c + 1]]] == c).all()


def test_reverse_cuthill_mckee_is_permutation_and_tightens_band(rng):
    """RCM returns a valid scatter permutation whose bandwidth is no worse
    than natural order, and the native/numpy paths agree exactly."""
    import sigma_tpu.native as native_mod
    from sigma_tpu.graph import reverse_cuthill_mckee
    from sigma_tpu import CSRMatrix

    n = 120
    k = 700
    r = rng.integers(0, n, k)
    c = rng.integers(0, n, k)
    rows = np.concatenate([r, c, np.arange(n)])
    cols = np.concatenate([c, r, np.arange(n)])
    A = CSRMatrix.from_coo(n, n, rows, cols, np.ones(rows.size))

    p = reverse_cuthill_mckee(A.graph)
    assert sorted(p.tolist()) == list(range(n))
    rr, cc, _ = A.entries()
    assert np.abs(p[rr] - p[cc]).max() <= np.abs(rr - cc).max()

    lib, tried = native_mod._lib, native_mod._tried
    native_mod._lib, native_mod._tried = None, True
    try:
        p_np = reverse_cuthill_mckee(A.graph)
    finally:
        native_mod._lib, native_mod._tried = lib, tried
    assert np.array_equal(p, p_np)


def test_banded_dia_rcm_roundtrip(rng):
    """to_banded_dia with the default RCM ordering preserves every entry:
    D[p[i], p[j]] == A[i, j]."""
    from sigma_tpu import CSRMatrix
    from sigma_tpu.matrix.banded import to_banded_dia

    n = 80
    r = rng.integers(0, n, 300)
    c = rng.integers(0, n, 300)
    rows = np.concatenate([r, c, np.arange(n)])
    cols = np.concatenate([c, r, np.arange(n)])
    vals = rng.standard_normal(rows.size)
    A = CSRMatrix.from_coo(n, n, rows, cols, vals)
    D, p = to_banded_dia(A)
    dd = np.asarray(D.to_dense())
    rr, cc, vv = A.entries()
    np.testing.assert_allclose(dd[p[rr], p[cc]], vv, atol=1e-13)
