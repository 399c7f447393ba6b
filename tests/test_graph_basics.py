"""Graph interface contract vs a dense mirror, swept over every format.

Mirrors /root/reference/test/graph_test_basics.f90: build a random
Erdős–Rényi graph, maintain a dense 0/1 mirror, and check degree /
neighbors / connectivity / edge export / permutation / mutation round-trips
for each storage format via the factory sweep (num_graph_types).
"""

import numpy as np
import pytest

from sigma_tpu.graph import (
    GraphBuilder,
    build_graph,
    choose_graph_type,
    convert_graph,
    num_graph_types,
)


def er_graph(rng, n, m=None, p=None):
    m = n if m is None else m
    p = np.log2(n) / n if p is None else p  # same density as the reference tests
    dense = (rng.random((n, m)) < p).astype(np.int64)
    b = GraphBuilder.from_dense(dense)
    return b, dense


ALL_FORMATS = list(range(1, num_graph_types + 1))


def test_builder_mutation(rng):
    n = 32
    b = GraphBuilder(n)
    dense = np.zeros((n, n), dtype=np.int64)
    for _ in range(200):
        i, j = rng.integers(0, n, size=2)
        b.add_edge(i, j)
        dense[i, j] = 1
    # deletions
    rows, cols = np.nonzero(dense)
    for k in rng.choice(rows.size, size=20, replace=False):
        b.delete_edge(rows[k], cols[k])
        dense[rows[k], cols[k]] = 0
    assert b.num_edges == dense.sum()
    np.testing.assert_array_equal(b.to_dense(), dense)
    for i in range(n):
        assert b.degree(i) == dense[i].sum()
        np.testing.assert_array_equal(np.sort(b.neighbors(i)), np.nonzero(dense[i])[0])
    i, j = np.nonzero(dense)
    assert b.has_edge(i[0], j[0])
    zi, zj = np.nonzero(1 - dense)
    assert not b.has_edge(zi[0], zj[0])


@pytest.mark.parametrize("frmt", ALL_FORMATS)
def test_graph_queries_vs_dense(frmt, rng):
    n, m = 48, 64
    b, dense = er_graph(rng, n, m, p=0.1)
    g = build_graph(b, frmt)
    assert g.shape == (n, m)
    assert g.num_edges == dense.sum()
    np.testing.assert_array_equal(g.to_dense(), dense)
    np.testing.assert_array_equal(g.degrees_numpy(), dense.sum(axis=1))
    assert g.max_degree == dense.sum(axis=1).max()
    for i in range(0, n, 7):
        np.testing.assert_array_equal(np.sort(g.neighbors(i)), np.nonzero(dense[i])[0])
    rows, cols = g.edges_numpy()
    mirror = np.zeros_like(dense)
    mirror[rows, cols] = 1
    np.testing.assert_array_equal(mirror, dense)
    # connectivity probes
    ei, ej = np.nonzero(dense)
    zi, zj = np.nonzero(1 - dense)
    for k in range(0, ei.size, max(ei.size // 10, 1)):
        assert g.has_edge(ei[k], ej[k])
    for k in range(0, zi.size, max(zi.size // 10, 1)):
        assert not g.has_edge(zi[k], zj[k])


@pytest.mark.parametrize("frmt", ALL_FORMATS)
def test_edge_positions(frmt, rng):
    n = 40
    b, dense = er_graph(rng, n, p=0.15)
    g = build_graph(b, frmt)
    ei, ej = np.nonzero(dense)
    pos = g.edge_positions(ei, ej)
    assert (pos >= 0).all()
    # positions must be unique (each edge owns one value slot)
    assert np.unique(pos).size == pos.size
    zi, zj = np.nonzero(1 - dense)
    assert (g.edge_positions(zi, zj) == -1).all()


@pytest.mark.parametrize("frmt", ALL_FORMATS)
def test_permute(frmt, rng):
    n, m = 32, 24
    b, dense = er_graph(rng, n, m, p=0.15)
    g = build_graph(b, frmt)
    p = rng.permutation(n)
    q = rng.permutation(m)
    gl = g.permute_rows(p)
    mirror = np.zeros_like(dense)
    mirror[p, :] = dense  # new[p[i], j] == old[i, j]
    np.testing.assert_array_equal(gl.to_dense(), mirror)
    gr = g.permute_cols(q)
    mirror = np.zeros_like(dense)
    mirror[:, q] = dense
    np.testing.assert_array_equal(gr.to_dense(), mirror)


@pytest.mark.parametrize("frmt", ALL_FORMATS)
def test_transpose(frmt, rng):
    n, m = 32, 24
    b, dense = er_graph(rng, n, m, p=0.15)
    g = build_graph(b, frmt)
    np.testing.assert_array_equal(g.transpose().to_dense(), dense.T)


@pytest.mark.parametrize("frmt", ALL_FORMATS)
def test_mutation_via_builder_roundtrip(frmt, rng):
    """add_edge/delete_edge on frozen formats = thaw, mutate, re-freeze
    (the reference's compressed formats also fully rebuild on mutation,
    cs_graphs.f90:400-494)."""
    n = 24
    b, dense = er_graph(rng, n, p=0.2)
    g = build_graph(b, frmt)
    b2 = GraphBuilder.from_graph(g)
    b2.add_edge(0, n - 1)
    dense[0, n - 1] = 1
    ei, ej = np.nonzero(dense)
    b2.delete_edge(ei[-1], ej[-1])
    dense[ei[-1], ej[-1]] = 0
    g2 = build_graph(b2, frmt)
    np.testing.assert_array_equal(g2.to_dense(), dense)


def test_empty_and_isolated_rows():
    # the reference's ellpack breaks on isolated vertices (README.md:71-73);
    # ours must not.
    n = 8
    b = GraphBuilder(n)
    b.add_edge(2, 3)
    b.add_edge(5, 1)
    for frmt in ALL_FORMATS:
        g = build_graph(b, frmt)
        assert g.num_edges == 2
        assert g.degree(0) == 0
        assert g.neighbors(0).size == 0
        d = np.zeros((n, n), dtype=np.int64)
        d[2, 3] = d[5, 1] = 1
        np.testing.assert_array_equal(g.to_dense(), d)


def test_factory_names():
    assert choose_graph_type("csr") is choose_graph_type(2)
    assert choose_graph_type("ellpack") is choose_graph_type("ell")
    with pytest.raises(ValueError):
        choose_graph_type("nope")
    with pytest.raises(ValueError):
        choose_graph_type(99)


@pytest.mark.parametrize("src", ALL_FORMATS)
@pytest.mark.parametrize("dst", ALL_FORMATS)
def test_copy_all_format_pairs(src, dst, rng):
    """Mirrors graph_test_copy.f90: conversion between every format pair
    preserves the edge set exactly."""
    b, dense = er_graph(rng, 40, p=0.12)
    g1 = build_graph(b, src)
    g2 = convert_graph(g1, dst)
    np.testing.assert_array_equal(g2.to_dense(), dense)


def test_edge_positions_out_of_range_no_alias(rng):
    """Out-of-range queries must not alias another entry through the
    linearized key (review regression: (0,5) aliased (1,1) for m=4)."""
    from sigma_tpu import CSRMatrix, CSCMatrix, COOMatrix

    for cls in (CSRMatrix, CSCMatrix, COOMatrix):
        A = cls.from_coo(2, 4, [0, 1], [1, 1], [7.0, 9.0])
        assert A.get_values([0], [5])[0] == 0.0
        assert A.get_values([-1], [1])[0] == 0.0
        assert A.get_values([2], [1])[0] == 0.0


def test_edge_positions_empty_graph():
    """Empty graphs must answer queries (and support fill-in) instead of
    crashing (review regression)."""
    from sigma_tpu import BSRMatrix, CSRMatrix
    from sigma_tpu.graph import BSRGraph, CSRGraph

    g = CSRGraph.from_coo(3, 3, [], [])
    assert not g.has_edge(0, 0)
    A = CSRMatrix.from_graph(g).set_values([0], [0], [3.0])
    assert A.get_value(0, 0) == 3.0
    gb = BSRGraph.from_coo(8, 8, [], [], block_shape=(4, 4))
    assert (gb.edge_positions([1], [1]) == -1).all()


def test_greedy_coloring_directed_sparsity():
    """Coloring symmetrizes the stored pattern: a one-directional edge must
    still separate its endpoints (review regression; multicolor-ILDU on
    triangular factors depends on this)."""
    from sigma_tpu import greedy_coloring
    from sigma_tpu.graph import CSRGraph

    colors, nc = greedy_coloring(CSRGraph.from_coo(2, 2, [0], [1]))
    assert colors[0] != colors[1]
