"""Apps tests: generators, multicolor Ising, batched self-avoiding walks.

Generator structure is pinned by exact degree/regularity invariants of the
families in ``/root/reference/apps/regular_graphs.f90`` /
``random_graphs.f90``; the physics apps are checked for dynamical
invariants (spin values, magnetization bounds, self-avoidance).
"""

import numpy as np
import pytest

from sigma_tpu.apps import (
    barabasi_albert,
    erdos_renyi,
    flower_snark,
    hypercube,
    ising_metropolis,
    named_graph,
    petersen,
    self_avoiding_walks,
    torus,
    watts_strogatz,
)


def degrees(g):
    return g.degrees_numpy()


def test_torus_regular():
    g = torus(6, 5)
    assert g.shape == (30, 30)
    assert (degrees(g) == 4).all()  # 4-regular
    # symmetric
    r, c = g.edges_numpy()
    s = set(zip(r.tolist(), c.tolist()))
    assert all((b, a) in s for a, b in s)


def test_petersen():
    g = petersen(5, 2)  # the Petersen graph
    assert g.shape == (10, 10)
    assert (degrees(g) == 3).all()
    assert g.num_edges == 30  # 15 undirected edges


def test_flower_snark():
    g = flower_snark(5)
    assert g.shape == (20, 20)
    d = degrees(g)
    # centers have degree 3; leaves have 3 (star + cycle/path links)
    assert (d == 3).all()


def test_hypercube():
    g = hypercube(4)
    assert g.shape == (16, 16)
    assert (degrees(g) == 4).all()
    r, c = g.edges_numpy()
    # every edge differs in exactly one bit
    assert (np.vectorize(lambda a, b: bin(a ^ b).count("1"))(r, c) == 1).all()


def test_erdos_renyi(rng):
    g = erdos_renyi(200, 0.05, rng)
    d = degrees(g)
    assert 5 < d.mean() < 15  # expect ~10
    r, c = g.edges_numpy()
    assert (r != c).all()


def test_watts_strogatz(rng):
    g = watts_strogatz(100, 3, 0.2, rng)
    assert g.shape == (100, 100)
    r, c = g.edges_numpy()
    s = set(zip(r.tolist(), c.tolist()))
    assert all((b, a) in s for a, b in s)
    assert (r != c).all()


def test_barabasi_albert(rng):
    g = barabasi_albert(150, 3, rng)
    d = degrees(g)
    assert d.max() > d.mean() * 2  # heavy tail


def test_named_graph_dispatch(rng):
    assert named_graph("torus", 4, 4).shape == (16, 16)
    assert named_graph("er", 50, 5, rng=rng).shape == (50, 50)
    with pytest.raises(ValueError):
        named_graph("nonsense", 4, 4)


def test_ising_cold_ordered():
    """At very low temperature (high beta) a cold start stays magnetized."""
    g = torus(8, 8)
    res = ising_metropolis(g, beta=2.0, sweeps=30, seed=0)
    s = np.asarray(res.spins)
    assert set(np.unique(s)) <= {-1.0, 1.0}
    assert abs(float(res.magnetization[-1])) > 0.8
    assert res.num_colors >= 2


def test_ising_hot_disordered():
    """At beta ~ 0 the model is a fair coin: |m| small."""
    g = torus(16, 16)
    res = ising_metropolis(g, beta=0.01, sweeps=50, seed=1, hot_start=True)
    assert abs(float(res.magnetization[-1])) < 0.3


def test_ising_magnetization_range():
    g = torus(6, 6)
    res = ising_metropolis(g, beta=0.5, sweeps=10, seed=2)
    m = np.asarray(res.magnetization)
    assert (m >= -1).all() and (m <= 1).all()
    assert m.shape == (10,)


def test_saw_lengths_valid():
    g = torus(8, 8)
    res = self_avoiding_walks(g, walkers=500, seed=0)
    lengths = np.asarray(res.lengths)
    assert (lengths >= 1).all()  # torus: every start has unvisited neighbors
    assert (lengths <= 63).all()  # can't exceed n-1 steps
    assert res.histogram.sum() == 500


def test_saw_line_graph():
    """On a path graph, a walk from an end must sweep the whole path."""
    from sigma_tpu.graph import CSRGraph

    n = 10
    rows = np.arange(n - 1)
    cols = rows + 1
    g = CSRGraph.from_coo(
        n, n, np.concatenate([rows, cols]), np.concatenate([cols, rows])
    )
    res = self_avoiding_walks(g, walkers=300, seed=3)
    lengths = np.asarray(res.lengths)
    # from interior: walk goes to one end (possibly short); max = n-1
    assert lengths.max() == n - 1
    assert (lengths >= 1).all()


def test_watts_strogatz_saturated_terminates(rng):
    """k >= n-1 (complete ring) must terminate, keeping edges when no
    rewiring target exists (review regression: unbounded retry hang)."""
    g = watts_strogatz(5, 4, 1.0, rng)
    assert g.shape == (5, 5)
    r, c = g.edges_numpy()
    assert (r != c).all()  # still simple


def test_erdos_renyi_large_n_sparse_path(rng):
    # review regression: large n used a dense O(n^2) random matrix;
    # the sparse sampler must match the G(n, p) distribution shape
    from sigma_tpu.apps import erdos_renyi

    n, p = 10000, 2e-4
    G = erdos_renyi(n, p, rng=rng)
    rows, cols = G.edges_numpy()
    assert (rows != cols).all()
    assert rows.max() < n and cols.max() < n and rows.min() >= 0
    # symmetric
    k1 = rows * n + cols
    k2 = cols * n + rows
    assert np.array_equal(np.sort(k1), np.sort(k2))
    # edge count within 5 sigma of Binomial(C(n,2), p)
    mean = p * n * (n - 1) / 2
    sd = np.sqrt(mean * (1 - p))
    assert abs(G.nnz / 2 - mean) < 5 * sd + 1
