#!/usr/bin/env python
"""Graph basics: build, connectivity, degrees (after
/root/reference/examples/graphs/graph_example_1.f90).

Constructs an Erdos-Renyi random graph with the mutable builder, freezes
it, and estimates the connection probability from degree statistics.
"""

import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
import _common  # noqa: F401

import numpy as np

from sigma_tpu import GraphBuilder, build_graph


def main():
    rng = np.random.default_rng(0)
    n, p = 512, 0.02

    # mutable stage: add edges one batch at a time (ll_graph idiom)
    b = GraphBuilder(n)
    mask = np.triu(rng.random((n, n)) < p, 1)
    rows, cols = np.nonzero(mask | mask.T)
    b.add_edges(rows, cols)

    # queries on the builder
    print("connected(0, 1):", b.has_edge(0, 1))
    print("degree(0):", b.degree(0))

    # freeze into a compute format
    g = build_graph(b, "csr")
    d = g.degrees_numpy()
    est = d.mean() / (n - 1)
    print(f"edges: {g.num_edges}  max degree: {g.max_degree}")
    print(f"estimated p: {est:.4f} (true {p})")


if __name__ == "__main__":
    main()
