#!/usr/bin/env python
"""Bandwidth reduction by BFS (Cuthill-McKee-style) reordering (after
graph_example_3.f90's permutation theme; permutations.f90:22)."""

import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
import _common  # noqa: F401

import numpy as np

from sigma_tpu import breadth_first_search
from sigma_tpu.apps import watts_strogatz


def bandwidth(g):
    rows, cols = g.edges_numpy()
    return int(np.abs(rows - cols).max()) if rows.size else 0


def main():
    rng = np.random.default_rng(1)
    g = watts_strogatz(256, 3, 0.05, rng)
    print("original bandwidth:", bandwidth(g))
    p = breadth_first_search(g)
    h = g.permute_rows(p).permute_cols(p)
    print("BFS-reordered bandwidth:", bandwidth(h))


if __name__ == "__main__":
    main()
