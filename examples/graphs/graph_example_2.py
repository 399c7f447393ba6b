#!/usr/bin/env python
"""Format conversion and whole-array edge export (after
graph_example_2.f90's iterator/conversion theme).

The reference iterates cursors in batches of 64; here the iterator protocol
is a single vectorized edges_numpy() export, identical across formats.
"""

import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
import _common  # noqa: F401

import numpy as np

from sigma_tpu import convert_graph
from sigma_tpu.apps import torus


def main():
    g = torus(8, 8, frmt="csr")
    print("csr:", g)
    r1, c1 = g.edges_numpy()
    key1 = np.sort(r1 * g.shape[1] + c1)
    for frmt in ("coo", "ell", "csc", "bsr"):
        h = convert_graph(g, frmt)
        r2, c2 = h.edges_numpy()
        same = np.array_equal(key1, np.sort(r2 * h.shape[1] + c2))
        print(f"{frmt}: {h} edges-preserved={same}")


if __name__ == "__main__":
    main()
