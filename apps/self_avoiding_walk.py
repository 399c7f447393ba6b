#!/usr/bin/env python
"""Self-avoiding walk driver (CLI-compatible with
/root/reference/apps/self_avoiding_walk.f90).

Flags: --graph/-g, --n, --k, --p, --iter/-i (number of walks), --verbose/-v.
Prints the histogram of walk lengths.
"""

import argparse
import os
import sys

# runnable from anywhere: the package lives one directory up
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--graph", "-g", default="torus")
    ap.add_argument("--n", "-n", type=int, default=32)
    ap.add_argument("--k", "-k", type=int, default=4)
    ap.add_argument("--p", "-p", type=float, default=0.25)
    ap.add_argument("--iter", "-i", type=int, default=10000)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--verbose", "-v", action="store_true")
    args = ap.parse_args()

    from sigma_tpu.apps import named_graph, self_avoiding_walks

    rng = np.random.default_rng(args.seed)
    g = named_graph(args.graph, args.n, args.k, args.p, rng, frmt="ell")
    if args.verbose:
        print(f"graph: {args.graph}, {g.shape[0]} vertices, {g.nnz} edges")

    res = self_avoiding_walks(g, walkers=args.iter, seed=args.seed)
    lengths = np.asarray(res.lengths)
    print(f"walks: {args.iter}  mean length: {lengths.mean():.2f}  "
          f"max: {lengths.max()}")
    nz = np.nonzero(res.histogram)[0]
    for l in nz:
        print(l, int(res.histogram[l]))


if __name__ == "__main__":
    main()
