#!/usr/bin/env python
"""Ising model driver (CLI-compatible with /root/reference/apps/ising.f90).

Flags: --graph/-g family, --n, --k, --p, --beta/-b, --sweeps, --verbose/-v.
Prints sweep index + running magnetization like the reference (:160-166).
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
    ap.add_argument("--beta", "-b", type=float, default=1.0)
    ap.add_argument("--sweeps", "-i", type=int, default=100)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--verbose", "-v", action="store_true")
    args = ap.parse_args()

    from sigma_tpu.apps import ising_metropolis, named_graph

    rng = np.random.default_rng(args.seed)
    g = named_graph(args.graph, args.n, args.k, args.p, rng, frmt="ell")
    if args.verbose:
        print(f"graph: {args.graph}, {g.shape[0]} vertices, {g.nnz} edges")

    res = ising_metropolis(g, beta=args.beta, sweeps=args.sweeps, seed=args.seed)
    if args.verbose:
        print(f"multicolor sweep: {res.num_colors} colors")
    mags = np.asarray(res.magnetization)
    stride = max(1, args.sweeps // 20)
    for s in range(0, args.sweeps, stride):
        print(s + 1, float(mags[s]))
    print(f"final magnetization: {float(mags[-1]):.6f}")


if __name__ == "__main__":
    main()
