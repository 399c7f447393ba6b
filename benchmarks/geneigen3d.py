#!/usr/bin/env python
"""Generalized eigensolve at scale (VERDICT r02 #5): lowest eigenpairs of
the 3-D Q1 FEM pencil K x = mu M x at >= 1M rows on one chip, validated
against the ANALYTIC generalized spectrum.

Recipe: inverse generalized Lanczos on the pencil (M, K) — each step's
B-solve is a structured-GMG-preconditioned CG on the 27-point stiffness
(the at-scale form of ``eigensolver.f90:95-140``'s per-step ``B%solve``) —
then f64 (emulated on TPU) Rayleigh-quotient refinement of the top Ritz
vectors: mu = (v'Kv)/(v'Mv).  The top Ritz values of (M, K) are the
reciprocals of the lowest K x = mu M x eigenvalues.

Exact oracle: the pencil is a tensor (Kronecker) form, so its generalized
spectrum is known in closed form (sigma_tpu.fem.fem3d_generalized_spectrum).

Usage: python benchmarks/geneigen3d.py [--nx 102] [--k 30] [--want 3]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nx", type=int, default=102, help="grid (nx^3 rows)")
    ap.add_argument("--k", type=int, default=30, help="Lanczos steps")
    ap.add_argument("--want", type=int, default=3, help="eigenvalues checked")
    ap.add_argument("--inner-tol", type=float, default=1e-7)
    args = ap.parse_args()

    try:
        from sigma_tpu.utils.util import enable_transparent_hugepages, enable_warm_heap

        enable_transparent_hugepages()
        enable_warm_heap()
    except Exception:
        pass

    import jax

    jax.config.update("jax_enable_x64", True)  # for the f64 refinement
    import jax.numpy as jnp

    from sigma_tpu import DIAMatrix, attach_solver
    from sigma_tpu.eigen import generalized_lanczos
    from sigma_tpu.fem import fem3d_generalized_spectrum, fem3d_stiffness_mass_dia
    from sigma_tpu.graph.graph import DIAGraph
    from sigma_tpu.solvers import cg, structured_pair_amg

    t0 = time.time()
    nx = args.nx
    n, offs, Kd, Md = fem3d_stiffness_mass_dia(nx, dtype=np.float32)
    D = len(offs)

    def mk(data):
        g = DIAGraph(
            offsets=offs, shape=(n, n), nnz=int(np.count_nonzero(data))
        )
        return DIAMatrix(
            graph=g, data=jnp.asarray(data.reshape(D, -1, 128), jnp.float32)
        )

    K, M = mk(Kd), mk(Md)
    print(f"# {nx}^3 = {n} rows, 27-pt pencil  [build {time.time()-t0:.1f}s]",
          file=sys.stderr)

    t1 = time.time()
    Mg = structured_pair_amg(K, (nx, nx, nx), coarse_size=4096)
    # rtol, not tol: the mass-matrix action scales like h^3 (~1e-6 per
    # entry at nx~100), so an absolute inner tolerance would either stop
    # CG at ~1% relative accuracy (garbage Ritz values) or never
    Ks = attach_solver(
        K, cg(tolerance=0.0, rtol=args.inner_tol), preconditioner=Mg
    )
    print(f"# gmg setup {time.time()-t1:.1f}s, levels={len(Mg.levels)}",
          file=sys.stderr)

    # inverse generalized Lanczos: pencil (M, K), B = K solved by GMG-CG
    rng = np.random.default_rng(0)
    v0 = rng.standard_normal(n).astype(np.float32)
    t1 = time.time()
    res = jax.jit(
        lambda M, Ks: generalized_lanczos(M, Ks, args.k, v0=v0)
    )(M, Ks)
    res.V.block_until_ready()
    t_lanczos = time.time() - t1

    T = np.asarray(res.tridiagonal())
    theta, Q = np.linalg.eigh(T)
    order = np.argsort(theta)[::-1][: args.want]

    # f64 Rayleigh-quotient refinement of the top Ritz vectors:
    # mu = (v'Kv)/(v'Mv) with K, M applied in emulated f64
    V = res.V  # (n, k) f32 on device
    K64 = DIAMatrix(graph=K.graph, data=K.data.astype(jnp.float64))
    M64 = DIAMatrix(graph=M.graph, data=M.data.astype(jnp.float64))

    # matrices passed as ARGUMENTS, never closed over: a closed-over
    # device array lands in the remote-compile request body (HTTP 413,
    # CLAUDE.md)
    @jax.jit
    def rayleigh(K64, M64, v):
        v = v.astype(jnp.float64)
        return jnp.vdot(v, K64.matvec(v)) / jnp.vdot(v, M64.matvec(v))

    mu_exact = fem3d_generalized_spectrum(nx, args.want)
    rows = []
    for rank, j in enumerate(order):
        v = V @ jnp.asarray(Q[:, j], jnp.float32)
        mu_f32 = 1.0 / float(theta[j])
        mu_f64 = float(rayleigh(K64, M64, v))
        rows.append((mu_f32, mu_f64))
    mu_f64s = np.sort([r[1] for r in rows])
    mu_f32s = np.sort([1.0 / float(theta[j]) for j in order])
    rel_f32 = np.abs(mu_f32s - mu_exact) / mu_exact
    rel_f64 = np.abs(mu_f64s - mu_exact) / mu_exact
    print(json.dumps({
        "metric": "generalized_eigensolve_fem3d",
        "n": n,
        "pencil": "Q1 stiffness/mass (27-pt), inverse Lanczos (M,K), "
        "K solved by structured-GMG-CG",
        "lanczos_steps": args.k,
        "wall_s_lanczos": round(t_lanczos, 1),
        "mu_exact": [f"{v:.8e}" for v in mu_exact],
        "mu_ritz_f32": [f"{v:.8e}" for v in mu_f32s],
        "mu_refined_f64": [f"{v:.8e}" for v in mu_f64s],
        "rel_err_f32": [f"{v:.2e}" for v in rel_f32],
        "rel_err_refined": [f"{v:.2e}" for v in rel_f64],
        "note": "a single-vector Krylov space carries limited copies of "
        "a multiple eigenvalue; with --want past the distinct count the "
        "tail rows compare the NEXT captured Ritz value against another "
        "copy (use block methods for full multiplicity)",
    }))


if __name__ == "__main__":
    main()
