#!/usr/bin/env python
"""North-star benchmark: CG on a 10M-row 3-D Laplacian, one chip.

BASELINE.json's headline config (there scoped to a 2-host v5e slice; here
the single-chip measurement the driver's hardware can support — the
multi-chip path is validated functionally on the virtual CPU mesh by
tests/test_parallel.py and __graft_entry__.dryrun_multichip).

Prints one JSON line per measurement:
  - spmv_gnnz_s: DIA SpMV throughput at 10M rows
  - spmm_gnnz_s: multi-vector (8-wide) SpMM effective throughput
  - cg: iterations + relative residual of a jitted CG solve (f32)
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def laplacian_3d_coo_padded_strides(nx, stride):
    """7-point Laplacian + I on an nx^3 grid embedded with padded index
    strides (1, stride, stride^2), so the DIA offsets (+-1, +-stride,
    +-stride^2) are multiples of the 128-lane width when ``stride`` is.

    Measured outcome (BENCHMARKS.md): alignment padding did NOT recover the
    large-n throughput cliff (the bottleneck is per-diagonal x re-reads
    once x exceeds VMEM, not lane alignment) — 10.1 vs 14.8 Gnnz/s at
    nx=216.  Kept as an option for studying layout effects; default off.
    """
    n_pad = ((nx - 1) * stride + (nx - 1)) * stride + nx  # last index + 1
    i = np.arange(nx, dtype=np.int64)
    idx = (i[:, None, None] * stride + i[None, :, None]) * stride + i[None, None, :]
    rows = [idx.ravel()]
    cols = [idx.ravel()]
    vals = [np.full(idx.size, 7.0)]
    for axis in range(3):
        for shift in (1, -1):
            sl_src = [slice(None)] * 3
            sl_dst = [slice(None)] * 3
            if shift == 1:
                sl_src[axis] = slice(0, nx - 1)
                sl_dst[axis] = slice(1, nx)
            else:
                sl_src[axis] = slice(1, nx)
                sl_dst[axis] = slice(0, nx - 1)
            src = idx[tuple(sl_src)].ravel()
            dst = idx[tuple(sl_dst)].ravel()
            rows.append(src)
            cols.append(dst)
            vals.append(np.full(src.size, -1.0))
    return (
        int(n_pad),
        np.concatenate(rows),
        np.concatenate(cols),
        np.concatenate(vals),
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nx", type=int, default=216, help="grid size (nx^3 rows)")
    ap.add_argument("--iters", type=int, default=100, help="CG iterations")
    ap.add_argument("--nrhs", type=int, default=8)
    ap.add_argument(
        "--pad-strides", type=int, default=0,
        help="pad grid index strides to this (0 = natural strides; padding "
        "measured slower at 10M rows, see BENCHMARKS.md)",
    )
    ap.add_argument(
        "--symmetric", action="store_true",
        help="use SymmetricDIAMatrix (upper diagonals only, ~7.5n vs ~10n "
        "words/SpMV — the fastest path)",
    )
    ap.add_argument(
        "--fused", action="store_true",
        help="use Chronopoulos-Gear fused CG (one reduction point + one "
        "fused update block per iteration)",
    )
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax

    from bench import laplacian_3d_coo, timeit_loop
    from sigma_tpu import DIAMatrix
    from sigma_tpu.solvers import cg_fused_solve, cg_solve

    nx = args.nx
    if args.pad_strides and args.pad_strides > nx:
        n, r, c, v = laplacian_3d_coo_padded_strides(nx, args.pad_strides)
    else:
        n, r, c, v = laplacian_3d_coo(nx)
    nnz = r.size
    print(
        f"# {nx}^3 grid = {nx**3} true rows (embedded n={n}), {nnz} nnz",
        file=sys.stderr,
    )

    A = DIAMatrix.from_coo(n, n, r, c, v, dtype=jnp.float32)
    if args.symmetric:
        from sigma_tpu.matrix.symmetric import SymmetricDIAMatrix

        A = SymmetricDIAMatrix.from_dia(A)
    x = jnp.ones((n,), jnp.float32)

    # SpMV throughput
    def mk(K):
        @jax.jit
        def f(A, x):
            def body(i, vv):
                return A.matvec(vv) * jnp.asarray(0.1, vv.dtype)

            return lax.fori_loop(0, K, body, x)

        return f

    t = timeit_loop(mk, A, x, K1=20, K2=100)
    spmv_val = round(nnz / t / 1e9, 2) if t > 1e-9 else None
    print(json.dumps({"metric": "spmv_gnnz_s", "value": spmv_val, "n": n}))

    # multi-vector SpMM (the capability the reference lacks, README.md:83).
    # Production block solvers keep their panels RESIDENT in the
    # interleaved sublane layout (panels folded into sublanes so every
    # grid step moves contiguous blocks — benchmarks/spmm_probe4.py
    # measured panel-separate layouts 2.3x slower from DMA chunking);
    # this loop measures that form when the kernel engages.
    interleaved = getattr(A, "interleaved_profitable", lambda k: False)(
        args.nrhs
    )
    if interleaved:
        from sigma_tpu.ops.spmv_pallas import interleave_panels

        X = interleave_panels(jnp.ones((args.nrhs, n), jnp.float32), n)
        apply = lambda A, V: A.matmat_interleaved(V)
    else:
        X = jnp.ones((n, args.nrhs), jnp.float32)
        apply = lambda A, V: A.matmat(V)

    def mkm(K):
        @jax.jit
        def f(A, X):
            def body(i, V):
                return apply(A, V) * jnp.asarray(0.1, V.dtype)

            return lax.fori_loop(0, K, body, X)

        return f

    t = timeit_loop(mkm, A, X, K1=5, K2=25)
    # a slope at the clamp floor means the workload is smaller than launch
    # jitter (tiny --nx smoke runs): report null rather than a fiction
    spmm_val = round(args.nrhs * nnz / t / 1e9, 2) if t > 1e-9 else None
    print(json.dumps({
        "metric": "spmm_gnnz_s",
        "value": spmm_val,
        "nrhs": args.nrhs,
        "layout": "interleaved" if interleaved else "cols",
    }))

    # CG solve: manufactured RHS, fixed iteration budget, f32
    xstar = jnp.asarray(
        np.sin(np.arange(n, dtype=np.float32) * 0.001), dtype=jnp.float32
    )
    b = A.matvec(xstar)
    solve = jax.jit(
        lambda A, b: (cg_fused_solve if args.fused else cg_solve)(
            A, b, tol=0.0, rtol=1e-6, maxiter=args.iters
        )
    )
    t0 = time.perf_counter()
    xs, info = solve(A, b)
    resn = float(info.residual_norm)  # sync
    t_cold = time.perf_counter() - t0
    t0 = time.perf_counter()
    xs, info = solve(A, b)
    resn = float(info.residual_norm)
    t_warm = time.perf_counter() - t0
    iters = int(info.iterations)
    rel = resn / float(jnp.linalg.norm(b))
    print(json.dumps({
        "metric": "cg_10m",
        "iterations": iters,
        "relative_residual": f"{rel:.3e}",
        "wall_s_incl_compile": round(t_cold, 2),
        "wall_s_warm": round(t_warm, 2),
        "s_per_iteration": round(t_warm / max(iters, 1), 4),
    }))


if __name__ == "__main__":
    main()
