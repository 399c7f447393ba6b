"""Mixed-precision iterative refinement: f64 accuracy at f32 speed.

TPUs have no fast native float64 (x64 is software-emulated, and the fast
SpMV kernels here are f32/bf16), yet the reference's test problems pin
1e-14 tolerances.  Classic iterative refinement closes the gap the
TPU-native way:

    repeat:  r = b - A x          (working precision — the matrix dtype)
             solve  A_lo d = r    (low-precision inner Krylov, fast kernels)
             x = x + d

Each outer sweep contracts the error by roughly the inner solve's
relative accuracy (~1e-6 for a well-converged f32 CG), so a handful of
outer iterations reach working-precision residuals while ~all matvecs run
through the low-precision kernels.  The residual computation is the only
working-precision work per sweep — one SpMV and an axpy.

No reference analogue (the reference is all-double); this is the
precision discipline SURVEY §7 names among the hard parts
("bit-tolerance-equal convergence ... dtype discipline"), packaged.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from sigma_tpu.solvers.krylov import SolveInfo, cg_solve

__all__ = ["refined_solve"]


def refined_solve(
    A,
    b,
    *,
    tol: float = 1e-12,
    rtol: float = 0.0,
    max_outer: int = 20,
    inner_dtype=jnp.float32,
    inner_solve=None,
    inner_tol: float = 1e-6,
    inner_maxiter: int = 400,
    M_lo=None,
):
    """Solve A x = b to working-precision ``tol`` with low-precision inner
    solves.

    ``A`` must provide ``matvec`` in working precision and ``astype`` (any
    SparseMatrix) — or pass a ready low-precision operator/solver pair via
    ``inner_solve(r_lo) -> d_lo``.  The outer loop runs host-side (a few
    iterations; each dispatches jitted device work).

    Returns ``(x, SolveInfo)`` where ``info.iterations`` counts OUTER
    refinement sweeps.
    """
    work_dtype = b.dtype
    if inner_solve is None:
        import jax

        A_lo = A.astype(inner_dtype)
        # jit the inner solve with the operator/preconditioner as PYTREE
        # ARGUMENTS: an eager Krylov call pays ~25 ms tunnel dispatch per
        # op outside its while_loop (measured 4.6 s eager vs 0.18 s
        # jitted for one 10M-row solve, BENCHMARKS.md), and closing over
        # large device arrays oversizes the remote compile request
        if M_lo is None:
            _inner = jax.jit(
                lambda A, r: cg_solve(
                    A, r, tol=0.0, rtol=inner_tol, maxiter=inner_maxiter
                )[0]
            )
            inner_solve = lambda r_lo: _inner(A_lo, r_lo)
        else:
            _inner = jax.jit(
                lambda A, r, M: cg_solve(
                    A, r, tol=0.0, rtol=inner_tol, maxiter=inner_maxiter,
                    M=M,
                )[0]
            )
            inner_solve = lambda r_lo: _inner(A_lo, r_lo, M_lo)

    x = jnp.zeros_like(b)
    bn = float(jnp.linalg.norm(b))
    tol_eff = max(tol, rtol * bn)
    resn = bn
    k = 0
    for k in range(1, max_outer + 1):
        r = b - A.matvec(x)  # working precision
        resn = float(jnp.linalg.norm(r))
        if not np.isfinite(resn) or resn <= tol_eff:
            break
        # scale the residual to unit norm before the low-precision solve:
        # once outer sweeps contract r below ~1e-12, an UNSCALED f32 inner
        # CG underflows its inner products (rz ~ ||r||^2 ~ 1e-24 -> 0/0 =
        # NaN, observed in eigenpair refinement); unit scaling keeps the
        # inner solve in f32's healthy range at every sweep
        d = inner_solve((r / resn).astype(inner_dtype))
        x = x + resn * d.astype(work_dtype)
    else:
        r = b - A.matvec(x)
        resn = float(jnp.linalg.norm(r))
    return x, SolveInfo(
        jnp.asarray(k, jnp.int32),
        jnp.asarray(resn, work_dtype),
        jnp.asarray(resn <= tol_eff),
    )
