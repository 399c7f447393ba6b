"""Smoothed-aggregation algebraic multigrid (AMG) preconditioner.

The reference has no multigrid, but it was *built for* it: the solver /
preconditioner class unification exists "to enable nested multilevel/DD
methods" (``/root/reference/src/solver/README.md``), PtAP is the Galerkin
coarse-operator product (``sparse_matrix_algebra.f90:425``), and the graph
layer provides the aggregation structure.  This module is the payoff:

* **setup** (host): greedy aggregation over the matrix graph -> tentative
  piecewise-constant prolongator -> one damped-Jacobi smoothing pass
  ``P = (I - omega D^{-1} A) P_tent`` (materialized with
  :func:`sigma_tpu.matrix.algebra.sparse_matmul`) -> Galerkin coarse
  operator ``A_c = P^T A P`` (:func:`ptap`) -> recurse; the coarsest level
  is a dense factor.
* **apply** (device, jit): one V-cycle — damped-Jacobi pre/post smoothing,
  residual restriction by ``P.rmatvec``, dense coarse solve, prolongation
  by ``P.matvec`` — unrolled over the static level count, so the whole
  cycle is one XLA program usable as a CG/GMRES preconditioner.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sigma_tpu.matrix.algebra import ptap
from sigma_tpu.matrix.base import SparseMatrix
from sigma_tpu.matrix.formats import CSRMatrix
from sigma_tpu.operators.linear_operator import LinearOperator

__all__ = [
    "AMGPreconditioner",
    "smoothed_aggregation_amg",
    "greedy_aggregate",
    "vmb_aggregate",
]


def vmb_aggregate(A: SparseMatrix) -> np.ndarray:
    """VMB (Vaněk–Mandel–Brezina) three-phase aggregation: phase 1 seeds an
    aggregate only where the whole neighborhood is unaggregated (compact
    ~3^d aggregates on stencils — the greedy pass below degenerates to
    pairs), phase 2 attaches leftovers to adjacent aggregates, phase 3
    seeds the rest.  The standard smoothed-aggregation coarsener; default
    for :func:`smoothed_aggregation_amg`.  Runs in the compiled core with
    a numpy fallback."""
    from sigma_tpu import native
    from sigma_tpu.graph.permutations import _adjacency

    n = A.shape[0]
    indptr, cols = _adjacency(A.graph)
    res = native.vmb_aggregate(indptr, cols)
    if res is not None:
        return res[0]
    agg = -np.ones(n, dtype=np.int64)
    next_agg = 0
    for v in range(n):  # phase 1
        if agg[v] >= 0:
            continue
        nb = cols[indptr[v] : indptr[v + 1]]
        if np.any(agg[nb[nb != v]] >= 0):
            continue
        agg[v] = next_agg
        agg[nb] = next_agg
        next_agg += 1
    for v in range(n):  # phase 2
        if agg[v] >= 0:
            continue
        nb = agg[cols[indptr[v] : indptr[v + 1]]]
        hit = nb[nb >= 0]
        if hit.size:
            agg[v] = hit[0]
    for v in range(n):  # phase 3
        if agg[v] >= 0:
            continue
        agg[v] = next_agg
        nb = cols[indptr[v] : indptr[v + 1]]
        agg[nb[agg[nb] < 0]] = next_agg
        next_agg += 1
    return agg


def greedy_aggregate(A: SparseMatrix) -> np.ndarray:
    """Aggregate vertices of A's graph greedily: each unaggregated vertex
    seeds an aggregate with its unaggregated neighbors.  Returns (n,) int
    aggregate ids.  Host-side setup, like all reorderings — runs in the
    compiled core (``sigma_host.cpp::greedy_aggregate``) with a numpy
    fallback."""
    from sigma_tpu import native
    from sigma_tpu.graph.permutations import _adjacency

    n = A.shape[0]
    indptr, cols = _adjacency(A.graph)
    res = native.greedy_aggregate(indptr, cols)
    if res is not None:
        return res[0]
    agg = -np.ones(n, dtype=np.int64)
    next_agg = 0
    for v in range(n):
        if agg[v] >= 0:
            continue
        agg[v] = next_agg
        for u in cols[indptr[v] : indptr[v + 1]]:
            if agg[u] < 0:
                agg[u] = next_agg
        next_agg += 1
    return agg


def _tentative_prolongator(agg: np.ndarray, dtype) -> CSRMatrix:
    n = agg.size
    nc = int(agg.max()) + 1
    # columns normalized so P^T P = I (unit aggregates)
    counts = np.bincount(agg, minlength=nc).astype(np.float64)
    vals = 1.0 / np.sqrt(counts[agg])
    return CSRMatrix.from_coo(n, nc, np.arange(n), agg, vals, dtype=dtype)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True, repr=False)
class _Level:
    A: SparseMatrix
    P: SparseMatrix  # prolongator to THIS level from the next-coarser one
    dinv: jax.Array  # 1 / diag(A)
    omega: float = dataclasses.field(metadata=dict(static=True))


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True, repr=False)
class AMGPreconditioner(LinearOperator):
    """Applies z = (one V-cycle of AMG) r.  Use as ``M=`` in any Krylov
    solver or as a standalone stationary iteration."""

    levels: Tuple[_Level, ...]
    # dense INVERSE of the coarsest operator (f64 inversion at setup):
    # applies as one MXU matvec — jnp.linalg.solve per cycle paid a full
    # dense factorization + TPU-sequential triangular solves every
    # V-cycle (measured 13.6 ms for the triangular solves alone at 4096)
    coarse_inv: jax.Array
    n_smooth: int = dataclasses.field(metadata=dict(static=True), default=1)

    @property
    def shape(self):
        if self.levels:
            n = self.levels[0].A.shape[0]
        else:  # hierarchy collapsed to the dense coarse solve
            n = self.coarse_inv.shape[0]
        return (n, n)

    def _smooth(self, lvl: _Level, x, r):
        for _ in range(self.n_smooth):
            x = x + lvl.omega * lvl.dinv * (r - lvl.A.matvec(x))
        return x

    def matvec(self, r):
        return self._cycle(0, r)

    def _cycle(self, i: int, r):
        if i == len(self.levels):
            return (
                self.coarse_inv @ r.astype(self.coarse_inv.dtype)
            ).astype(r.dtype)
        lvl = self.levels[i]
        x = jnp.zeros_like(r)
        x = self._smooth(lvl, x, r)  # pre-smooth
        resid = r - lvl.A.matvec(x)
        rc = lvl.P.rmatvec(resid)  # restrict
        ec = self._cycle(i + 1, rc)
        x = x + lvl.P.matvec(ec)  # prolongate + correct
        return self._smooth(lvl, x, r)  # post-smooth

    rmatvec = matvec  # symmetric cycle


def smoothed_aggregation_amg(
    A: SparseMatrix,
    max_levels: int = 10,
    coarse_size: int = 64,
    omega: float = 2.0 / 3.0,
    smooth_prolongator: bool = True,
    n_smooth: int = 1,
    aggregate=None,
) -> AMGPreconditioner:
    """Build a smoothed-aggregation AMG hierarchy for SPD A.

    ``aggregate`` is the coarsening callback (matrix -> aggregate ids).
    Default :func:`greedy_aggregate` (pair-ish aggregates, gentle 2x
    coarsening — best V-cycle quality: 11 vs 19 CG iterations measured on
    a 40x40 Laplacian); pass :func:`vmb_aggregate` for aggressive ~3^d
    aggregates (5.7x coarsening, ~half the hierarchy build/apply cost,
    more iterations).  On large 3-D problems prefer ``vmb_aggregate``:
    pair aggregates + prolongator smoothing grow the Galerkin operator's
    nnz ~4.7x at the first level (measured on a 262K-row 3-D Laplacian),
    where VMB's ~3^d aggregates keep the coarse stencil bounded — 10x
    faster setup at that size (BENCHMARKS.md host-side build table).

    For STENCIL operators on structured grids prefer
    :func:`sigma_tpu.solvers.structured_pair_amg`: its setup is
    closed-form on the diagonal value grids (no SpGEMM — seconds at 10M
    rows) and its transfers are gather-free reshapes, where this generic
    builder's CSR prolongator applies as a per-element gather
    (~0.1 Gnnz/s on TPU)."""
    from sigma_tpu.matrix.algebra import sparse_matmul, sparse_add

    aggregate = greedy_aggregate if aggregate is None else aggregate
    levels = []
    Acur = A
    while Acur.shape[0] > coarse_size and len(levels) < max_levels - 1:
        agg = aggregate(Acur)
        P = _tentative_prolongator(agg, Acur.dtype)
        if P.shape[1] >= Acur.shape[0]:  # aggregation stalled
            break
        dvec_np = np.asarray(Acur.diagonal())  # one read per level
        if smooth_prolongator:
            # P <- (I - omega D^{-1} A) P, materialized sparsely
            d = np.where(dvec_np != 0, dvec_np, 1.0)
            DinvA = Acur.with_data(
                _scale_rows_data(Acur, 1.0 / d)
            )
            AP = sparse_matmul(DinvA, P, out_format=CSRMatrix)
            P = sparse_add(P, AP, alpha=1.0, beta=-omega)
        # coarse levels in CSR regardless of A's format: Galerkin sparsity
        # is scattered, so e.g. a DIA coarse op would materialize one
        # (padded) diagonal per distinct offset — measured 10x setup blowup
        # on a DIA fine operator — and the V-cycle applies levels through
        # the generic matvec anyway
        Ac = ptap(
            Acur, P,
            out_format=type(Acur) if isinstance(Acur, CSRMatrix) else CSRMatrix,
        )
        dvec = jnp.asarray(dvec_np)
        dinv = jnp.where(dvec != 0, 1.0, 0.0) / jnp.where(dvec != 0, dvec, 1.0)
        levels.append(_Level(A=Acur, P=P, dinv=dinv, omega=float(omega)))
        Acur = Ac

    coarse = np.asarray(Acur.to_dense(), dtype=np.float64)
    # tiny ridge: aggregation can leave a singular coarsest Laplacian
    coarse = coarse + 1e-12 * np.eye(coarse.shape[0])
    cinv = jnp.asarray(np.linalg.inv(coarse), dtype=A.dtype)
    return AMGPreconditioner(
        levels=tuple(levels), coarse_inv=cinv, n_smooth=n_smooth
    )


def _scale_rows_data(A: SparseMatrix, scale: np.ndarray) -> jax.Array:
    """data array of diag(scale) @ A in A's own layout."""
    from sigma_tpu.matrix.formats import CSRMatrix

    if isinstance(A, CSRMatrix):
        # scale in-layout: flat position p belongs to row row_ids[p]
        # (pad slots carry sentinel n and data 0 — append a 0 scale)
        rid = np.asarray(A.graph.row_ids)
        s = np.append(np.asarray(scale), 0.0)
        return jnp.asarray(np.asarray(A.data) * s[rid].astype(np.asarray(A.data).dtype))
    rows, cols, vals = A.entries()
    pos = A.graph.edge_positions(rows, cols)
    flat = np.zeros(A.data.size, dtype=np.asarray(A.data).dtype)
    flat[pos] = vals * scale[rows]
    return jnp.asarray(flat.reshape(A.data.shape))


@jax.jit
def _amg_iterate(A, M, b, tol, maxiter):
    # A, M, b as PYTREE ARGUMENTS (review fix): a while_loop closing
    # over the operator + hierarchy embeds them as jaxpr constants —
    # the remote-compile HTTP-413 failure CLAUDE.md documents
    from jax import lax

    def cond(state):
        _, r, k = state
        return (jnp.linalg.norm(r) > tol) & (k < maxiter)

    def body(state):
        x, r, k = state
        x = x + M.matvec(r)
        return x, b - A.matvec(x), k + 1

    x0 = jnp.zeros_like(b)
    x, r, k = lax.while_loop(cond, body, (x0, b, jnp.asarray(0, jnp.int32)))
    return x, k, jnp.linalg.norm(r)


def amg_solve(A, b, M: AMGPreconditioner = None, *, tol=1e-10, maxiter=100):
    """Standalone AMG solver: stationary V-cycle iteration x += M(b - A x)
    until the residual norm meets ``tol`` (jit-compiled while_loop; the
    operator/hierarchy/rhs are jit arguments, never closures).  Builds
    the hierarchy if ``M`` is not supplied."""
    from sigma_tpu.solvers.krylov import SolveInfo

    if M is None:
        M = smoothed_aggregation_amg(A)
    x, k, resn = _amg_iterate(
        A, M, b, jnp.asarray(tol, b.dtype),
        jnp.asarray(int(maxiter), jnp.int32),
    )
    return x, SolveInfo(k, resn, resn <= tol)
