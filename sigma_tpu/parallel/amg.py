"""Distributed AMG: shard a host-built hierarchy over a 1-D device mesh.

The reference's solver/preconditioner unification exists to enable nested
multilevel methods (``/root/reference/src/solver/README.md``), and its
designated distribution seam is the composite block matvec
(``sparse_matrix_composites.f90:1076-1129``).  Here the strongest
preconditioner in the library actually scales out:

* the hierarchy (aggregation, prolongator smoothing, Galerkin PtAP) is
  built once on host by :func:`sigma_tpu.solvers.amg.smoothed_aggregation_amg`
  — setup is host-side, like every reordering;
* every level's ``A`` (square) and ``P`` (rectangular, fine x coarse) is
  then row-partitioned over the mesh with
  :func:`sigma_tpu.parallel.dist.distribute_matrix` — prolongators
  partition BOTH dimensions over the same axis with independent block
  sizes, so restriction (``P.rmatvec``) and prolongation (``P.matvec``)
  are each one cyclic ring exchange;
* the V-cycle is the unchanged :class:`AMGPreconditioner` apply: the
  damped-Jacobi smoothers use the sharded ``dinv`` vectors, the coarsest
  dense solve runs replicated (padded with an identity block so padded
  slots stay zero), and the whole cycle jit-compiles into one SPMD
  program usable as a CG/GMRES preconditioner.

Iteration counts match the single-device hierarchy exactly (same numbers,
different layout) — pinned by ``tests/test_parallel.py``.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from sigma_tpu.parallel.dist import distribute_matrix, distribute_vector
from sigma_tpu.solvers.amg import AMGPreconditioner, _Level

__all__ = ["distribute_amg", "distributed_amg", "distribute_structured_amg"]


def distribute_amg(
    M: AMGPreconditioner, mesh: Mesh, axis: str = "rows"
) -> AMGPreconditioner:
    """Re-shard a host-built AMG hierarchy over ``mesh``: same levels, same
    numerics, distributed storage and collectives-backed transfers."""
    levels = []
    for lvl in M.levels:
        Ad = distribute_matrix(lvl.A, mesh, axis)
        Pd = distribute_matrix(lvl.P, mesh, axis)
        dinv = distribute_vector(np.asarray(lvl.dinv), mesh, axis, Ad.n_pad)
        levels.append(_Level(A=Ad, P=Pd, dinv=dinv, omega=lvl.omega))

    cinv = np.asarray(M.coarse_inv)
    nc = cinv.shape[0]
    if levels:
        pad_to = levels[-1].P.m_pad
    else:
        D = mesh.shape[axis]
        pad_to = -(-nc // D) * D
    cp = np.eye(pad_to, dtype=cinv.dtype)
    cp[:nc, :nc] = cinv  # identity pad block passes padded slots
    # through unchanged (they carry zero residual by construction)
    coarse_rep = jax.device_put(cp, NamedSharding(mesh, P(None, None)))
    return AMGPreconditioner(
        levels=tuple(levels), coarse_inv=coarse_rep, n_smooth=M.n_smooth
    )


def distributed_amg(
    A, mesh: Mesh, axis: str = "rows", **kwargs
) -> AMGPreconditioner:
    """Build the hierarchy on host from the (single-device) matrix ``A``
    and distribute it in one call."""
    from sigma_tpu.solvers.amg import smoothed_aggregation_amg

    return distribute_amg(smoothed_aggregation_amg(A, **kwargs), mesh, axis)


def distribute_structured_amg(M, mesh: Mesh, axis: str = "rows"):
    """Re-shard a structured pair-aggregation hierarchy
    (:func:`sigma_tpu.solvers.gmg.structured_pair_amg`, built with
    ``freeze_axes=(0,)``) over a 1-D device mesh, slab-partitioned along
    grid axis 0.

    Because the frozen axis is never paired, EVERY transfer in the
    V-cycle (the strided even/odd sums and repeats along axes >= 1) is
    shard-local under GSPMD — zero collectives beyond the level SpMVs'
    own ``ppermute`` ring shifts (the stencil's +/-1 couplings along
    axis 0 become nearest-neighbor ICI hops in the
    :class:`~sigma_tpu.parallel.dist.DistributedDIAMatrix` layout) and
    the all-gather feeding the replicated coarsest LU solve.  Same
    numerics as the single-device hierarchy: iteration parity is pinned
    in tests/test_parallel.py.
    """
    from sigma_tpu.parallel.dist import distribute_matrix_dia
    from sigma_tpu.solvers.gmg import (
        StructuredAMGPreconditioner,
        _SLevel,
    )

    D = mesh.shape[axis]
    levels = []
    for lvl in M.levels:
        if 0 in lvl.axes:
            raise ValueError(
                "hierarchy pairs the sharded axis — build it with "
                "structured_pair_amg(..., freeze_axes=(0,))"
            )
        if lvl.dims[0] % D:
            raise ValueError(
                f"grid axis 0 ({lvl.dims[0]}) must divide evenly over "
                f"{D} shards"
            )
        from sigma_tpu.matrix.symmetric import SymmetricDIAMatrix

        Alvl = (
            lvl.A.to_dia()
            if isinstance(lvl.A, SymmetricDIAMatrix)
            else lvl.A
        )
        Ad = distribute_matrix_dia(Alvl, mesh, axis)
        dinv = distribute_vector(np.asarray(lvl.dinv), mesh, axis, Ad.n_pad)
        rep = NamedSharding(mesh, P())
        lmax = (
            jax.device_put(np.asarray(lvl.lmax), rep)
            if lvl.lmax is not None
            else None
        )
        levels.append(
            _SLevel(
                A=Ad, dinv=dinv, dims=lvl.dims, axes=lvl.axes,
                omega=lvl.omega, lmax=lmax,
            )
        )
    rep = NamedSharding(mesh, P())
    return StructuredAMGPreconditioner(
        levels=tuple(levels),
        coarse_inv=jax.device_put(np.asarray(M.coarse_inv), rep),
        n_smooth=M.n_smooth,
        smoother=M.smoother,
    )
