"""Distributed block preconditioners.

Block-Jacobi ILDU(0): each shard factorizes its own diagonal block
(host-side, at setup) and applies the level-scheduled forward/backward
sweeps *locally* inside ``shard_map`` — zero communication per application,
the classic domain-decomposition preconditioner.  Off-diagonal couplings
are ignored (that is the block-Jacobi approximation); quality degrades
gently with shard count while each application stays collective-free.

Setup pipeline: partition rows like :func:`distribute_matrix` (blocks of
``nb = ceil(n / D)``), run :func:`sigma_tpu.solvers.ildu.ildu0_factorize`
on every diagonal block, pack each block's triangular dependency levels
into arrays padded to the global maxima (shard_map needs one static shape
for all shards), and shard those arrays over the mesh row axis.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from sigma_tpu.matrix.base import SparseMatrix
from sigma_tpu.matrix.formats import CSRMatrix
from sigma_tpu.operators.linear_operator import LinearOperator

__all__ = ["DistributedBlockILDU", "distributed_block_ildu"]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True, repr=False)
class DistributedBlockILDU(LinearOperator):
    """z = blockdiag(L_s D_s U_s)^{-1} r, applied shard-locally.

    Arrays carry a leading shard axis (sharded over the mesh row axis);
    level/row/width dims are padded to global maxima with sentinel rows
    (= nb, scatter-dropped) and zero entries.
    """

    # lower sweep: (D, nlev, mr) rows; (D, nlev, mr, w) cols/vals
    l_rows: jax.Array
    l_cols: jax.Array
    l_vals: jax.Array
    u_rows: jax.Array
    u_cols: jax.Array
    u_vals: jax.Array
    dinv: jax.Array  # (D, nb)
    mesh: Mesh = dataclasses.field(metadata=dict(static=True))
    axis: str = dataclasses.field(metadata=dict(static=True))
    n: int = dataclasses.field(metadata=dict(static=True))
    block: int = dataclasses.field(metadata=dict(static=True))

    @property
    def shape(self):
        return (self.n, self.n)

    @property
    def n_pad(self) -> int:
        return self.dinv.shape[0] * self.dinv.shape[1]

    def matvec(self, r: jax.Array) -> jax.Array:
        nb = self.block

        def sweep(rows, cols, vals, b):
            """(I + T) x = b batched per level; sentinel rows (= nb) drop."""
            nlev = rows.shape[0]

            def body(l, x):
                rl = rows[l]
                acc = (vals[l] * x[cols[l]]).sum(axis=-1)
                xi = b[jnp.minimum(rl, nb - 1)] - acc
                return x.at[rl].set(xi)  # index nb is out of range -> dropped

            return lax.fori_loop(0, nlev, body, jnp.zeros_like(b))

        def local(r_blk, lr, lc, lv, ur, uc, uv, di):
            # shard_map passes blocks with the leading shard axis of size 1
            y = sweep(lr[0], lc[0], lv[0], r_blk)
            y = y * di[0]
            return sweep(ur[0], uc[0], uv[0], y)

        f = shard_map(
            local,
            mesh=self.mesh,
            in_specs=(
                P(self.axis),
                P(self.axis, None, None),
                P(self.axis, None, None, None),
                P(self.axis, None, None, None),
                P(self.axis, None, None),
                P(self.axis, None, None, None),
                P(self.axis, None, None, None),
                P(self.axis, None),
            ),
            out_specs=P(self.axis),
        )
        return f(
            r, self.l_rows, self.l_cols, self.l_vals,
            self.u_rows, self.u_cols, self.u_vals, self.dinv,
        )

    rmatvec = matvec  # symmetric role as a preconditioner apply


def _pack_levels(tri_list, nb, index_dtype, dtype):
    """Pack per-shard TriangularLevels into one padded (D, nlev, mr[, w])
    array set with sentinel rows."""
    D = len(tri_list)
    nlev = max(t.rows.shape[0] for t in tri_list)
    mr = max(t.rows.shape[1] for t in tri_list)
    w = max(t.cols.shape[2] for t in tri_list)
    rows = np.full((D, nlev, mr), nb, dtype=np.int64)
    cols = np.zeros((D, nlev, mr, w), dtype=np.int64)
    vals = np.zeros((D, nlev, mr, w), dtype=np.float64)
    for s, t in enumerate(tri_list):
        a, b_, c = t.rows.shape[0], t.rows.shape[1], t.cols.shape[2]
        tr = np.asarray(t.rows)
        rows[s, :a, :b_] = np.where(tr == t.n, nb, tr)  # re-aim sentinel
        cols[s, :a, :b_, :c] = np.asarray(t.cols)
        vals[s, :a, :b_, :c] = np.asarray(t.vals)
    return (
        jnp.asarray(rows, dtype=index_dtype),
        jnp.asarray(cols, dtype=index_dtype),
        jnp.asarray(vals, dtype=dtype),
    )


def distributed_block_ildu(
    A: SparseMatrix, mesh: Mesh, axis: str = "rows", level: int = 0
) -> DistributedBlockILDU:
    """Build the block-Jacobi ILDU preconditioner for the row partition
    that :func:`distribute_matrix`/:func:`distribute_matrix_dia` use.
    ``level`` is the fill level: 0 = ILDU(0), k > 0 = level-of-fill ILU(k)
    per diagonal block (stronger blocks, same zero-communication apply)."""
    from sigma_tpu.solvers.ildu import TriangularLevels, iluk_factorize
    from sigma_tpu.utils.dtypes import index_dtype

    if A.shape[0] != A.shape[1]:
        raise ValueError("block ILDU expects a square matrix")
    D = mesh.shape[axis]
    n = A.shape[0]
    nb = -(-n // D)

    rows, cols, vals = A.entries()
    lowers, uppers = [], []
    dinv = np.ones((D, nb), dtype=np.float64)
    dtype = np.asarray(A.data).dtype
    for s in range(D):
        # clamp lo too: trailing shards of a small n on a wide mesh have
        # lo = s*nb past n, and hi - lo must not go negative (review
        # regression); such shards factorize an empty block
        lo, hi = min(s * nb, n), min((s + 1) * nb, n)
        sel = (rows >= lo) & (rows < hi) & (cols >= lo) & (cols < hi)
        blk = CSRMatrix.from_coo(
            hi - lo, hi - lo, rows[sel] - lo, cols[sel] - lo, vals[sel]
        )
        (Lp, Li, Lx), d, (Up, Ui, Ux) = iluk_factorize(blk, level)
        dinv[s, : hi - lo] = 1.0 / d
        lowers.append(
            TriangularLevels.from_csr(Lp, Li, Lx, hi - lo, False, dtype)
        )
        uppers.append(
            TriangularLevels.from_csr(Up, Ui, Ux, hi - lo, True, dtype)
        )

    lr, lc, lv = _pack_levels(lowers, nb, index_dtype, dtype)
    ur, uc, uv = _pack_levels(uppers, nb, index_dtype, dtype)
    sh2 = NamedSharding(mesh, P(axis, None, None))
    sh3 = NamedSharding(mesh, P(axis, None, None, None))
    sh1 = NamedSharding(mesh, P(axis, None))
    return DistributedBlockILDU(
        l_rows=jax.device_put(lr, sh2),
        l_cols=jax.device_put(lc, sh3),
        l_vals=jax.device_put(lv, sh3),
        u_rows=jax.device_put(ur, sh2),
        u_cols=jax.device_put(uc, sh3),
        u_vals=jax.device_put(uv, sh3),
        dinv=jax.device_put(jnp.asarray(dinv, dtype=dtype), sh1),
        mesh=mesh,
        axis=axis,
        n=n,
        block=nb,
    )
