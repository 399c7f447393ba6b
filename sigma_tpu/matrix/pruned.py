"""Pruned block-DIA matrix: the unstructured-sparsity flagship format.

The DIA recipe for general sparsity (RCM reorder -> store every diagonal
of the band, :mod:`sigma_tpu.matrix.banded`) pays ``n_diags * n`` slots
of HBM traffic even though after RCM the band is only locally narrow —
measured band occupancy on the irregular-mesh north star is 0.7-2.8%, so
97%+ of the streamed bytes are structural zeros.  This format stores only
the ACTIVE (row-tile x diagonal) blocks, packed linearly, and applies
them with the flat-grid pallas kernel of
:mod:`sigma_tpu.ops.spmv_pruned` — HBM value traffic shrinks to the
packed size (measured 4.6-8.6x fewer slots at 16K-1K-row tiles on the
1M-row mesh; 12-25x on wider bands), which is the only remaining lever
on the unstructured TRUE-nnz/s rate (the chunked kernel already runs at
~91% of spec HBM on the slots it streams).

It also removes the full-DIA memory wall: a 10M-row RCM band at 245
diagonals would store 10.3 GB in full DIA (over HBM), but packs into
~1-2 GB here, so the 10M-row unstructured north star fits one chip.

Re-designs the reference's any-pattern CSR kernel
(``/root/reference/src/matrix/formats/cs_matrices.f90:600-622``) — CSR
adapts per-row implicitly at gather cost (~0.1 Gnnz/s on TPU); this
format adapts per row-tile at zero gather cost.

Like :class:`sigma_tpu.matrix.symmetric.SymmetricDIAMatrix` this is a
frozen :class:`LinearOperator` (compose with every solver), not a mutable
SparseMatrix — structural edits go back through COO.
"""

from __future__ import annotations

import dataclasses
from typing import ClassVar, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sigma_tpu.operators.linear_operator import LinearOperator

__all__ = [
    "PrunedDIAMatrix",
    "SymmetricPrunedDIAMatrix",
    "check_symmetric_triples",
]


def check_symmetric_triples(n, rows, cols, vals, rtol=1e-12):
    """Raise ValueError unless the COO triples are numerically symmetric
    (pattern AND values, entry-by-entry within ``rtol`` of the largest
    off-diagonal).  Shared by the single-device and distributed
    symmetric-pruned constructors.

    Duplicate keys are canonicalized LAST-VALUE-WINS first — the same
    semantics the packing applies — so the check judges the matrix the
    operator will actually hold (an unstable sort over raw duplicates
    could pair mismatched values either way)."""

    def _canon(k, v):
        # stable sort + take the last entry of each equal-key run
        o = np.argsort(k, kind="stable")
        ks, vs = k[o], v[o]
        last = np.ones(ks.size, dtype=bool)
        last[:-1] = ks[1:] != ks[:-1]
        return ks[last], vs[last]

    rows = np.asarray(rows, dtype=np.int64).ravel()
    cols = np.asarray(cols, dtype=np.int64).ravel()
    vals = np.asarray(vals).ravel()
    up = cols > rows
    lo = cols < rows
    ku, vu = _canon(rows[up] * np.int64(n) + cols[up], vals[up])
    kl, vl = _canon(cols[lo] * np.int64(n) + rows[lo], vals[lo])
    if ku.size != kl.size or not np.array_equal(ku, kl):
        raise ValueError(
            "matrix pattern is not symmetric (upper/lower mirrors "
            "differ); pass validate=False only for known-symmetric "
            "triples"
        )
    scale = max(float(np.abs(vu).max(initial=0.0)), 1e-300)
    if float(np.abs(vu - vl).max(initial=0.0)) > rtol * scale:
        raise ValueError("matrix values are not symmetric")


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True, repr=False)
class PrunedDIAMatrix(LinearOperator):
    """Packed active (row-tile x diagonal) blocks of a banded matrix.

    ``data[l, c]`` is the (T, 128) value block of one (tile, offset)
    pair; ``tile``/``first`` index each grid step's row tile;
    ``rowoff``/``laneoff`` give each slot's x-window position
    (``q = halo*128 + offset``).  Slots are ordered by (tile, offset) —
    the blocked kernel's accumulation order.
    """

    data: jax.Array  # (L, C, T, 128) packed value blocks
    tile: jax.Array  # (L,) int32 row tile per grid step
    first: jax.Array  # (L,) int32 1 = first step of its tile
    rowoff: jax.Array  # (L*C,) int32 window sublane offset per slot
    laneoff: jax.Array  # (L*C,) int32 window lane offset per slot
    n: int = dataclasses.field(metadata=dict(static=True))
    m: int = dataclasses.field(metadata=dict(static=True))
    halo: int = dataclasses.field(metadata=dict(static=True))  # E sublanes
    nnz: int = dataclasses.field(metadata=dict(static=True))
    # optional transposed-plan twin (see with_transpose): carried as a
    # pytree child so rmatvec/rmatmat work INSIDE jit when present —
    # the plan build is a host operation and cannot run under a tracer
    t: "PrunedDIAMatrix" = None

    format: ClassVar[str] = "dia_pruned"
    is_get_row_fast: ClassVar[bool] = False
    is_get_column_fast: ClassVar[bool] = False

    # pallas engages above this x length.  Much lower than DIAMatrix's
    # 65_536: DIA below that size has a VMEM-resident XLA window path at
    # speed-of-light, but the pruned layout's only non-pallas apply is
    # the O(slots) gather reference — never competitive on TPU, so the
    # kernel (which handles G = 1 tiles fine) engages for anything
    # bigger than trivial (e.g. deep pruned-AMG levels).
    _PALLAS_MIN_ELEMS: ClassVar[int] = 1024

    @property
    def shape(self) -> Tuple[int, int]:
        return (self.n, self.m)

    @property
    def dtype(self):
        return self.data.dtype

    @property
    def tile_rows(self) -> int:
        return self.data.shape[2] * 128

    @property
    def group(self) -> int:
        return self.data.shape[1]

    @property
    def n_steps(self) -> int:
        return self.data.shape[0]

    @property
    def stored_slots(self) -> int:
        """Packed slot count = the HBM value words each matvec streams."""
        return int(self.data.size)

    # -- construction ------------------------------------------------------
    @classmethod
    def from_coo(
        cls, n, m, rows, cols, vals, *, dtype=None,
        tile_rows: int = 16384, group: int | None = None,
        assume_unique=False,
    ) -> "PrunedDIAMatrix":
        """Pack COO entries (duplicate entries: last value wins, matching
        ``SparseMatrix.set_values``).  ``tile_rows`` is the pruning
        granularity; ``group`` the slots per kernel step.
        ``assume_unique`` skips the nnz-dedup sort (pass it when the
        triples come from ``entries()``, which is already canonical —
        saves an O(nnz log nnz) host pass at 10M-row scale).

        Group guidance (long-chain measurements at the 1M-row mesh,
        benchmarks/pruned_sweep.py): f32 plateaus at ~26 true Gnnz/s for
        group 8-16 (HBM-bound); bf16 keeps gaining with wider groups —
        37 / 41 / 46 Gnnz/s at group 8 / 16 / 24 — so pack with
        ``group=16-24`` when the operator will be used in bf16
        (``astype(bfloat16)`` keeps the packing)."""
        from sigma_tpu.ops.spmv_pruned import build_pruned_plan

        dt = jnp.dtype(dtype or np.asarray(vals).dtype)
        if dt == jnp.float64 and not jax.config.read("jax_enable_x64"):
            dt = jnp.dtype(jnp.float32)
        if group is None:
            # measured defaults (docstring): f32 plateaus at group 8;
            # bf16 keeps gaining to 16-24
            group = 16 if dt == jnp.bfloat16 else 8
        # low-precision targets build the plan in f32 (the C++ fast path)
        # and cast on device — numpy has no native bf16 scatter anyway
        plan_dt = np.float32 if dt == jnp.bfloat16 else dt
        plan = build_pruned_plan(
            n, m, rows, cols, vals, tile_rows=tile_rows, group=group,
            dtype=plan_dt,
        )
        rows = np.asarray(rows)
        if assume_unique:
            nnz = rows.size
        else:
            key = rows.astype(np.int64) * int(m) + np.asarray(cols)
            nnz = int(np.unique(key).size)
        return cls(
            data=jnp.asarray(
                plan.data.reshape(plan.L, plan.C, plan.T, 128)
            ).astype(dt),
            tile=jnp.asarray(plan.tile),
            first=jnp.asarray(plan.first),
            rowoff=jnp.asarray(plan.rowoff),
            laneoff=jnp.asarray(plan.laneoff),
            n=int(plan.n), m=int(plan.m), halo=int(plan.E),
            nnz=int(nnz),
        )

    @classmethod
    def from_dia(cls, A, **kw) -> "PrunedDIAMatrix":
        """Repack a (wide-band) DIAMatrix; drops its structural zeros."""
        rows, cols, vals = A.entries()
        vals = np.asarray(vals)
        keep = vals != 0
        return cls.from_coo(
            A.shape[0], A.shape[1], np.asarray(rows)[keep],
            np.asarray(cols)[keep], vals[keep],
            dtype=np.asarray(A.data).dtype, **kw,
        )

    @classmethod
    def from_dense(cls, dense, **kw) -> "PrunedDIAMatrix":
        dense = np.asarray(dense)
        rows, cols = np.nonzero(dense)
        return cls.from_coo(
            dense.shape[0], dense.shape[1], rows, cols, dense[rows, cols],
            dtype=dense.dtype, **kw,
        )

    # -- introspection -----------------------------------------------------
    def entries(self):
        """(rows, cols, vals) of the stored nonzeros (host numpy).

        The pattern is reconstructed from nonzero VALUES (padding slots
        are indistinguishable from stored zeros in the packed layout), so
        explicitly-stored zero entries are dropped — ``transpose()``,
        ``get_value()`` and entries-based round-trips lose them, and
        ``nnz`` (set at construction) can then exceed ``len(vals)``.
        Keep the original COO triples when an exact structural
        round-trip matters."""
        T = self.data.shape[2]
        E = self.halo
        data = np.asarray(self.data).reshape(-1, T * 128)
        ro = np.asarray(self.rowoff).astype(np.int64)
        lo = np.asarray(self.laneoff).astype(np.int64)
        offs = (ro - E) * 128 + lo
        starts = np.repeat(np.asarray(self.tile, dtype=np.int64), self.group)
        starts = starts * (T * 128)
        slots, locs = np.nonzero(data)
        rows = starts[slots] + locs
        cols = rows + offs[slots]
        vals = data[slots, locs]
        ok = (rows < self.n) & (cols >= 0) & (cols < self.m)
        return rows[ok], cols[ok], vals[ok]

    def to_dense(self) -> np.ndarray:
        rows, cols, vals = self.entries()
        out = np.zeros(self.shape, dtype=np.asarray(self.data).dtype)
        out[rows, cols] = vals
        return out

    def astype(self, dtype) -> "PrunedDIAMatrix":
        """Per-value cast (bf16 halves the dominant HBM stream)."""
        return dataclasses.replace(
            self,
            data=self.data.astype(dtype),
            t=None if self.t is None else self.t.astype(dtype),
        )

    def transpose(self) -> "PrunedDIAMatrix":
        """Host rebuild of the transposed matrix (pruned layout is
        orientation-specific, like CSR<->CSC in the reference)."""
        rows, cols, vals = self.entries()
        return PrunedDIAMatrix.from_coo(
            self.m, self.n, cols, rows, vals,
            dtype=np.asarray(self.data).dtype,
            tile_rows=self.tile_rows, group=self.group,
            assume_unique=True,
        )

    def with_transpose(self) -> "PrunedDIAMatrix":
        """Return a copy carrying the transposed plan as a pytree child,
        making ``rmatvec``/``rmatmat`` usable INSIDE jit (transpose-
        consuming solvers: ``cgls_solve``, adjoint operators).  The plan
        build is host work, so do this at setup time::

            P = PrunedDIAMatrix.from_coo(...).with_transpose()
            x, info = jax.jit(cgls_solve)(P, b)
        """
        if self.t is not None:
            return self
        return dataclasses.replace(self, t=self.transpose())

    def why_not_pallas(self, op: str = "matvec", k: int = 1, dtype=None):
        """Audit probe, same contract as :meth:`DIAMatrix.why_not_pallas`."""
        xdt = dtype or self.data.dtype
        if op not in ("matvec", "matmat"):
            return (
                f"op {op!r}: pruned pallas paths are matvec and matmat "
                "(rmatvec runs through the transposed plan's matvec)"
            )
        # (no per-pass width gate to audit: matmat auto-splits k > 16
        # into 16-wide passes and the SpMM kernel's k-deep VMEM scratch
        # fits at every pass width, so any k routes to pallas)
        if self.m < self._PALLAS_MIN_ELEMS:
            return (
                f"m = {self.m} < {self._PALLAS_MIN_ELEMS}: gather reference "
                "path is fine at this size"
            )
        if jnp.dtype(xdt) not in (jnp.float32, jnp.bfloat16):
            return f"dtype {xdt}: pallas path is f32/bf16 only"
        if jnp.dtype(self.data.dtype) not in (jnp.float32, jnp.bfloat16):
            return f"value dtype {self.data.dtype}: pallas path is f32/bf16 only"
        try:
            if jax.default_backend() != "tpu":
                return f"backend {jax.default_backend()!r} is not TPU"
        except RuntimeError:
            return "no JAX backend"
        return None

    # -- compute -------------------------------------------------------
    def _kernel_kwargs(self):
        return dict(
            T=self.data.shape[2], E=self.halo, C=self.group,
            n=self.n, m=self.m,
        )

    def matvec(self, x):
        from sigma_tpu.ops.spmv_pruned import (
            dia_spmv_pallas_pruned,
            pruned_matvec_reference,
        )

        if x.ndim != 1:
            raise ValueError("matvec expects a vector; use matmat")
        if self.why_not_pallas(dtype=x.dtype) is None:
            return dia_spmv_pallas_pruned(
                self.data, x, self.tile, self.first, self.rowoff,
                self.laneoff, **self._kernel_kwargs(),
            )
        return pruned_matvec_reference(
            self.data, x, self.tile, self.rowoff, self.laneoff,
            **self._kernel_kwargs(),
        )

    def rmatvec(self, x):
        """Transpose apply through the transposed plan (the pruned
        layout is row-tile oriented; the reference's CSR<->CSC kernel
        duality, ``cs_matrices.f90:148-149``, becomes an explicit
        transposed plan here).  Inside jit the plan must already be
        attached — call :meth:`with_transpose` at setup."""
        return self._transposed().matvec(x)

    def _transposed(self) -> "PrunedDIAMatrix":
        if self.t is not None:
            return self.t
        if isinstance(self.data, jax.core.Tracer):
            raise NotImplementedError(
                "rmatvec inside jit needs the transposed plan attached: "
                "build the operator with "
                "PrunedDIAMatrix.from_coo(...).with_transpose() (a host "
                "setup step; a traced value cannot be repacked)"
            )
        cached = getattr(self, "_t_cache", None)
        if cached is None:
            cached = self.transpose()
            object.__setattr__(self, "_t_cache", cached)
        return cached

    # RHS counts above this split into passes (VMEM working set: the
    # k-deep x frame + accumulator scale linearly in k)
    _SPMM_MAX_K: ClassVar[int] = 16

    def matmat_rhs_major(self, XT):
        """Multi-RHS apply on an RHS-major block: ``XT`` is (k, m),
        returns (k, n).  The packed value stream is read ONCE for all k
        right-hand sides (measured 8.7x per-RHS over k separate SpMVs at
        k=16 on the 1M-row mesh) — the multi-vector capability the
        reference names as a missing critical optimization
        (``README.md:83``)."""
        from sigma_tpu.ops.spmv_pruned import dia_spmm_pruned_rhs_major

        k = XT.shape[0]
        if k > self._SPMM_MAX_K:
            parts = [
                self.matmat_rhs_major(XT[j : j + self._SPMM_MAX_K])
                for j in range(0, k, self._SPMM_MAX_K)
            ]
            return jnp.concatenate(parts, axis=0)
        if self.why_not_pallas(dtype=XT.dtype) is None:
            return dia_spmm_pruned_rhs_major(
                self.data, XT, self.tile, self.first, self.rowoff,
                self.laneoff, **self._kernel_kwargs(),
            )
        return jnp.stack([self.matvec(XT[j]) for j in range(k)], axis=0)

    def matmat(self, X):
        """Multi-vector product A @ X for X (m, k): routed through the
        RHS-major pruned SpMM (values streamed once per 16-wide pass)."""
        return self.matmat_rhs_major(X.T).T

    def rmatmat(self, X):
        """A.T @ X through the transposed plan (see :meth:`rmatvec`)."""
        return self._transposed().matmat(X)

    def get_value(self, i: int, j: int):
        rows, cols, vals = self.entries()
        hit = (rows == i) & (cols == j)
        return float(vals[hit][0]) if hit.any() else 0.0


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True, repr=False)
class SymmetricPrunedDIAMatrix(PrunedDIAMatrix):
    """Symmetric-storage pruned block-DIA: packs only the UPPER-triangle
    (offset >= 0) active blocks — half the dominant HBM value stream of
    :class:`PrunedDIAMatrix` on an SPD operator — and applies the lower
    triangle as an in-kernel mirror pass with a forward-spill carry
    (:func:`sigma_tpu.ops.spmv_pruned.dia_sym_spmv_pallas_pruned`).

    This closes the last of the reference's three named missing
    "critical optimizations" (``/root/reference/README.md:81-87``) for
    the unstructured flagship format: symmetric storage existed for
    full-band DIA (:class:`~sigma_tpu.matrix.symmetric.
    SymmetricDIAMatrix`, 1.9x measured) but the pruned format — the
    designated general-sparsity path — streamed both triangles.

    Same frozen-pytree/LinearOperator contract as the full pruned
    format; ``nnz`` counts BOTH triangles; ``transpose()`` is the
    identity and ``rmatvec`` = ``matvec``.
    """

    format: ClassVar[str] = "dia_pruned_sym"

    # -- construction ------------------------------------------------------
    @classmethod
    def from_coo(
        cls, n, m, rows, cols, vals, *, dtype=None,
        tile_rows: int = 16384, group: int | None = None,
        assume_unique=False, validate: bool = True, rtol: float = 1e-12,
    ) -> "SymmetricPrunedDIAMatrix":
        """Pack the upper triangle of FULL (both-triangle) COO triples.
        ``validate`` checks numeric symmetry entry-by-entry (mirroring
        :meth:`SymmetricDIAMatrix.from_dia`'s contract) — pass
        ``validate=False`` for triples known symmetric (e.g. an SPD
        assembly) to skip the O(nnz log nnz) host check.

        Measured at the 1M-row irregular-mesh north star
        (benchmarks/pruned_sym_sweep.py, real TPU): matvec 42.4 f32 /
        50.5 bf16 true Gnnz/s at group 12 = 1.54-1.63x (f32) and
        1.26x (bf16) over the full pruned kernel at its own best
        configs — group padding costs the half-sized symmetric slot
        pool relatively more, so the default group here is 12 for BOTH
        dtypes (f32 full-storage plateaus at 8; bf16 full at 16-24).
        Multi-RHS routing: the symmetric SpMM kernel LOSES to full
        storage (46.6 vs 61.8 G-eff at k=8 — the per-slot mirror work
        scales with k while the value-stream saving is amortized by k);
        keep full :class:`PrunedDIAMatrix` storage for block solvers
        with resident panels, symmetric storage for matvec-dominated
        solvers (CG/Chebyshev/GMG — the common SPD case)."""
        from sigma_tpu.ops.spmv_pruned import build_pruned_plan

        if int(n) != int(m):
            raise ValueError("symmetric storage requires a square matrix")
        n = int(n)
        rows = np.asarray(rows, dtype=np.int64).ravel()
        cols = np.asarray(cols, dtype=np.int64).ravel()
        vals = np.asarray(vals).ravel()
        if validate:
            check_symmetric_triples(n, rows, cols, vals, rtol=rtol)
        keep = cols >= rows
        urows, ucols, uvals = rows[keep], cols[keep], vals[keep]
        dt = jnp.dtype(dtype or vals.dtype)
        if dt == jnp.float64 and not jax.config.read("jax_enable_x64"):
            dt = jnp.dtype(jnp.float32)
        if group is None:
            group = 12  # measured optimum for the halved slot pool
        plan_dt = np.float32 if dt == jnp.bfloat16 else dt
        plan = build_pruned_plan(
            n, n, urows, ucols, uvals, tile_rows=tile_rows, group=group,
            dtype=plan_dt,
        )
        if assume_unique:
            n_up = urows.size
            n_diag = int((urows == ucols).sum())
        else:
            key = urows * np.int64(n) + ucols
            uk = np.unique(key)
            n_up = int(uk.size)
            n_diag = int((uk // n == uk % n).sum())
        return cls(
            data=jnp.asarray(
                plan.data.reshape(plan.L, plan.C, plan.T, 128)
            ).astype(dt),
            tile=jnp.asarray(plan.tile),
            first=jnp.asarray(plan.first),
            rowoff=jnp.asarray(plan.rowoff),
            laneoff=jnp.asarray(plan.laneoff),
            n=n, m=n, halo=int(plan.E),
            nnz=2 * n_up - n_diag,
        )

    @classmethod
    def from_pruned(cls, A: PrunedDIAMatrix, *, tile_rows=None,
                    group=None, validate: bool = True,
                    rtol: float = 1e-12):
        """Fold a full-storage pruned matrix into symmetric storage.
        ``group`` defaults to the symmetric optimum (12), NOT the source
        matrix's full-storage group — inheriting group 8 would quietly
        forfeit the measured symmetric speedup (review fix; overrides
        no longer collide with the forwarded kwargs either)."""
        rows, cols, vals = A.entries()
        return cls.from_coo(
            A.shape[0], A.shape[1], rows, cols, vals,
            dtype=np.asarray(A.data).dtype,
            tile_rows=A.tile_rows if tile_rows is None else tile_rows,
            group=group, assume_unique=True, validate=validate,
            rtol=rtol,
        )

    # -- introspection -----------------------------------------------------
    def entries(self):
        """Both-triangle (rows, cols, vals): the stored upper entries
        plus their mirrors (same explicit-zero caveat as the parent)."""
        r, c, v = super().entries()
        off = c > r
        return (
            np.concatenate([r, c[off]]),
            np.concatenate([c, r[off]]),
            np.concatenate([v, v[off]]),
        )

    def _upper_counts(self):
        # entries() pulls the FULL packed buffer through the TPU tunnel
        # (~GBs at the north star) — memoize so both count properties
        # cost one pull total (review fix)
        cached = getattr(self, "_upper_counts_cache", None)
        if cached is None:
            r, c, _ = super().entries()
            cached = (int(r.size), int((r == c).sum()))
            object.__setattr__(self, "_upper_counts_cache", cached)
        return cached

    @property
    def stored_upper(self) -> int:
        """Stored upper-triangle entry count (incl. main diagonal),
        reconstructed from the packed values — like :meth:`entries`
        this DROPS explicitly-stored zeros, so it can undercount vs the
        construction-time ``nnz`` (which keeps them); both count
        properties are derived from one memoized entries() pull so they
        stay mutually consistent."""
        return self._upper_counts()[0]

    @property
    def n_diag_entries(self) -> int:
        """Stored main-diagonal entry count (same explicit-zero-drop
        caveat as :meth:`entries` / :attr:`stored_upper`)."""
        return self._upper_counts()[1]

    def transpose(self) -> "SymmetricPrunedDIAMatrix":
        return self

    def with_transpose(self) -> "SymmetricPrunedDIAMatrix":
        return self

    # -- compute -------------------------------------------------------
    def matvec(self, x):
        from sigma_tpu.ops.spmv_pruned import (
            dia_sym_spmv_pallas_pruned,
            pruned_sym_matvec_reference,
        )

        if x.ndim != 1:
            raise ValueError("matvec expects a vector; use matmat")
        if self.why_not_pallas(dtype=x.dtype) is None:
            y, _spill = dia_sym_spmv_pallas_pruned(
                self.data, x, self.tile, self.first, self.rowoff,
                self.laneoff, **self._kernel_kwargs(),
            )
            return y
        return pruned_sym_matvec_reference(
            self.data, x, self.tile, self.rowoff, self.laneoff,
            **self._kernel_kwargs(),
        )

    rmatvec = matvec

    def matmat_rhs_major(self, XT):
        from sigma_tpu.ops.spmv_pruned import dia_sym_spmm_pruned_rhs_major

        k = XT.shape[0]
        if k > self._SPMM_MAX_K:
            parts = [
                self.matmat_rhs_major(XT[j : j + self._SPMM_MAX_K])
                for j in range(0, k, self._SPMM_MAX_K)
            ]
            return jnp.concatenate(parts, axis=0)
        if self.why_not_pallas(dtype=XT.dtype) is None:
            Y, _spill = dia_sym_spmm_pruned_rhs_major(
                self.data, XT, self.tile, self.first, self.rowoff,
                self.laneoff, **self._kernel_kwargs(),
            )
            return Y
        return jnp.stack([self.matvec(XT[j]) for j in range(k)], axis=0)

    def matmat(self, X):
        return self.matmat_rhs_major(X.T).T

    rmatmat = matmat
