"""Pallas TPU kernels for the hot SpMV/SpMM paths.

* :mod:`sigma_tpu.ops.spmv_pallas` — DIA (stencil) kernels; the blocked
  overlapping-window kernel is the default TPU matvec for DIAMatrix from
  64K rows up (selected automatically in
  :meth:`sigma_tpu.matrix.formats.DIAMatrix.matvec`).
* :mod:`sigma_tpu.ops.bsr_pallas` — grouped BSR scalar-prefetch kernel
  (block-level DMA gather + MXU group matmuls); opt in via
  :meth:`sigma_tpu.matrix.formats.BSRMatrix.grouped`.
"""

from sigma_tpu.ops.spmv_pallas import (
    deinterleave_panels,
    dia_spmv_pallas,
    dia_spmv_pallas_blocked,
    interleave_panels,
    pallas_supported,
)
from sigma_tpu.ops.bsr_pallas import GroupedBSR, bsr_grouped_spmv

__all__ = [
    "deinterleave_panels",
    "dia_spmv_pallas",
    "dia_spmv_pallas_blocked",
    "interleave_panels",
    "pallas_supported",
    "GroupedBSR",
    "bsr_grouped_spmv",
]
