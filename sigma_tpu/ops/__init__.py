"""Pallas TPU kernels.

Opt-in alternates to the XLA compute paths in
:mod:`sigma_tpu.matrix.formats` — see :mod:`sigma_tpu.ops.spmv_pallas` for
the measured comparison that keeps the XLA DIA path as the default.
"""

from sigma_tpu.ops.spmv_pallas import dia_spmv_pallas, pallas_supported

__all__ = ["dia_spmv_pallas", "pallas_supported"]
