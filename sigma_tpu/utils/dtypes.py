"""Dtype policy helpers.

The reference library (SiGMA) is double-precision Fortran throughout.  On TPU
the sweet spot is float32 (HBM-bandwidth-bound SpMV) with float64 available on
CPU (``jax_enable_x64``) for the reference's 1e-14-tolerance test problems.
Everything in sigma_tpu is dtype-generic; these helpers only pick defaults.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# Index dtype: int32 everywhere (TPU-native word size; SMEM scalars are i32).
index_dtype = jnp.int32


def default_real_dtype():
    """float64 when x64 is enabled (CPU test runs), else float32 (TPU)."""
    return jnp.float64 if jax.config.jax_enable_x64 else jnp.float32


def as_index_array(x) -> jax.Array:
    return jnp.asarray(x, dtype=index_dtype)


def round_up(x: int, m: int) -> int:
    """Round ``x`` up to a multiple of ``m``."""
    return ((x + m - 1) // m) * m


def np_index(x) -> np.ndarray:
    return np.asarray(x, dtype=np.int32)
