"""ctypes bindings for the compiled host core (``native/sigma_host.cpp``).

The shared library is built on first use with the system ``g++`` (no build
system, no pip); every entry point has a pure-numpy fallback, so the
package works identically without a compiler — just slower on huge
host-side builds.  Set ``SIGMA_TPU_NO_NATIVE=1`` to force the fallbacks.

Wired call sites: ``bfs_order``/``greedy_coloring`` (graph/permutations),
``triangular_levels`` (solvers/ildu).  ``csr_from_coo`` and
``edge_positions`` are bound and tested but intentionally NOT wired: the
numpy paths (SIMD introsort; vectorized searchsorted/broadcast lookups)
measured faster on this host class — see BENCHMARKS.md.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

__all__ = [
    "available",
    "csr_from_coo",
    "bfs_order",
    "greedy_coloring",
    "triangular_levels",
    "edge_positions",
]

_SRC = Path(__file__).resolve().parent.parent.parent / "native" / "sigma_host.cpp"
_LIB_PATH = _SRC.parent / "libsigma_host.so"
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False

_i64p = np.ctypeslib.ndpointer(dtype=np.int64, flags="C_CONTIGUOUS")


def _build() -> bool:
    if not _SRC.exists():
        return False
    if _LIB_PATH.exists() and _LIB_PATH.stat().st_mtime >= _SRC.stat().st_mtime:
        return True
    try:
        subprocess.run(
            [
                "g++", "-O3", "-std=c++17", "-shared", "-fPIC",
                str(_SRC), "-o", str(_LIB_PATH),
            ],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return True
    except (OSError, subprocess.SubprocessError):
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _tried:
        return _lib
    with _lock:
        if _tried:
            return _lib
        _tried = True
        if os.environ.get("SIGMA_TPU_NO_NATIVE"):
            return None
        if not _build():
            return None
        try:
            lib = ctypes.CDLL(str(_LIB_PATH))
        except OSError:
            return None
        i64 = ctypes.c_longlong
        lib.csr_from_coo.restype = i64
        lib.csr_from_coo.argtypes = [i64, i64, i64, _i64p, _i64p, _i64p, _i64p, _i64p]
        lib.bfs_order.restype = None
        lib.bfs_order.argtypes = [i64, _i64p, _i64p, i64, _i64p]
        lib.greedy_coloring.restype = i64
        lib.greedy_coloring.argtypes = [i64, _i64p, _i64p, _i64p]
        lib.triangular_levels.restype = i64
        lib.triangular_levels.argtypes = [i64, _i64p, _i64p, i64, _i64p]
        lib.edge_positions.restype = None
        lib.edge_positions.argtypes = [i64, _i64p, _i64p, i64, _i64p, _i64p, _i64p]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def _c64(a) -> np.ndarray:
    return np.ascontiguousarray(np.asarray(a, dtype=np.int64))


def csr_from_coo(
    n: int, m: int, rows, cols
) -> Optional[Tuple[np.ndarray, np.ndarray, np.ndarray]]:
    """Sorted deduplicated (rows, cols, indptr) or None if native is off."""
    lib = _load()
    if lib is None:
        return None
    rows, cols = _c64(rows), _c64(cols)
    ne = rows.size
    out_r = np.empty(ne, dtype=np.int64)
    out_c = np.empty(ne, dtype=np.int64)
    indptr = np.empty(n + 1, dtype=np.int64)
    w = lib.csr_from_coo(n, m, ne, rows, cols, out_r, out_c, indptr)
    return out_r[:w], out_c[:w], indptr


def bfs_order(indptr, indices, start: int = 0) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    indptr, indices = _c64(indptr), _c64(indices)
    n = indptr.size - 1
    perm = np.empty(n, dtype=np.int64)
    lib.bfs_order(n, indptr, indices, int(start), perm)
    return perm


def greedy_coloring(indptr, indices) -> Optional[Tuple[np.ndarray, int]]:
    lib = _load()
    if lib is None:
        return None
    indptr, indices = _c64(indptr), _c64(indices)
    n = indptr.size - 1
    colors = np.empty(n, dtype=np.int64)
    nc = lib.greedy_coloring(n, indptr, indices, colors)
    return colors, int(nc)


def triangular_levels(
    indptr, indices, reverse: bool = False
) -> Optional[Tuple[np.ndarray, int]]:
    lib = _load()
    if lib is None:
        return None
    indptr, indices = _c64(indptr), _c64(indices)
    n = indptr.size - 1
    lvl = np.empty(n, dtype=np.int64)
    nl = lib.triangular_levels(n, indptr, indices, int(bool(reverse)), lvl)
    return lvl, int(nl)


def edge_positions(qr, qc, indptr, indices) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    qr, qc = _c64(qr), _c64(qc)
    indptr, indices = _c64(indptr), _c64(indices)
    n = indptr.size - 1
    out = np.empty(qr.size, dtype=np.int64)
    lib.edge_positions(qr.size, qr, qc, n, indptr, indices, out)
    return out
