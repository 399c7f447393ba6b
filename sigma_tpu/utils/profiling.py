"""Profiling / observability helpers.

The reference has none of this (SURVEY §5: no timers anywhere, only solver
iteration counters).  Here: device-synchronized wall timing that is robust
to remote-device tunnels (scalar readback barrier + two-point slope fit to
cancel launch overhead), SpMV throughput in nnz/s, and a thin wrapper over
``jax.profiler`` traces for XLA-level inspection.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

__all__ = ["sync", "time_fn", "spmv_throughput", "trace", "SolverLog"]


def sync(y) -> float:
    """Block until ``y`` is computed (4-byte scalar readback — reliable even
    through device tunnels where block_until_ready returns early)."""
    leaf = jax.tree_util.tree_leaves(y)[0]
    return float(jnp.asarray(leaf).ravel()[0])


def time_fn(make_loop: Callable[[int], Callable], *args, k1=10, k2=50, reps=3):
    """Per-iteration seconds of a device-side loop.

    ``make_loop(K)`` must return a jitted callable running K iterations;
    the two-point fit (t(k2)-t(k1))/(k2-k1) cancels launch + readback
    overhead.  Estimator hardening ported from ``bench.timeit_loop``
    (review fix — the old best-of-reps form could return 1e-12 on a
    noisy short chain and report ~1e16 nnz/s): MEDIAN of per-rep slopes
    (best-of systematically selects jitter-corrupted-low reps), capped
    by the absolute floor ``t(k2)/k2`` (the chain provably sustained
    that).  If the k2 chain is shorter than ~4x the ~25 ms launch
    overhead, AUTO-LENGTHEN k2 (CLAUDE.md: short chains read
    impossibly high).
    """
    f1, f2 = make_loop(k1), make_loop(k2)
    sync(f1(*args))
    t0 = time.perf_counter()
    sync(f2(*args))
    t2_warm = time.perf_counter() - t0
    if t2_warm < 0.1:
        # lengthen the chain to >= ~100 ms of real work
        k2 = max(k2 * int(np.ceil(0.1 / max(t2_warm, 1e-3))), k2 * 2)
        f2 = make_loop(k2)
        sync(f2(*args))
    slopes = []
    floor = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        sync(f1(*args))
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        sync(f2(*args))
        t2 = time.perf_counter() - t0
        slopes.append(max((t2 - t1) / (k2 - k1), 1e-12))
        floor = min(floor, t2 / k2)
    med = sorted(slopes)[len(slopes) // 2]
    return max(min(med, floor), 1e-12)


def spmv_throughput(A, k1=10, k2=50) -> float:
    """Measured SpMV throughput of operator A in nonzeros/second."""
    x = jnp.ones((A.shape[1],), dtype=getattr(A, "dtype", jnp.float32))

    def make(K):
        @jax.jit
        def many(A, x):
            def body(i, v):
                return A.matvec(v) * jnp.asarray(0.5, v.dtype)

            return lax.fori_loop(0, K, body, x)

        return many

    t = time_fn(make, A, x, k1=k1, k2=k2)
    return A.nnz / t


@contextlib.contextmanager
def trace(logdir: str):
    """``with trace("/tmp/trace"):`` — capture a jax.profiler trace for
    xprof/tensorboard inspection."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class SolverLog:
    """Pretty-printer for SolveInfo residual histories."""

    def __init__(self, info):
        self.info = info

    def residuals(self) -> np.ndarray:
        if self.info.history is None:  # solve ran without history=True
            return np.empty(0)
        h = np.asarray(self.info.history)
        return h[~np.isnan(h)]

    def report(self, name: str = "solve") -> str:
        r = self.residuals()
        lines = [
            f"{name}: {int(self.info.iterations)} iterations, "
            f"final residual {float(self.info.residual_norm):.3e}, "
            f"converged={bool(self.info.converged)}"
        ]
        if r.size:
            drop = r[0] / max(r[-1], 1e-300)
            lines.append(
                f"  residual drop {drop:.2e} over {r.size} recorded steps"
            )
        return "\n".join(lines)
