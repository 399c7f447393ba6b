"""Headline benchmark: SpMV throughput (nnz/s) on one chip.

Target (BASELINE.json): > 80% of speed-of-light, where speed-of-light is
HBM-bandwidth-bound — every nonzero moves its value + column index, plus
the x-gather and y-write traffic.  Prints ONE JSON line:
``{"metric": ..., "value": N, "unit": ..., "vs_baseline": N}``.

``vs_baseline`` = achieved / (0.8 * speed_of_light) for the detected chip —
1.0 means exactly the 80%-of-SoL target; >1.0 beats it.
"""

import json
import time

import numpy as np

# chip -> HBM bandwidth GB/s (public specs); conservative default otherwise
HBM_GBPS = {
    "TPU v2": 700.0,
    "TPU v3": 900.0,
    "TPU v4": 1228.0,
    "TPU v5 lite": 819.0,
    "TPU v5e": 819.0,
    "TPU v5": 1638.0,
    "TPU v5p": 2765.0,
    "TPU v6 lite": 1640.0,
    "TPU v6e": 1640.0,
    "cpu": 50.0,
}


def laplacian_3d_ell(nx, dtype):
    """7-point stencil Laplacian + I on an nx^3 grid, built directly in ELL
    (width 7) — the BASELINE north-star operator family."""
    from sigma_tpu import ELLMatrix
    from sigma_tpu.graph import ELLGraph
    import jax.numpy as jnp

    n = nx * nx * nx
    idx = np.arange(n, dtype=np.int64).reshape(nx, nx, nx)
    node = np.empty((n, 7), dtype=np.int64)
    val = np.zeros((n, 7))
    node[:, 0] = np.arange(n)
    val[:, 0] = 7.0
    slot = 1
    mask_total = np.zeros(n, dtype=np.int64)
    for axis in range(3):
        for shift in (1, -1):
            dst = np.roll(idx, -shift, axis=axis)
            coord = np.arange(nx) + shift
            ok = (coord >= 0) & (coord < nx)
            m = np.ones((nx, nx, nx), dtype=bool)
            sl = [slice(None)] * 3
            m = np.moveaxis(m, axis, 0)
            m[~ok] = False
            m = np.moveaxis(m, 0, axis)
            flat_ok = m.ravel()
            node[:, slot] = np.where(flat_ok, dst.ravel(), np.arange(n))
            val[:, slot] = np.where(flat_ok, -1.0, 0.0)
            mask_total += flat_ok
            slot += 1
    degrees = 1 + mask_total
    nnz_true = int(degrees.sum())
    g = ELLGraph(
        cols=jnp.asarray(node, dtype=jnp.int32),
        degrees=jnp.asarray(degrees, dtype=jnp.int32),
        shape=(n, n),
        nnz=nnz_true,
    )
    A = ELLMatrix.from_graph(g, dtype=dtype)
    return A.with_data(jnp.asarray(val, dtype=dtype)), int(n + mask_total.sum())


def main():
    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    kind = getattr(dev, "device_kind", dev.platform)
    bw = next(
        (v for k, v in HBM_GBPS.items() if k.lower() in str(kind).lower()),
        HBM_GBPS.get(dev.platform, 100.0),
    )

    dtype = jnp.float32
    nx = 192  # 7.1M rows, ~49M nnz: HBM-resident, far beyond cache
    A, nnz = laplacian_3d_ell(nx, dtype)
    n = A.shape[0]
    x = jnp.ones((n,), dtype=dtype)

    spmv = jax.jit(lambda A, x: A.matvec(x))
    y = spmv(A, x)
    y.block_until_ready()  # compile

    reps = 20
    best = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        for _ in range(reps):
            y = spmv(A, x)
        y.block_until_ready()
        best = min(best, (time.perf_counter() - t0) / reps)

    nnz_per_s = nnz / best
    # bytes per nonzero: val(4) + idx(4) + x-gather(4, worst-case uncached)
    # + y-write amortized over the row width
    bytes_per_nnz = 4 + 4 + 4 + 4 * n / nnz
    sol = bw * 1e9 / bytes_per_nnz
    target = 0.8 * sol

    print(
        json.dumps(
            {
                "metric": "spmv_nnz_per_s",
                "value": round(nnz_per_s / 1e9, 4),
                "unit": "Gnnz/s",
                "vs_baseline": round(nnz_per_s / target, 4),
                "detail": {
                    "device": str(kind),
                    "n": n,
                    "nnz": nnz,
                    "ms_per_spmv": round(best * 1e3, 4),
                    "assumed_hbm_gbps": bw,
                    "speed_of_light_gnnz_s": round(sol / 1e9, 2),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
