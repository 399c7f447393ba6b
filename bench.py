"""Headline benchmark: SpMV throughput (nnz/s) on one chip, at the
north-star size (10M-row 7-point 3-D Laplacian, BASELINE.json).

Target: > 80% of speed-of-light, where speed-of-light = HBM bandwidth /
DIA's minimal bytes-per-nonzero.  Prints ONE JSON line
``{"metric": ..., "value": N, "unit": ..., "vs_baseline": N}``.

Session-robustness (the shared tunnel chip varies up to ~3x between
sessions): the same-session streaming-triad bandwidth is ALWAYS measured
and reported next to the spec-sheet figure, each timing is the median of
N slope fits capped by the absolute chain floor (see ``timeit_loop``)
with the per-rep spread recorded in ``detail.spread``, and when BOTH
in-run bandwidth witnesses (the triad and the bandwidth the SpMV itself
achieved) are far below spec (< 60%) the score is computed against the
best same-session witness and capped at 1.0 (a degraded session may claim
at most "met target") — with all numbers and a ``session_degraded`` flag
in ``detail`` so a slow session is distinguishable from a slow kernel in
the artifact itself.

``vs_baseline`` = DIA-achieved / (0.8 * speed-of-light) — 1.0 means
exactly the 80%-of-SoL target; > 1.0 beats it.  Headline definition
(since round 3): the FULL-STORAGE f32 kernel scored against the
FULL-STORAGE speed-of-light; symmetric-storage / bf16-value /
multi-RHS / BSR / unstructured variants are labeled detail rows.
"""

import json
import time

import numpy as np


def _sync_scalar(y):
    """Force execution + a 4-byte readback (a full-array np.asarray would
    drag the whole buffer through the device tunnel and pollute timing)."""
    import jax

    leaf = jax.tree_util.tree_leaves(y)[0]
    return float(leaf.ravel()[0])


def timeit_loop(make_f, *args, reps=3, K1=25, K2=125, samples=None):
    """Per-iteration time of a device-side loop.

    Two estimators are combined (method of record since the round-2
    relayout investigation, BENCHMARKS.md):

    - MEDIAN of per-rep two-point slope fits ``(t(K2)-t(K1))/(K2-K1)``
      — the slope cancels the ~25 ms tunnel launch/readback overhead,
      and the median (NOT best-of) rejects the jitter artifacts that
      once made one rep in ten read 139 Gnnz/s against nine reads of
      59-91 (a small t(K2)-t(K1) difference is corrupted in BOTH
      directions by session jitter; picking the minimum estimate
      systematically selects the corrupted ones).
    - the ABSOLUTE floor ``t(K2)/K2`` (launch overhead included): a
      K2-iteration chain genuinely finished in that wall-clock, so the
      true per-iteration time is at most this.
    - a LOWER bound from a measured K=0 chain (pure launch/readback
      overhead): ``(median t(K2) - median t(0)) / K2`` — refutes
      jitter-corrupted-LOW slope medians (see inline comment).

    Appends each rep's slope estimate to ``samples`` (spread evidence).
    ``make_f(K)`` may return a jitted function; a TRACED iteration count
    lets one compile serve both K values — remote-tunnel compiles can
    cost minutes, so single-compile bounds this benchmark's wall-clock."""
    f1, f2 = make_f(K1), make_f(K2)
    _sync_scalar(f1(*args))
    _sync_scalar(f2(*args))
    f0 = make_f(0)  # K=0 chain: measures pure launch+readback overhead
    _sync_scalar(f0(*args))
    slopes = []
    t0s, t2s = [], []
    floor = float("inf")
    for _ in range(reps):
        tb = time.perf_counter()
        _sync_scalar(f0(*args))
        t0 = time.perf_counter() - tb
        tb = time.perf_counter()
        _sync_scalar(f1(*args))
        t1 = time.perf_counter() - tb
        tb = time.perf_counter()
        _sync_scalar(f2(*args))
        t2 = time.perf_counter() - tb
        est = max((t2 - t1) / (K2 - K1), 1e-12)
        slopes.append(est)
        t0s.append(t0)
        t2s.append(t2)
        floor = min(floor, t2 / K2)
        if samples is not None:
            samples.append(est)
    med = sorted(slopes)[len(slopes) // 2]
    # DIRECT lower bound on the per-iteration time: the K=0 chain
    # measures the launch/readback overhead itself, so
    # (median(t2) - median(t0)) / K2 <= t_iter up to jitter.  This has
    # real refutation power against a jitter-corrupted-LOW slope
    # median — a within-rep bound (t2-t1)/K2 is just (K2-K1)/K2 times
    # the same rep's slope, perfectly correlated with the estimate it
    # is supposed to check (the round-4 first attempt; mathematically
    # inert).  Guards the corrupted-LOW failure observed as an
    # impossible 254 Gnnz/s (= 4x HBM) detail row from correlated
    # launch jitter on a short chain; medians keep single spikes in
    # either t0 or t2 from corrupting the bound.
    lower = max(
        (sorted(t2s)[len(t2s) // 2] - sorted(t0s)[len(t0s) // 2]) / K2,
        0.0,
    )
    # the chain PROVABLY sustained floor: that cap wins over everything
    return max(min(max(med, lower), floor), 1e-12)


def _progress(msg, t0):
    import sys

    print(f"# bench {time.time()-t0:6.0f}s  {msg}", file=sys.stderr, flush=True)


def measure_bandwidth_gbps(samples=None):
    """Rotating-buffer triad: per iteration write one fresh 64 MB buffer
    from two distinct ones, then rotate roles — 3 HBM streams that XLA
    cannot elide or fold (the earlier fixed-operand form measured 2.8x
    the spec sheet: at least one stream was being optimized away)."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    n = 16_777_216  # 64 MB per f32 array
    a = jnp.ones((n,), jnp.float32)
    b = jnp.full((n,), 0.5, jnp.float32)
    c = jnp.full((n,), 0.25, jnp.float32)

    @jax.jit
    def triad(a, b, c, K):  # traced K: ONE compile serves both slope points
        def body(i, carry):
            a, b, c = carry
            return (b, c, a + 0.5 * b)

        return lax.fori_loop(0, K, body, (a, b, c))

    def make(K):
        Kj = jnp.asarray(K, jnp.int32)
        return lambda a, b, c: triad(a, b, c, Kj)

    t = timeit_loop(make, a, b, c, samples=samples)
    return 3 * 4 * n / t / 1e9  # read a, read b, write new c per iter


def laplacian_3d_coo(nx):
    """7-point stencil Laplacian + I on an nx^3 grid as COO triples.

    Preallocates the exact-size output triples and fills them by axis
    slices — no boolean masks, np.roll copies, or concatenate temporaries
    (each fresh large numpy buffer re-faults its pages on this VM)."""
    n = nx * nx * nx
    per_axis = n - nx * nx  # bonded pairs along one axis
    total = n + 6 * per_axis
    rows = np.empty(total, dtype=np.int64)
    cols = np.empty(total, dtype=np.int64)
    vals = np.empty(total, dtype=np.float64)
    rows[:n] = np.arange(n, dtype=np.int64)
    cols[:n] = rows[:n]
    vals[:n] = 7.0
    vals[n:] = -1.0
    idx = rows[:n].reshape(nx, nx, nx)  # view, no copy
    off = n
    for axis in range(3):
        lo = [slice(None)] * 3
        hi = [slice(None)] * 3
        lo[axis] = slice(0, nx - 1)
        hi[axis] = slice(1, nx)
        src = idx[tuple(lo)].reshape(-1)
        dst = idx[tuple(hi)].reshape(-1)
        rows[off : off + per_axis] = src
        cols[off : off + per_axis] = dst
        off += per_axis
        rows[off : off + per_axis] = dst
        cols[off : off + per_axis] = src
        off += per_axis
    return n, rows, cols, vals


def bench_spmv(A, nnz, K1=40, K2=240, samples=None, reps=3):
    import jax
    import jax.numpy as jnp
    from jax import lax

    n = A.shape[0]
    x = jnp.ones((n,), dtype=jnp.float32)

    @jax.jit
    def many(A, x, K):  # traced K: ONE compile serves both slope points
        def body(i, v):
            return A.matvec(v) * jnp.asarray(0.1, v.dtype)

        return lax.fori_loop(0, K, body, x)

    def make(K):
        Kj = jnp.asarray(K, jnp.int32)
        return lambda A, x: many(A, x, Kj)

    t = timeit_loop(make, A, x, K1=K1, K2=K2, samples=samples, reps=reps)
    return nnz / t


def bench_spmm_interleaved(A, nnz, k=8, K1=20, K2=100, samples=None, reps=3):
    """Effective nnz/s of the resident interleaved-panel SpMM (the block
    solvers' layout: RHS folded into sublanes, see
    sigma_tpu/ops/spmv_pallas.py 'Interleaved-panel SpMM')."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    from sigma_tpu.ops.spmv_pallas import interleave_panels

    n = A.shape[0]
    XI = interleave_panels(jnp.ones((k, n), dtype=jnp.float32), n)

    @jax.jit
    def many(A, XI, K):
        def body(i, V):
            return A.matmat_interleaved(V) * jnp.asarray(0.1, V.dtype)

        return lax.fori_loop(0, K, body, XI)

    def make(K):
        Kj = jnp.asarray(K, jnp.int32)
        return lambda A, XI: many(A, XI, Kj)

    t = timeit_loop(make, A, XI, K1=K1, K2=K2, samples=samples, reps=reps)
    return k * nnz / t


def laplacian_3d_dia(nx, dtype=np.float32):
    """7-point Laplacian + I directly in DIA layout (analytic boundary
    masks — no 70M-entry COO sort, no device round trip): returns
    (n, offsets, data, nnz).  Must agree entry-for-entry with building
    via ``laplacian_3d_coo`` + ``DIAMatrix.from_coo`` (pinned by
    tests/test_dia.py)."""
    n = nx * nx * nx
    stride = -(-n // 128) * 128
    offsets = (-nx * nx, -nx, -1, 0, 1, nx, nx * nx)
    data = np.zeros((7, stride), dtype)
    i = np.arange(n)
    iz = i % nx
    iy = (i // nx) % nx
    ix = i // (nx * nx)
    data[3, :n] = 7.0
    data[4, :n] = np.where(iz < nx - 1, -1.0, 0.0)
    data[2, :n] = np.where(iz > 0, -1.0, 0.0)
    data[5, :n] = np.where(iy < nx - 1, -1.0, 0.0)
    data[1, :n] = np.where(iy > 0, -1.0, 0.0)
    data[6, :n] = np.where(ix < nx - 1, -1.0, 0.0)
    data[0, :n] = np.where(ix > 0, -1.0, 0.0)
    nnz = int(np.count_nonzero(data))
    return n, offsets, data, nnz


# chip -> HBM bandwidth GB/s (public specs)
HBM_GBPS = {
    "TPU v4": 1228.0,
    "TPU v5 lite": 819.0,
    "TPU v5e": 819.0,
    "TPU v5p": 2765.0,
    "TPU v6 lite": 1640.0,
    "TPU v6e": 1640.0,
}


def main():
    import time as _time

    try:
        from sigma_tpu.utils.util import enable_transparent_hugepages, enable_warm_heap

        enable_transparent_hugepages()
        enable_warm_heap()
    except Exception:
        pass

    t0 = _time.time()
    import jax
    import jax.numpy as jnp

    from sigma_tpu import DIAMatrix
    from sigma_tpu.graph.graph import DIAGraph

    dev = jax.devices()[0]
    kind = str(getattr(dev, "device_kind", dev.platform))
    _progress(f"device {kind}", t0)

    spec_bw = next(
        (v for k, v in HBM_GBPS.items() if k.lower() in kind.lower()), None
    )
    triad_samples = []
    measured_bw = measure_bandwidth_gbps(samples=triad_samples)
    _progress(f"triad {measured_bw:.0f} GB/s", t0)

    nx = 216  # 10.1M rows — the north-star size (BASELINE.json)
    # analytic DIA construction: host-direct, no COO sort, no device pull
    n, offsets, data, nnz = laplacian_3d_dia(nx)
    g = DIAGraph(offsets=offsets, shape=(n, n), nnz=nnz)
    A_dia = DIAMatrix(graph=g, data=jnp.asarray(data.reshape(7, -1, 128)))
    _progress("matrix on device", t0)
    # timed reps are cheap next to compiles (~150 SpMVs each); throughput
    # fluctuates minute-to-minute WITHIN a session (observed spread
    # 37..141 Gnnz/s in one run), so take best-of-many with the full
    # spread recorded as evidence
    dia_samples = []
    dia_nnz_s = bench_spmv(A_dia, nnz, reps=10, samples=dia_samples)
    _progress(f"dia f32 {dia_nnz_s/1e9:.1f} Gnnz/s", t0)

    # symmetric storage (upper diagonals only) streams ~7.5n words vs
    # ~10n: the same useful work (same nnz) off 25% less HBM traffic.
    # Self-bounding like the bf16 row below.
    sym_samples = []
    sym_nnz_s = None
    if _time.time() - t0 < 300:
        from sigma_tpu.matrix.symmetric import SymmetricDIAMatrix

        keep = [d for d, o in enumerate(offsets) if o >= 0]
        data_up = data[keep]  # reused by the sym+bf16 row (one slice)
        A_sym = SymmetricDIAMatrix(
            data=jnp.asarray(data_up.reshape(len(keep), -1, 128)),
            offsets=tuple(offsets[d] for d in keep),
            n=n,
        )
        sym_nnz_s = bench_spmv(A_sym, nnz, samples=sym_samples)
        _progress(f"dia sym {sym_nnz_s/1e9:.1f} Gnnz/s", t0)
    else:
        _progress("skipping symmetric row (session too slow)", t0)

    # bf16 matrix values halve the dominant HBM stream; cast host-side
    # with an exactness certificate (stencil coefficients are bf16-exact).
    # Self-bounding: on a session where compiles crawl, skip this detail
    # row rather than risk the whole artifact timing out.
    bf16_samples = []
    bf16_nnz_s = None
    if _time.time() - t0 < 360:
        data_bf16 = data.astype(jnp.bfloat16)
        assert np.array_equal(data_bf16.astype(np.float32), data)
        A_bf16 = DIAMatrix(graph=g, data=jnp.asarray(data_bf16.reshape(7, -1, 128)))
        bf16_nnz_s = bench_spmv(A_bf16, nnz, samples=bf16_samples)
        _progress(f"dia bf16 {bf16_nnz_s/1e9:.1f} Gnnz/s", t0)
    else:
        _progress("skipping bf16 row (session too slow)", t0)

    # the compounding of both storage tricks: SYMMETRIC (half the
    # diagonals) + bf16 values (half the bytes) — ~3.1 B/nnz traffic
    # model, the fastest possible single-chip SpMV of this operator.
    # Detail row, self-bounding.
    symbf_samples = []
    symbf_nnz_s = None
    if _time.time() - t0 < 380 and sym_nnz_s is not None:
        data_symbf = data_up.astype(jnp.bfloat16)
        assert np.array_equal(
            data_symbf.astype(np.float32), data_up
        )
        from sigma_tpu.matrix.symmetric import SymmetricDIAMatrix

        A_symbf = SymmetricDIAMatrix(
            data=jnp.asarray(data_symbf.reshape(len(keep), -1, 128)),
            offsets=tuple(offsets[d] for d in keep),
            n=n,
        )
        symbf_nnz_s = bench_spmv(A_symbf, nnz, samples=symbf_samples)
        _progress(f"dia sym+bf16 {symbf_nnz_s/1e9:.1f} Gnnz/s", t0)
    else:
        _progress("skipping sym+bf16 row (session too slow)", t0)

    # multi-RHS SpMM on resident interleaved panels (k=8): the block
    # solvers' layout.  Detail row, self-bounding like the rows above.
    spmm_samples = []
    spmm_eff = None
    if _time.time() - t0 < 400 and A_dia.interleaved_profitable(8):
        spmm_eff = bench_spmm_interleaved(
            A_dia, nnz, k=8, samples=spmm_samples
        )
        _progress(f"spmm interleaved k=8 {spmm_eff/1e9:.1f} G-eff", t0)
    elif not A_dia.interleaved_profitable(8):
        _progress("skipping spmm row (interleaved kernel gate: "
                  f"{A_dia.why_not_pallas('interleaved', 8)})", t0)
    else:
        _progress("skipping spmm row (session too slow)", t0)

    # unstructured-sparsity recipe (VERDICT r02 #1): shuffled irregular-mesh
    # Laplacian -> RCM -> banded DIA -> chunked blocked kernel.  Reports the
    # occupancy and both rates (slot + true-nnz); the 1M-row headline run
    # lives in benchmarks/unstructured.py / BENCHMARKS.md.  Self-bounding.
    unstructured = None
    if _time.time() - t0 < 420:
        try:
            from sigma_tpu.apps.generators import irregular_mesh_laplacian
            from sigma_tpu.matrix.banded import to_banded_dia
            from sigma_tpu.matrix.formats import CSRMatrix

            rng = np.random.default_rng(0)
            H, W = 8192, 64
            Au = irregular_mesh_laplacian(H, W, rng=rng, dtype=jnp.float32)
            nu = Au.shape[0]
            rr, cc, vv = Au.entries()
            sh = rng.permutation(nu)
            Au = CSRMatrix.from_coo(nu, nu, sh[rr], sh[cc], vv, dtype=jnp.float32)
            Du, pu = to_banded_dia(Au)
            nnz_u = Au.graph.nnz
            occ_u = nnz_u / (nu * Du.graph.n_diags)
            unst_samples = []
            true_rate = bench_spmv(Du, nnz_u, K1=30, K2=200, samples=unst_samples)
            unstructured = {
                "n": nu,
                "nnz": int(nnz_u),
                "n_diags": int(Du.graph.n_diags),
                "occupancy": round(occ_u, 5),
                "true_gnnz_s": round(true_rate / 1e9, 3),
                "slot_gnnz_s": round(true_rate / occ_u / 1e9, 1),
                "spread_true_gnnz_s": [
                    round(nnz_u / t / 1e9, 2) for t in unst_samples
                ],
                "kernel": "dia_spmv_pallas_chunked (RCM-banded, "
                "VMEM-sized diagonal slabs)",
            }
            _progress(
                f"unstructured {true_rate/1e9:.2f} Gnnz/s true "
                f"({true_rate/occ_u/1e9:.0f} slot) at occ {occ_u:.3f}", t0
            )
            if _time.time() - t0 < 480:
                # compounding storage tricks on the SAME banded matrix:
                # upper-only symmetric diagonals + bf16 values (~2.8x the
                # f32 full-storage true rate; pair with refined_solve for
                # f32-grade residuals, benchmarks/unstructured.py --bf16)
                from sigma_tpu.matrix.symmetric import SymmetricDIAMatrix

                Dsu = SymmetricDIAMatrix.from_dia(Du)
                Dsb = SymmetricDIAMatrix(
                    data=Dsu.data.astype(jnp.bfloat16),
                    offsets=Dsu.offsets,
                    n=nu,
                )
                symbf_rate = bench_spmv(Dsb, nnz_u, K1=60, K2=420)
                unstructured["sym_bf16_true_gnnz_s"] = round(
                    symbf_rate / 1e9, 3
                )
                unstructured["sym_bf16_speedup_vs_f32_full"] = round(
                    symbf_rate / true_rate, 2
                )
                _progress(
                    f"unstructured sym+bf16 {symbf_rate/1e9:.2f} Gnnz/s "
                    f"true ({symbf_rate/true_rate:.2f}x)", t0
                )
            if _time.time() - t0 < 520:
                # PRUNED block-DIA (round 4): only the active (row-tile x
                # diagonal) blocks stream — the occupancy attack on the
                # same matrix (benchmarks/pruned_sweep.py)
                from sigma_tpu.matrix.pruned import PrunedDIAMatrix

                # reuse the RCM permutation computed for the chunked row
                # (a second to_pruned_dia would redo RCM + the order
                # comparison on this page-fault-bound host)
                ru, cu, vu = Au.entries()
                Pu = PrunedDIAMatrix.from_coo(
                    nu, nu, pu[ru], pu[cu], vu, dtype=jnp.float32,
                    assume_unique=True,
                )
                # the pruned kernels are FAST at this size (~0.1-0.15 ms)
                # so a 240-iteration chain is launch-jitter scale; long
                # chains keep the slope fit out of the noise floor
                pr_rate = bench_spmv(Pu, nnz_u, K1=100, K2=700)
                unstructured["pruned_true_gnnz_s"] = round(pr_rate / 1e9, 3)
                unstructured["pruned_speedup_vs_chunked"] = round(
                    pr_rate / true_rate, 2
                )
                unstructured["pruned_local_occupancy"] = round(
                    nnz_u / Pu.stored_slots, 4
                )
                _progress(
                    f"unstructured pruned {pr_rate/1e9:.2f} Gnnz/s true "
                    f"({pr_rate/true_rate:.2f}x chunked)", t0
                )
                # pack at the bf16-native group (16): bf16 scales with
                # group (37/41/46 Gnnz/s at g8/16/24) — measuring the
                # f32 packing under-reports the format by ~20%
                Pb = PrunedDIAMatrix.from_coo(
                    nu, nu, pu[ru], pu[cu], vu, dtype=jnp.bfloat16,
                    assume_unique=True,
                )
                prb_rate = bench_spmv(Pb, nnz_u, K1=100, K2=700)
                unstructured["pruned_bf16_true_gnnz_s"] = round(
                    prb_rate / 1e9, 3
                )
                unstructured["pruned_bf16_speedup_vs_f32_full"] = round(
                    prb_rate / true_rate, 2
                )
                _progress(
                    f"unstructured pruned+bf16 {prb_rate/1e9:.2f} Gnnz/s "
                    f"true ({prb_rate/true_rate:.2f}x chunked)", t0
                )
                # SYMMETRIC pruned (round 5): upper-triangle packing +
                # in-kernel mirror — half the packed value stream
                # (benchmarks/pruned_sym_sweep.py)
                from sigma_tpu.matrix.pruned import SymmetricPrunedDIAMatrix

                Su = SymmetricPrunedDIAMatrix.from_coo(
                    nu, nu, pu[ru], pu[cu], vu, dtype=jnp.float32,
                    assume_unique=True, validate=False,
                )
                sp_rate = bench_spmv(Su, nnz_u, K1=100, K2=700)
                unstructured["pruned_sym_true_gnnz_s"] = round(
                    sp_rate / 1e9, 3
                )
                unstructured["pruned_sym_speedup_vs_pruned_full"] = round(
                    sp_rate / pr_rate, 2
                )
                _progress(
                    f"unstructured pruned-sym {sp_rate/1e9:.2f} Gnnz/s "
                    f"true ({sp_rate/pr_rate:.2f}x full pruned)", t0
                )
        except Exception as e:  # never let a detail row kill the artifact
            _progress(f"unstructured row failed: {e!r}", t0)
    else:
        _progress("skipping unstructured row (session too slow)", t0)

    # grouped-BSR slot rate (VERDICT r02 #3): synthetic block-banded
    # operator, (8,128) blocks, 67M stored slots — the block-dense format's
    # streaming rate in the scored artifact (prose number was 173).
    bsr = None
    if _time.time() - t0 < 480:
        try:
            from sigma_tpu.ops.bsr_pallas import GroupedBSR

            nb_rows, bh, bw, grp = 8192, 8, 128, 8
            nbc = nb_rows * bh // bw
            rngb = np.random.default_rng(1)
            grow_b = np.arange(nb_rows, dtype=np.int32)
            center = (grow_b.astype(np.int64) * bh) // bw
            gcols_b = np.clip(
                center[:, None] + rngb.integers(-4, 5, size=(nb_rows, grp)),
                0, nbc - 1,
            ).astype(np.int32)
            gdata_b = rngb.standard_normal(
                (nb_rows, bh, grp * bw)
            ).astype(np.float32)
            G = GroupedBSR(
                gdata=jnp.asarray(gdata_b),
                gcols=jnp.asarray(gcols_b),
                grow=jnp.asarray(grow_b),
                shape=(nb_rows * bh, nb_rows * bh),
                block_shape=(bh, bw),
                group=grp,
            )
            slots = int(gdata_b.size)
            bsr_samples = []
            bsr_rate = bench_spmv(G, slots, K1=50, K2=350, samples=bsr_samples)
            bsr = {
                "n": nb_rows * bh,
                "slots": slots,
                "block": [bh, bw],
                "bsr_slot_gnnz_s": round(bsr_rate / 1e9, 1),
                "spread_slot_gnnz_s": [
                    round(slots / t / 1e9, 1) for t in bsr_samples
                ],
                "path": "GroupedBSR XLA grouped form (default; see "
                "sigma_tpu/ops/bsr_pallas.py)",
            }
            _progress(f"bsr slot rate {bsr_rate/1e9:.0f} Gnnz/s", t0)
        except Exception as e:
            _progress(f"bsr row failed: {e!r}", t0)
    else:
        _progress("skipping bsr row (session too slow)", t0)

    # minimum possible traffic for DIA: each diagonal value read once (4B),
    # x read once and y written once per row (amortized over row degree).
    # HEADLINE DEFINITION (fixed in round 3, per VERDICT r02): the scored
    # value is the FULL-STORAGE f32 kernel against the FULL-STORAGE
    # speed-of-light — apples-to-apples with the >80%-of-SoL target and
    # with r01's headline.  Symmetric storage and bf16 values move the
    # same nnz off less HBM traffic; they are reported as labeled
    # effective-rate detail rows, NOT folded into the headline (scoring a
    # reduced-traffic kernel against full-traffic SoL conflates storage
    # savings with kernel speed — r02's 1.45 did exactly that).
    value = dia_nnz_s
    bytes_per_nnz = 4 + (4 + 4) * n / nnz
    achieved_gbps = value * bytes_per_nnz / 1e9

    # session gate: score against the spec bandwidth unless BOTH in-run
    # bandwidth witnesses — the streaming triad AND the bandwidth the SpMV
    # itself achieved — are far below spec.  (The triad alone once
    # mis-flagged a healthy session: it read 335 GB/s while the SpMV
    # streamed 727 GB/s — the kernel is the better witness of what the
    # session can do, and scoring a healthy session against a weak triad
    # would overstate vs_baseline ~2.7x.)
    session_bw = max(measured_bw, achieved_gbps)
    degraded = spec_bw is not None and session_bw < 0.6 * spec_bw
    bw = session_bw if (spec_bw is None or degraded) else spec_bw
    sol = bw * 1e9 / bytes_per_nnz
    target = 0.8 * sol
    vs_baseline = value / target
    if degraded or spec_bw is None:
        # scoring against the SpMV's own achieved bandwidth is circular
        # (it pins at 1/0.8 = 1.25 whenever the kernel beats the triad);
        # a degraded session — or an unknown device kind with no spec
        # entry, which takes the same session-bandwidth branch — may
        # claim at most "met the target"; beating it requires a healthy
        # session scored against a known spec
        vs_baseline = min(vs_baseline, 1.0)

    def _spread(s):
        return [round(nnz / x / 1e9, 1) for x in s]

    print(
        json.dumps(
            {
                "metric": "spmv_nnz_per_s",
                "value": round(value / 1e9, 4),
                "unit": "Gnnz/s",
                "vs_baseline": round(vs_baseline, 4),
                "detail": {
                    "device": kind,
                    "n": n,
                    "nnz": nnz,
                    "dia_gnnz_s": round(dia_nnz_s / 1e9, 4),
                    "dia_sym_gnnz_s": (
                        round(sym_nnz_s / 1e9, 4)
                        if sym_nnz_s is not None
                        else None
                    ),
                    "dia_bf16data_gnnz_s": (
                        round(bf16_nnz_s / 1e9, 4)
                        if bf16_nnz_s is not None
                        else None
                    ),
                    "dia_sym_bf16data_gnnz_s": (
                        round(symbf_nnz_s / 1e9, 4)
                        if symbf_nnz_s is not None
                        else None
                    ),
                    "spmm_interleaved_k8_geff": (
                        round(spmm_eff / 1e9, 4)
                        if spmm_eff is not None
                        else None
                    ),
                    "unstructured": unstructured,
                    "bsr": bsr,
                    "hbm_gbps_spec": spec_bw,
                    "hbm_gbps_triad_measured": round(measured_bw, 1),
                    "session_degraded": bool(degraded),
                    "session_note": (
                        (
                            "both in-run bandwidth witnesses (triad, spmv) << "
                            "spec: this tunnel session cannot stream at spec; "
                            "scored against the best witness"
                        )
                        if degraded
                        else (
                            f"in-run triad streamed {measured_bw:.0f} GB/s vs "
                            f"{spec_bw:.0f} GB/s spec; session judged healthy "
                            "because the better witness "
                            f"(max of triad and the SpMV's own "
                            f"{achieved_gbps:.0f} GB/s) cleared 60% of spec, "
                            "so the score is against spec"
                        )
                        if spec_bw is not None
                        else "no spec bandwidth known for this device kind; "
                        "scored against the in-run witness"
                    ),
                    "hbm_gbps_scored_against": round(bw, 1),
                    "speed_of_light_gnnz_s": round(sol / 1e9, 3),
                    "achieved_gbps_from_spmv": round(achieved_gbps, 1),
                    "spread": {
                        "dia_gnnz_s": _spread(dia_samples),
                        "dia_sym_gnnz_s": _spread(sym_samples),
                        "dia_bf16_gnnz_s": _spread(bf16_samples),
                        "dia_sym_bf16_gnnz_s": _spread(symbf_samples),
                        "spmm_k8_geff": [
                            round(8 * nnz / t / 1e9, 1)
                            for t in spmm_samples
                        ],
                        "triad_gbps": [
                            round(3 * 4 * 16_777_216 / t / 1e9, 1)
                            for t in triad_samples
                        ],
                    },
                    "kernel": "dia_spmv_pallas_blocked "
                    "(full-storage f32; zero-construction clamped-halo "
                    "BlockSpecs; see sigma_tpu/ops/spmv_pallas.py); "
                    "headline = full-storage kernel vs full-storage SoL "
                    "(r03 definition; sym/bf16 are effective-rate detail "
                    "rows)",
                },
            }
        )
    )


if __name__ == "__main__":
    main()
