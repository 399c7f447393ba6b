"""Pallas DIA SpMV kernel tests (interpret mode on CPU; the real Mosaic
lowering is exercised on TPU, where it was validated at 1e-7 f32 relative
error on banded systems up to 2.1M rows)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sigma_tpu import DIAMatrix
from sigma_tpu.ops import dia_spmv_pallas, pallas_supported


def _run(dA, n):
    A = DIAMatrix.from_dense(dA)
    x = np.random.default_rng(0).standard_normal(n).astype(np.float32)
    y = dia_spmv_pallas(
        A.data.astype(jnp.float32),
        jnp.asarray(x),
        A.graph.offsets,
        n,
        n,
        interpret=jax.default_backend() != "tpu",
    )
    ref = dA @ x
    return np.max(np.abs(np.asarray(y) - ref)) / max(1.0, np.max(np.abs(ref)))


def test_tridiagonal():
    n = 300
    dA = (
        np.diag(np.full(n, 3.0))
        + np.diag(np.full(n - 1, -1.0), 1)
        + np.diag(np.full(n - 1, -1.0), -1)
    )
    assert _run(dA, n) < 1e-6


def test_wide_offsets():
    n = 700
    rng = np.random.default_rng(1)
    dA = np.diag(rng.standard_normal(n))
    for o in (1, -1, 130, -130, 257, -399):
        dA += np.diag(rng.standard_normal(n - abs(o)), o)
    assert _run(dA, n) < 1e-6


def test_unaligned_n():
    n = 333  # not a multiple of 128
    rng = np.random.default_rng(2)
    dA = np.diag(rng.standard_normal(n)) + np.diag(rng.standard_normal(n - 5), 5)
    assert _run(dA, n) < 1e-6


def test_pallas_supported_gate():
    # CPU test environment: not supported (falls back).  Backend gate
    # only — size/shape routing lives in each format's why_not_pallas
    if jax.default_backend() != "tpu":
        assert not pallas_supported()


def test_large_x_dma_path_interpret(monkeypatch):
    """The windowed-DMA variant (x in HBM, per-tile window DMA) is
    semantically validated in the interpreter; on-hardware it is opt-in
    (manual-DMA kernels fault the axon runtime stack)."""
    import sigma_tpu.ops.spmv_pallas as sp

    monkeypatch.setattr(sp, "_MAX_X_ELEMS", 1)  # force the DMA path
    n = 1500
    rng = np.random.default_rng(5)
    dA = (
        np.diag(rng.standard_normal(n))
        + np.diag(rng.standard_normal(n - 1), 1)
        + np.diag(rng.standard_normal(n - 300), -300)
    )
    A = DIAMatrix.from_dense(dA)
    x = rng.standard_normal(n).astype(np.float32)
    y = sp.dia_spmv_pallas(
        A.data.astype(jnp.float32), jnp.asarray(x), A.graph.offsets, n, n,
        interpret=True, allow_dma_path=True,
    )
    ref = dA @ x
    assert np.max(np.abs(np.asarray(y) - ref)) / np.max(np.abs(ref)) < 1e-6


@pytest.mark.parametrize(
    "n,diags",
    [
        (200_000, [0, 1, -1, 300, -300, 2500, -2500]),  # multi-tile + halos
        (133_337, [0, 5, -7, 999]),  # unaligned n, odd offsets
        (70_000, [0]),  # single diagonal, tail-only remainder
    ],
)
def test_blocked_kernel_interpret(n, diags, monkeypatch):
    """The blocked overlapping-window kernel (the default large-x path on
    hardware; no manual DMA) vs a dense-diagonal oracle — small tile size
    forced so a few hundred K rows exercise many tiles + the XLA tail."""
    import sigma_tpu.ops.spmv_pallas as sp

    monkeypatch.setattr(
        sp, "_full_tile_pick",
        lambda S, hrows, D, isz: (
            64,
            next(e for e in range(8, 65, 8) if e >= hrows and 64 % e == 0),
        ),
    )
    rng = np.random.default_rng(7)
    stride = -(-n // 128) * 128
    data = np.zeros((len(diags), stride), np.float32)
    for d, o in enumerate(diags):
        lo, hi = max(0, -o), min(n, n - o)
        data[d, lo:hi] = rng.standard_normal(hi - lo)
    x = rng.standard_normal(n).astype(np.float32)
    y = sp.dia_spmv_pallas_blocked(
        jnp.asarray(data), jnp.asarray(x), tuple(diags), n, n, interpret=True
    )
    ref = np.zeros(n, np.float32)
    for d, o in enumerate(diags):
        lo, hi = max(0, -o), min(n, n - o)
        ref[lo:hi] += data[d, lo:hi] * x[lo + o : hi + o]
    assert np.max(np.abs(np.asarray(y) - ref)) / np.max(np.abs(ref)) < 1e-5


@pytest.mark.parametrize(
    "n,m,diags",
    [
        (90_000, 70_123, [0, 4, -300, 2000]),  # tall: x frame shorter
        (70_123, 90_000, [0, -4, 300, 2000]),  # wide: x beyond last row
    ],
)
def test_blocked_kernel_rectangular_interpret(n, m, diags, monkeypatch):
    """Rectangular DIA (AMG restriction/prolongation shapes) through the
    zero-construction blocked kernel: the clamped x-tile index maps and
    intended-index masks must handle an x frame shorter or longer than
    the output grid."""
    import sigma_tpu.ops.spmv_pallas as sp

    monkeypatch.setattr(
        sp, "_full_tile_pick",
        lambda S, hrows, D, isz: (
            64,
            next(e for e in range(8, 65, 8) if e >= hrows and 64 % e == 0),
        ),
    )
    rng = np.random.default_rng(13)
    stride = -(-n // 128) * 128
    data = np.zeros((len(diags), stride), np.float32)
    for d, o in enumerate(diags):
        lo = max(0, -o)
        hi = min(n, m - o)
        if hi > lo:
            data[d, lo:hi] = rng.standard_normal(hi - lo)
    x = rng.standard_normal(m).astype(np.float32)
    y = sp.dia_spmv_pallas_blocked(
        jnp.asarray(data), jnp.asarray(x), tuple(diags), n, m, interpret=True
    )
    ref = np.zeros(n, np.float64)
    for d, o in enumerate(diags):
        lo = max(0, -o)
        hi = min(n, m - o)
        if hi > lo:
            ref[lo:hi] += data[d, lo:hi].astype(np.float64) * x[lo + o : hi + o]
    assert np.max(np.abs(np.asarray(y) - ref)) / max(np.max(np.abs(ref)), 1e-30) < 1e-5


def test_chunk_plan_invariants():
    """Greedy-divisor chunking: every start divisible by its width (the
    BlockSpec slab-addressing requirement), widths within the cap, full
    contiguous coverage, and no more chunks than the power-of-two split
    would need."""
    from sigma_tpu.ops.spmv_pallas import chunk_plan

    for D in (1, 2, 3, 7, 37, 129, 243, 260, 1000):
        offs = tuple(range(-(D // 2), D - D // 2))
        plan = chunk_plan(offs, 4096, 4, max_chunk=32)
        assert plan is not None
        assert sum(w for _, w in plan) == D
        starts = [s for s, _ in plan]
        widths = [w for _, w in plan]
        assert starts[0] == 0
        for (s, w) in plan:
            assert 1 <= w <= 32
            assert s % w == 0
        assert all(
            starts[i] + widths[i] == starts[i + 1]
            for i in range(len(plan) - 1)
        )
        assert len(plan) <= D // 32 + 6  # pow2 tail is at most log2 chunks
    # the motivating case: 243 diagonals at cap 64 -> 5 chunks, not 7
    offs = tuple(range(-121, 122))
    plan = chunk_plan(offs, 9000, 4, max_chunk=64)
    assert plan == [(0, 64), (64, 64), (128, 64), (192, 48), (240, 3)]


def test_chunked_wide_band_interpret(monkeypatch):
    """The chunked wide-band path (the unstructured/banded-general route:
    RCM -> to_banded_dia -> chunked blocked kernel) vs a dense-diagonal
    oracle, with max_chunk forcing several slabs so the BlockSpec
    dstart addressing and the partial-product sum are both exercised."""
    import sigma_tpu.ops.spmv_pallas as sp

    monkeypatch.setattr(
        sp, "_full_tile_pick",
        lambda S, hrows, D, isz: (
            64,
            next(e for e in range(8, 65, 8) if e >= hrows and 64 % e == 0),
        ),
    )
    rng = np.random.default_rng(23)
    n = 150_000
    # 21 irregular offsets spread over a +-2900 band, stored sorted (the
    # to_banded_dia layout)
    diags = sorted(
        {0, 1, -1, 7, -13}
        | set(int(v) for v in rng.integers(-2900, 2900, 16))
    )
    stride = -(-n // 128) * 128
    data = np.zeros((len(diags), stride), np.float32)
    for d, o in enumerate(diags):
        lo, hi = max(0, -o), min(n, n - o)
        data[d, lo:hi] = rng.standard_normal(hi - lo)
    x = rng.standard_normal(n).astype(np.float32)
    y = sp.dia_spmv_pallas_chunked(
        jnp.asarray(data), jnp.asarray(x), tuple(diags), n, n,
        interpret=True, max_chunk=8,
    )
    ref = np.zeros(n, np.float64)
    for d, o in enumerate(diags):
        lo, hi = max(0, -o), min(n, n - o)
        ref[lo:hi] += data[d, lo:hi].astype(np.float64) * x[lo + o : hi + o]
    assert np.max(np.abs(np.asarray(y) - ref)) / np.max(np.abs(ref)) < 1e-4


def test_chunked_sym_wide_band_interpret(monkeypatch):
    """Chunked SYMMETRIC wide-band SpMV (upper-only storage of an
    RCM-banded SPD matrix) vs a dense oracle: each slab must produce both
    its direct and mirror terms."""
    import sigma_tpu.ops.spmv_pallas as sp

    monkeypatch.setattr(
        sp, "_sym_tile_pick",
        lambda S, hrows, D, isz: (
            64,
            next(e for e in range(8, 65, 8) if e >= hrows and 64 % e == 0),
        ),
    )
    rng = np.random.default_rng(41)
    n = 110_000
    offsets = sorted({0, 1, 5} | set(int(v) for v in rng.integers(1, 2200, 11)))
    stride = -(-n // 128) * 128
    data = np.zeros((len(offsets), stride), np.float32)
    for d, o in enumerate(offsets):
        data[d, : n - o] = rng.standard_normal(n - o)
    x = rng.standard_normal(n).astype(np.float32)
    y = sp.dia_sym_spmv_pallas_chunked(
        jnp.asarray(data), jnp.asarray(x), tuple(offsets), n,
        interpret=True, max_chunk=4,
    )
    ref = np.zeros(n, np.float64)
    for d, o in enumerate(offsets):
        ref[: n - o] += data[d, : n - o].astype(np.float64) * x[o:n]
        if o > 0:
            ref[o:n] += data[d, : n - o].astype(np.float64) * x[: n - o]
    assert np.max(np.abs(np.asarray(y) - ref)) / np.max(np.abs(ref)) < 1e-4


def test_chunked_wide_band_spmm_interpret(monkeypatch):
    """Chunked wide-band multi-RHS SpMM (the block-solver path on
    RCM-banded general matrices) vs a dense-diagonal oracle."""
    import sigma_tpu.ops.spmv_pallas as sp

    monkeypatch.setattr(
        sp, "_spmm_tile_pick",
        lambda S, hrows, D, isz, k: (
            64,
            next(e for e in range(8, 65, 8) if e >= hrows and 64 % e == 0),
        ),
    )
    rng = np.random.default_rng(31)
    n, k = 120_000, 3
    diags = sorted(
        {0, 2, -3} | set(int(v) for v in rng.integers(-1900, 1900, 12))
    )
    stride = -(-n // 128) * 128
    data = np.zeros((len(diags), stride), np.float32)
    for d, o in enumerate(diags):
        lo, hi = max(0, -o), min(n, n - o)
        data[d, lo:hi] = rng.standard_normal(hi - lo)
    X = rng.standard_normal((n, k)).astype(np.float32)
    Y = sp.dia_spmm_pallas_chunked(
        jnp.asarray(data), jnp.asarray(X), tuple(diags), n, n,
        interpret=True, max_chunk=4,
    )
    ref = np.zeros((n, k), np.float64)
    for d, o in enumerate(diags):
        lo, hi = max(0, -o), min(n, n - o)
        ref[lo:hi] += data[d, lo:hi, None].astype(np.float64) * X[lo + o : hi + o]
    assert np.max(np.abs(np.asarray(Y) - ref)) / np.max(np.abs(ref)) < 1e-4


@pytest.mark.parametrize(
    "n,diags,k",
    [
        (150_000, [0, 1, -1, 300, -300], 4),
        (93_333, [0, 5, -7, 999], 3),
    ],
)
def test_blocked_spmm_interpret(n, diags, k, monkeypatch):
    """Multi-RHS blocked SpMM kernel vs oracle (small tiles force many
    tiles + the XLA tail)."""
    import sigma_tpu.ops.spmv_pallas as sp

    monkeypatch.setattr(
        sp, "_spmm_tile_pick",
        lambda S, hrows, D, isz, k=1: (
            64,
            next(e for e in range(8, 65, 8) if e >= hrows and 64 % e == 0),
        ),
    )
    rng = np.random.default_rng(11)
    stride = -(-n // 128) * 128
    data = np.zeros((len(diags), stride), np.float32)
    for d, o in enumerate(diags):
        lo, hi = max(0, -o), min(n, n - o)
        data[d, lo:hi] = rng.standard_normal(hi - lo)
    X = rng.standard_normal((n, k)).astype(np.float32)
    Y = sp.dia_spmm_pallas_blocked(
        jnp.asarray(data), jnp.asarray(X), tuple(diags), n, n, interpret=True
    )
    ref = np.zeros((n, k), np.float32)
    for d, o in enumerate(diags):
        lo, hi = max(0, -o), min(n, n - o)
        ref[lo:hi] += data[d, lo:hi, None] * X[lo + o : hi + o]
    assert np.max(np.abs(np.asarray(Y) - ref)) / np.max(np.abs(ref)) < 1e-5


@pytest.mark.parametrize(
    "n,offsets,T,E",
    [
        (4000, (0, 1, 128, 300), 16, 8),   # all lane patterns + XLA tail
        (4096, (0, 5), 16, 8),             # no tail (grid covers exactly n)
        (5000, (1, 130, 259), 24, 8),      # no main diagonal
        (3000, (0,), 8, 8),                # diagonal only, E == T
        (9000, (0, 2, 127, 129, 383), 32, 16),
    ],
)
def test_sym_blocked_kernel_interpret(n, offsets, T, E):
    """Symmetric (upper-diagonals-only) blocked kernel vs a dense
    symmetric oracle — tiny explicit tiles force many grid steps, the
    cross-tile mirror spill carry, and the XLA tail."""
    import sigma_tpu.ops.spmv_pallas as sp

    rng = np.random.default_rng(13)
    stride = -(-n // 128) * 128
    data = np.zeros((len(offsets), stride), np.float32)
    for d, o in enumerate(offsets):
        data[d, : n - o] = rng.standard_normal(n - o)
    x = rng.standard_normal(n).astype(np.float32)
    dA = np.zeros((n, n))
    for d, o in enumerate(offsets):
        idx = np.arange(n - o)
        dA[idx, idx + o] = data[d, : n - o]
        if o > 0:
            dA[idx + o, idx] = data[d, : n - o]
    y = sp.dia_sym_spmv_pallas_blocked(
        jnp.asarray(data), jnp.asarray(x), offsets, n,
        interpret=True, tile_rows=T, halo_rows=E,
    )
    ref = dA @ x
    assert (
        np.max(np.abs(np.asarray(y, np.float64) - ref)) / np.max(np.abs(ref))
        < 1e-5
    )


def test_symmetric_matrix_pallas_gate_cpu():
    """On CPU the SymmetricDIAMatrix pallas gate must decline (falls back
    to the XLA window path) and matvec must still be exact."""
    from sigma_tpu.matrix.symmetric import SymmetricDIAMatrix

    n = 500
    rng = np.random.default_rng(17)
    dA = np.diag(rng.standard_normal(n))
    for o in (1, 7):
        v = rng.standard_normal(n - o)
        dA += np.diag(v, o) + np.diag(v, -o)
    A = SymmetricDIAMatrix.from_dense(dA)
    x = rng.standard_normal(n).astype(np.float64)
    assert A._pallas_path(jnp.asarray(x, jnp.float32)) is None
    y = A.matvec(jnp.asarray(x))
    assert np.max(np.abs(np.asarray(y) - dA @ x)) < 1e-10


@pytest.mark.parametrize(
    "n,offsets,k",
    [
        (3000, (0, 1, 128, 300), 3),
        (4096, (0, 5), 4),
        (5000, (1, 130, 259), 2),  # no main diagonal
    ],
)
def test_sym_blocked_spmm_interpret(n, offsets, k):
    """Symmetric multi-RHS kernel vs a dense symmetric oracle (RHS-major
    in and out)."""
    import sigma_tpu.ops.spmv_pallas as sp

    rng = np.random.default_rng(17)
    stride = -(-n // 128) * 128
    data = np.zeros((len(offsets), stride), np.float32)
    for d, o in enumerate(offsets):
        data[d, : n - o] = rng.standard_normal(n - o)
    XT = rng.standard_normal((k, n)).astype(np.float32)
    # tiny tiles via the pick monkeypatch are unnecessary: explicit small
    # shapes already exercise several grid steps with the default pick
    import unittest.mock as mock

    with mock.patch.object(
        sp, "_sym_spmm_tile_pick",
        lambda S, hrows, D, isz, kk: (
            64,
            next(e for e in range(8, 65, 8) if e >= hrows and 64 % e == 0),
        ),
    ):
        Y = sp.dia_sym_spmm_rhs_major(
            jnp.asarray(data), jnp.asarray(XT), tuple(offsets), n,
            interpret=True,
        )
    dense = np.zeros((n, n))
    for d, o in enumerate(offsets):
        i = np.arange(n - o)
        dense[i, i + o] = data[d, : n - o]
        if o > 0:
            dense[i + o, i] = data[d, : n - o]
    ref = dense @ XT.T.astype(np.float64)
    err = np.max(np.abs(np.asarray(Y).T - ref)) / np.max(np.abs(ref))
    assert err < 1e-5


def test_interleave_roundtrip():
    """interleave_panels/deinterleave_panels are exact inverses, with
    zero padding past m."""
    import sigma_tpu.ops.spmv_pallas as sp

    rng = np.random.default_rng(23)
    for k, m in ((1, 640), (4, 1000), (3, 127)):
        XT = rng.standard_normal((k, m)).astype(np.float32)
        XI = sp.interleave_panels(jnp.asarray(XT), m)
        Sx = -(-m // 128)
        assert XI.shape == (k * Sx, 128)
        # row s*k + j holds elements s*128.. of panel j
        xi = np.asarray(XI)
        for j in range(k):
            flat = xi[j::k].reshape(-1)
            assert np.array_equal(flat[:m], XT[j])
            assert not flat[m:].any()
        back = np.asarray(sp.deinterleave_panels(XI, k, m))
        assert np.array_equal(back, XT)


@pytest.mark.parametrize(
    "n,diags,k",
    [
        (150_000, [0, 1, -1, 300, -300], 4),
        (93_333, [0, 5, -7, 999], 3),
        (120_000, [0, -2, 131], 1),
    ],
)
def test_interleaved_spmm_interpret(n, diags, k, monkeypatch):
    """Interleaved-panel SpMM kernel vs oracle: the fast multi-RHS layout
    (panels folded into sublanes so every grid step moves contiguous
    blocks — benchmarks/spmm_probe4.py measured panel-separate layouts
    2.3x slower from DMA chunking alone)."""
    import sigma_tpu.ops.spmv_pallas as sp

    monkeypatch.setattr(
        sp, "_spmm_tile_pick",
        lambda S, hrows, D, isz, k=1: (
            64,
            next(e for e in range(8, 65, 8) if e >= hrows and 64 % e == 0),
        ),
    )
    rng = np.random.default_rng(29)
    stride = -(-n // 128) * 128
    data = np.zeros((len(diags), stride), np.float32)
    for d, o in enumerate(diags):
        lo, hi = max(0, -o), min(n, n - o)
        data[d, lo:hi] = rng.standard_normal(hi - lo)
    XT = rng.standard_normal((k, n)).astype(np.float32)
    XI = sp.interleave_panels(jnp.asarray(XT), n)
    YI = sp.dia_spmm_interleaved(
        jnp.asarray(data), XI, tuple(diags), n, n, interpret=True
    )
    Y = np.asarray(sp.deinterleave_panels(YI, k, n))
    ref = np.zeros((k, n), np.float32)
    for d, o in enumerate(diags):
        lo, hi = max(0, -o), min(n, n - o)
        ref[:, lo:hi] += data[None, d, lo:hi] * XT[:, lo + o : hi + o]
    assert np.max(np.abs(Y - ref)) / np.max(np.abs(ref)) < 1e-5


@pytest.mark.parametrize(
    "n,offsets,k",
    [
        (3000, (0, 1, 128, 300), 3),
        (4096, (0, 5), 4),
        (5000, (1, 130, 259), 2),  # no main diagonal
    ],
)
def test_sym_interleaved_spmm_interpret(n, offsets, k):
    """Symmetric interleaved-panel SpMM vs a dense symmetric oracle."""
    import unittest.mock as mock

    import sigma_tpu.ops.spmv_pallas as sp

    rng = np.random.default_rng(31)
    stride = -(-n // 128) * 128
    data = np.zeros((len(offsets), stride), np.float32)
    for d, o in enumerate(offsets):
        data[d, : n - o] = rng.standard_normal(n - o)
    XT = rng.standard_normal((k, n)).astype(np.float32)
    XI = sp.interleave_panels(jnp.asarray(XT), n)
    with mock.patch.object(
        sp, "_sym_spmm_tile_pick",
        lambda S, hrows, D, isz, kk: (
            64,
            next(e for e in range(8, 65, 8) if e >= hrows and 64 % e == 0),
        ),
    ):
        YI = sp.dia_sym_spmm_interleaved(
            jnp.asarray(data), XI, tuple(offsets), n, interpret=True
        )
    Y = np.asarray(sp.deinterleave_panels(YI, k, n))
    dense = np.zeros((n, n))
    for d, o in enumerate(offsets):
        i = np.arange(n - o)
        dense[i, i + o] = data[d, : n - o]
        if o > 0:
            dense[i + o, i] = data[d, : n - o]
    ref = (dense @ XT.T.astype(np.float64)).T
    assert np.max(np.abs(Y - ref)) / np.max(np.abs(ref)) < 1e-5


def test_matmat_interleaved_cpu_fallback():
    """On CPU DIAMatrix.matmat_interleaved falls back through matmat and
    stays layout-consistent with interleave_panels(matmat(X).T)."""
    from sigma_tpu import DIAMatrix
    import sigma_tpu.ops.spmv_pallas as sp

    n, k = 700, 3
    rng = np.random.default_rng(37)
    dA = np.diag(rng.standard_normal(n))
    v = rng.standard_normal(n - 1)
    dA += np.diag(v, 1) + np.diag(v, -1)
    A = DIAMatrix.from_dense(dA)
    XT = rng.standard_normal((k, n))
    XI = sp.interleave_panels(jnp.asarray(XT), n)
    YI = A.matmat_interleaved(XI)
    Y = np.asarray(sp.deinterleave_panels(YI, k, n))
    ref = (dA @ XT.T).T
    assert np.max(np.abs(Y - ref)) < 1e-10


def test_symmetric_wide_band_scan_path(rng):
    """SymmetricDIAMatrix at > _SCAN_THRESHOLD upper diagonals takes the
    O(1)-program-size scan path on CPU; dense oracle."""
    from sigma_tpu.matrix.symmetric import SymmetricDIAMatrix

    n = 700
    dense = np.zeros((n, n))
    offs = sorted({0} | set(int(v) for v in rng.integers(1, 90, 40)))
    assert len(offs) > 24
    for o in offs:
        v = rng.standard_normal(n - o)
        dense[np.arange(n - o), np.arange(n - o) + o] = v
        if o:
            dense[np.arange(n - o) + o, np.arange(n - o)] = v
    A = SymmetricDIAMatrix.from_dense(dense)
    x = rng.standard_normal(n)
    y = np.asarray(A.matvec(jnp.asarray(x)))
    assert np.max(np.abs(y - dense @ x)) < 1e-11 * max(
        1.0, np.abs(dense @ x).max()
    )


def test_symmetric_why_not_pallas(monkeypatch):
    from sigma_tpu.matrix.symmetric import SymmetricDIAMatrix

    n = 70_000
    i = np.arange(n)
    rows = np.concatenate([i, i[:-1], i[1:]])
    cols = np.concatenate([i, i[1:], i[:-1]])
    A = SymmetricDIAMatrix.from_coo(
        n, n, rows, cols, np.ones(rows.size), dtype=jnp.float32
    )
    assert "backend" in A.why_not_pallas()
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    assert A.why_not_pallas() is None
    assert A.why_not_pallas("matmat", k=4) is None
    assert "1..16" in A.why_not_pallas("matmat", k=40)
    assert "float" in A.why_not_pallas(dtype=jnp.float64)


def test_chunked_sym_spmm_interpret(monkeypatch):
    """Chunked SYMMETRIC wide-band multi-RHS SpMM vs a dense oracle."""
    import sigma_tpu.ops.spmv_pallas as sp

    monkeypatch.setattr(
        sp, "_sym_spmm_tile_pick",
        lambda S, hrows, D, isz, k: (
            64,
            next(e for e in range(8, 65, 8) if e >= hrows and 64 % e == 0),
        ),
    )
    rng = np.random.default_rng(47)
    n, k = 100_000, 3
    offsets = sorted({0, 2} | set(int(v) for v in rng.integers(1, 1700, 9)))
    stride = -(-n // 128) * 128
    data = np.zeros((len(offsets), stride), np.float32)
    for d, o in enumerate(offsets):
        data[d, : n - o] = rng.standard_normal(n - o)
    XT = rng.standard_normal((k, n)).astype(np.float32)
    Y = sp.dia_sym_spmm_rhs_major_chunked(
        jnp.asarray(data), jnp.asarray(XT), tuple(offsets), n,
        interpret=True, max_chunk=4,
    )
    ref = np.zeros((k, n))
    for d, o in enumerate(offsets):
        ref[:, : n - o] += data[d, : n - o].astype(np.float64) * XT[:, o:]
        if o:
            ref[:, o:] += data[d, : n - o].astype(np.float64) * XT[:, : n - o]
    assert np.max(np.abs(np.asarray(Y) - ref)) / np.max(np.abs(ref)) < 1e-4


def test_symmetric_wide_band_matmat_scan(rng):
    """Wide sym band matmat takes the scan path on CPU; dense oracle."""
    from sigma_tpu.matrix.symmetric import SymmetricDIAMatrix

    n, k = 600, 3
    dense = np.zeros((n, n))
    offs = sorted({0} | set(int(v) for v in rng.integers(1, 80, 35)))
    assert len(offs) > 24
    for o in offs:
        v = rng.standard_normal(n - o)
        dense[np.arange(n - o), np.arange(n - o) + o] = v
        if o:
            dense[np.arange(n - o) + o, np.arange(n - o)] = v
    A = SymmetricDIAMatrix.from_dense(dense)
    X = rng.standard_normal((n, k))
    Y = np.asarray(A.matmat(jnp.asarray(X)))
    assert np.max(np.abs(Y - dense @ X)) < 1e-11 * max(
        1.0, np.abs(dense @ X).max()
    )


def test_grouped_interleave_roundtrip():
    """interleave_panels_grouped/deinterleave_panels_grouped are exact
    inverses, with zero padding past m and past k up to KO*kb panels."""
    import sigma_tpu.ops.spmv_pallas as sp

    rng = np.random.default_rng(37)
    for kb, k, m in ((16, 40, 640), (8, 20, 1000), (16, 17, 127)):
        XT = rng.standard_normal((k, m)).astype(np.float32)
        XG = sp.interleave_panels_grouped(jnp.asarray(XT), kb, m)
        Sx = -(-m // 128)
        KO = -(-k // kb)
        assert XG.shape == (KO, kb * Sx, 128)
        xg = np.asarray(XG)
        for j in range(k):
            flat = xg[j // kb, j % kb :: kb].reshape(-1)
            assert np.array_equal(flat[:m], XT[j])
            assert not flat[m:].any()
        # padding panels are zero
        for j in range(k, KO * kb):
            assert not xg[j // kb, j % kb :: kb].any()
        back = np.asarray(sp.deinterleave_panels_grouped(XG, kb, k, m))
        assert np.array_equal(back, XT)


@pytest.mark.parametrize(
    "n,diags,k,kb",
    [
        (60_000, [0, 1, -1, 300, -300], 40, 16),
        (49_999, [0, 5, -7, 999], 20, 8),
        (50_001, [0, -2, 131], 17, 16),
    ],
)
def test_grouped_spmm_interpret(n, diags, k, kb, monkeypatch):
    """Two-level grouped-interleaved SpMM kernel vs oracle: k > 16
    right-hand sides with the diagonal values streamed once (the outer
    grid axis revisits each data tile)."""
    import sigma_tpu.ops.spmv_pallas as sp

    monkeypatch.setattr(
        sp, "_spmm_tile_pick",
        lambda S, hrows, D, isz, k=1: (
            64,
            next(e for e in range(8, 65, 8) if e >= hrows and 64 % e == 0),
        ),
    )
    rng = np.random.default_rng(41)
    stride = -(-n // 128) * 128
    data = np.zeros((len(diags), stride), np.float32)
    for d, o in enumerate(diags):
        lo, hi = max(0, -o), min(n, n - o)
        data[d, lo:hi] = rng.standard_normal(hi - lo)
    XT = rng.standard_normal((k, n)).astype(np.float32)
    XG = sp.interleave_panels_grouped(jnp.asarray(XT), kb, n)
    YG = sp.dia_spmm_grouped(
        jnp.asarray(data), XG, tuple(diags), n, n, interpret=True
    )
    Y = np.asarray(sp.deinterleave_panels_grouped(YG, kb, k, n))
    ref = np.zeros((k, n), np.float32)
    for d, o in enumerate(diags):
        lo, hi = max(0, -o), min(n, n - o)
        ref[:, lo:hi] += data[None, d, lo:hi] * XT[:, lo + o : hi + o]
    assert np.max(np.abs(Y - ref)) / np.max(np.abs(ref)) < 1e-5


def test_grouped_spmm_chunked_interpret(monkeypatch):
    """Chunked grouped SpMM: a wide band in diagonal slabs, each slab's
    values streamed once for all k = KO*kb right-hand sides."""
    import sigma_tpu.ops.spmv_pallas as sp

    monkeypatch.setattr(
        sp, "_spmm_tile_pick",
        lambda S, hrows, D, isz, k=1: (
            (64, next(e for e in range(8, 65, 8) if e >= hrows and 64 % e == 0))
            if D <= 4
            else None
        ),
    )
    rng = np.random.default_rng(43)
    n = 50_000
    diags = sorted({0, 1, -1, 2, -2, 64, -64, 129, -129, 300, -300, 511})
    k, kb = 24, 8
    stride = -(-n // 128) * 128
    data = np.zeros((len(diags), stride), np.float32)
    for d, o in enumerate(diags):
        lo, hi = max(0, -o), min(n, n - o)
        data[d, lo:hi] = rng.standard_normal(hi - lo)
    XT = rng.standard_normal((k, n)).astype(np.float32)
    XG = sp.interleave_panels_grouped(jnp.asarray(XT), kb, n)
    plan = sp.chunk_plan(tuple(diags), stride // 128, 4, k=kb)
    assert plan is not None and len(plan) > 1  # genuinely slabbed
    YG = sp.dia_spmm_grouped_chunked(
        jnp.asarray(data), XG, tuple(diags), n, n, interpret=True
    )
    Y = np.asarray(sp.deinterleave_panels_grouped(YG, kb, k, n))
    ref = np.zeros((k, n), np.float32)
    for d, o in enumerate(diags):
        lo, hi = max(0, -o), min(n, n - o)
        ref[:, lo:hi] += data[None, d, lo:hi] * XT[:, lo + o : hi + o]
    assert np.max(np.abs(Y - ref)) / np.max(np.abs(ref)) < 1e-5


def test_grouped_routing_model(monkeypatch):
    """DIAMatrix routes k > 16 SpMM through the grouped kernel exactly
    when the traffic model says the saved value re-streams beat the
    layout transposes — wide bands yes, the 7-pt stencil never — and
    the routed product matches the XLA fallback."""
    import unittest.mock as mock

    import sigma_tpu.ops.spmv_pallas as sp
    from sigma_tpu.graph.graph import DIAGraph
    from sigma_tpu.matrix.formats import DIAMatrix

    def make_dia(data, diags, n):
        g = DIAGraph(
            offsets=tuple(diags),
            shape=(n, n),
            nnz=sum(n - abs(o) for o in diags),
        )
        return DIAMatrix.from_graph(
            g, jnp.asarray(data).reshape(len(diags), -1, 128)
        )

    rng = np.random.default_rng(47)
    n = 70_000  # above _PALLAS_MIN_ELEMS so the model gate decides
    # narrow band: model must decline (P-1)*D*4 <= 16*k
    diags7 = [0, 1, -1, 216, -216, 4096, -4096]
    stride = -(-n // 128) * 128
    d7 = np.zeros((len(diags7), stride), np.float32)
    for d, o in enumerate(diags7):
        lo, hi = max(0, -o), min(n, n - o)
        d7[d, lo:hi] = rng.standard_normal(hi - lo)
    A7 = make_dia(d7, diags7, n)
    with mock.patch.object(jax, "default_backend", lambda: "tpu"):
        assert A7._pallas_spmm_grouped(jnp.zeros((32, n), jnp.float32)) is None

    # wide band: model accepts; run the kernel in interpret mode on CPU
    diags = sorted(set(
        [0] + [int(o) for o in rng.integers(1, 512, 60)]
        + [-int(o) for o in rng.integers(1, 512, 60)]
    ))
    data = np.zeros((len(diags), stride), np.float32)
    for d, o in enumerate(diags):
        lo, hi = max(0, -o), min(n, n - o)
        data[d, lo:hi] = rng.standard_normal(hi - lo)
    A = make_dia(data, diags, n)
    XT = rng.standard_normal((20, n)).astype(np.float32)
    oracle = np.asarray(A.matmat(jnp.asarray(XT.T))).T  # XLA path (CPU)
    orig_g = sp.dia_spmm_grouped
    orig_c = sp.dia_spmm_grouped_chunked
    with mock.patch.object(jax, "default_backend", lambda: "tpu"), \
         mock.patch.object(
             sp, "dia_spmm_grouped",
             lambda *a, **kw: orig_g(*a, **{**kw, "interpret": True}),
         ), \
         mock.patch.object(
             sp, "dia_spmm_grouped_chunked",
             lambda *a, **kw: orig_c(*a, **{**kw, "interpret": True}),
         ):
        Y = A._pallas_spmm_grouped(jnp.asarray(XT))
    assert Y is not None and Y.shape == (20, n)
    err = np.max(np.abs(np.asarray(Y) - oracle)) / np.max(np.abs(oracle))
    assert err < 1e-5
