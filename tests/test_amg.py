"""Smoothed-aggregation AMG tests — the multilevel composition the
reference's solver/pc unification was designed for (src/solver/README.md),
built from this framework's own PtAP + SpGEMM + Jacobi pieces."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sigma_tpu import CSRMatrix
from sigma_tpu.solvers import cg_solve, smoothed_aggregation_amg
from sigma_tpu.solvers.amg import greedy_aggregate


from conftest import laplacian_2d  # noqa: E402


def test_aggregation_covers_all(rng):
    A = CSRMatrix.from_dense(laplacian_2d(12))
    agg = greedy_aggregate(A)
    assert (agg >= 0).all()
    nc = agg.max() + 1
    assert 1 < nc < A.shape[0]  # actual coarsening
    # every aggregate nonempty
    assert (np.bincount(agg, minlength=nc) > 0).all()


def test_hierarchy_shapes():
    A = CSRMatrix.from_dense(laplacian_2d(24))
    M = smoothed_aggregation_amg(A, coarse_size=40)
    assert len(M.levels) >= 2
    n_prev = A.shape[0]
    for lvl in M.levels:
        assert lvl.A.shape[0] == n_prev
        assert lvl.P.shape[0] == n_prev
        assert lvl.P.shape[1] < n_prev  # strict coarsening
        n_prev = lvl.P.shape[1]
    assert M.coarse_inv.shape == (n_prev, n_prev)


def test_amg_cg_fast_convergence(rng):
    """AMG-CG must slash the iteration count vs plain CG on a 2-D
    Laplacian (the textbook multigrid win)."""
    nx = 32
    d = laplacian_2d(nx)
    A = CSRMatrix.from_dense(d)
    M = smoothed_aggregation_amg(A)
    xstar = rng.standard_normal(nx * nx)
    b = jnp.asarray(d @ xstar)
    x, info = cg_solve(A, b, tol=1e-12, M=M)
    assert np.max(np.abs(np.asarray(x) - xstar)) < 1e-9
    _, plain = cg_solve(A, b, tol=1e-12)
    assert int(info.iterations) * 4 < int(plain.iterations)


def test_amg_vcycle_jits(rng):
    nx = 16
    d = laplacian_2d(nx)
    A = CSRMatrix.from_dense(d)
    M = smoothed_aggregation_amg(A, coarse_size=30)
    r = jnp.asarray(rng.standard_normal(nx * nx))
    z = jax.jit(lambda M, r: M.matvec(r))(M, r)
    assert z.shape == r.shape
    assert np.isfinite(np.asarray(z)).all()


@pytest.mark.slow
def test_amg_stationary_iteration(rng):
    """A V-cycle used as a standalone stationary solver contracts the
    error every sweep."""
    nx = 20
    d = laplacian_2d(nx)
    A = CSRMatrix.from_dense(d)
    M = smoothed_aggregation_amg(A)
    xstar = rng.standard_normal(nx * nx)
    b = jnp.asarray(d @ xstar)
    x = jnp.zeros_like(b)
    errs = []
    for _ in range(6):
        x = x + M.matvec(b - A.matvec(x))
        errs.append(np.max(np.abs(np.asarray(x) - xstar)))
    assert errs[-1] < errs[0] * 1e-2  # strong contraction over 6 sweeps


@pytest.mark.slow
def test_amg_unsmoothed_variant(rng):
    nx = 24
    d = laplacian_2d(nx)
    A = CSRMatrix.from_dense(d)
    M = smoothed_aggregation_amg(A, smooth_prolongator=False)
    xstar = rng.standard_normal(nx * nx)
    b = jnp.asarray(d @ xstar)
    x, info = cg_solve(A, b, tol=1e-11, M=M)
    assert np.max(np.abs(np.asarray(x) - xstar)) < 1e-8


# -- Chebyshev (tested here with AMG as its natural companion) ---------------

def test_chebyshev_polynomial_pc(rng):
    from sigma_tpu.solvers import chebyshev, estimate_lmax

    n = 17 * 17
    d = laplacian_2d(17) + 0.05 * np.eye(n)
    A = CSRMatrix.from_dense(d)
    ev = np.linalg.eigvalsh(d)
    M = chebyshev(A, degree=8, lmax=ev.max() * 1.05, lmin=ev.min())
    xstar = rng.standard_normal(n)
    b = jnp.asarray(d @ xstar)
    x, info = cg_solve(A, b, tol=1e-11, M=M)
    assert np.max(np.abs(np.asarray(x) - xstar)) < 1e-8
    _, plain = cg_solve(A, b, tol=1e-11)
    assert int(info.iterations) * 3 < int(plain.iterations)


def test_chebyshev_lmax_estimate(rng):
    from sigma_tpu.solvers import estimate_lmax

    n = 15 * 15
    d = laplacian_2d(15) + np.eye(n)
    A = CSRMatrix.from_dense(d)
    est = float(estimate_lmax(A, iters=30))
    true = np.linalg.eigvalsh(d).max()
    assert 0.9 * true <= est <= 1.3 * true


def test_chebyshev_smoother_damps_high_modes(rng):
    """With multigrid bounds [lmax/30, lmax], one application must damp a
    high-frequency error much more than a smooth one."""
    import jax.numpy as jnp

    from sigma_tpu.solvers import chebyshev

    nx = 32
    n = nx
    d = 2 * np.eye(n) - np.eye(n, k=1) - np.eye(n, k=-1)
    A = CSRMatrix.from_dense(d)
    ev, Q = np.linalg.eigh(d)
    # [lmax/4, lmax]: the standard smoothing band; degree-3 equioscillation
    # bound 2*((sqrt(4)-1)/(sqrt(4)+1))^3 ~ 0.07
    M = chebyshev(A, degree=3, lmax=ev.max(), smoothing_fraction=0.25)
    # error = eigenvector; after e <- e - M A e, measure damping factor
    def damping(e):
        e2 = e - np.asarray(M.matvec(A.matvec(jnp.asarray(e))))
        return np.linalg.norm(e2) / np.linalg.norm(e)

    smooth = damping(Q[:, 0])
    rough = damping(Q[:, -1])
    assert rough < 0.2  # high modes crushed
    assert rough < smooth  # selectively


def test_chebyshev_zero_collectives_distributed(rng):
    """Chebyshev applies on a sharded operator with no inner products — and
    still preconditions distributed CG."""
    import jax

    from sigma_tpu.parallel import distribute_matrix, make_mesh
    from sigma_tpu.solvers import chebyshev

    assert len(jax.devices()) >= 8
    n = 256
    d = 2 * np.eye(n) - np.eye(n, k=1) - np.eye(n, k=-1) + 0.05 * np.eye(n)
    Ad = distribute_matrix(CSRMatrix.from_dense(d), make_mesh(8))
    ev = np.linalg.eigvalsh(d)
    M = chebyshev(Ad, degree=6, lmax=ev.max() * 1.05, lmin=ev.min())
    xstar = rng.standard_normal(n)
    b = Ad.shard_vector(d @ xstar)
    x, info = cg_solve(Ad, b, tol=1e-11, M=M)
    assert np.max(np.abs(Ad.unshard_vector(x) - xstar)) < 1e-7


def test_amg_zero_level_hierarchy(rng):
    """Matrices at/below coarse_size collapse to the dense solve; shape and
    matvec must still work."""
    n = 20
    d = laplacian_2d(5) + np.eye(25)
    A = CSRMatrix.from_dense(d)
    M = smoothed_aggregation_amg(A)  # 25 <= default coarse_size 64
    assert M.levels == ()
    assert M.shape == (25, 25)
    r = jnp.asarray(rng.standard_normal(25))
    z = np.asarray(M.matvec(r))
    assert np.max(np.abs(d @ z - np.asarray(r))) < 1e-8  # exact coarse solve


def test_vmb_aggregation(rng):
    """VMB three-phase aggregation: compact aggregates (coarsening ratio
    well above greedy's ~2x on a stencil), native/fallback parity, and a
    converging hierarchy."""
    import sigma_tpu.native as native_mod
    from sigma_tpu.solvers.amg import vmb_aggregate, greedy_aggregate

    nx = 24
    n = nx * nx
    dense = laplacian_2d(nx) + 0.1 * np.eye(n)
    A = CSRMatrix.from_dense(dense)
    a_v = vmb_aggregate(A)
    a_g = greedy_aggregate(A)
    assert a_v.min() >= 0  # total coverage
    assert a_v.max() + 1 < (a_g.max() + 1) * 0.6  # materially coarser
    # fallback parity
    import pytest

    try:
        from sigma_tpu import native

        if native.available():
            saved = (native_mod._lib, native_mod._tried)
            native_mod._lib, native_mod._tried = None, True
            try:
                a_py = vmb_aggregate(A)
            finally:
                native_mod._lib, native_mod._tried = saved
            assert np.array_equal(a_v, a_py)
    finally:
        pass
    # converging hierarchy
    M = smoothed_aggregation_amg(A, aggregate=vmb_aggregate)
    b = jnp.asarray(rng.standard_normal(n))
    x, info = cg_solve(A, b, tol=1e-12, M=M)
    assert bool(info.converged)
    assert np.abs(np.asarray(x) - np.linalg.solve(dense, np.asarray(b))).max() < 1e-9
