"""L0 vectors/util + persistence tests.

Mirrors ``/root/reference/test/type_tests.f90`` / ``util_tests.f90``
(sort permutation; determinant = 6 for the 5x5 Laplacian) and exercises the
save/load subsystem (the reference has writers but no readers —
``graph_interfaces.f90:406``, ``sparse_matrix_interfaces.f90:601``).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from sigma_tpu import CSRMatrix, ELLMatrix
from sigma_tpu.graph import CSRGraph
from sigma_tpu.io import (
    load_checkpoint,
    load_matrix_npz,
    read_graph,
    read_matrix,
    save_checkpoint,
    save_matrix_npz,
    write_graph,
    write_matrix,
)
from sigma_tpu.utils.util import determinant, init_seed, order
from sigma_tpu.vectors import BlockVector


# -- util (util_tests.f90) ----------------------------------------------------

def test_order(rng):
    x = rng.standard_normal(50)
    p = order(x)
    assert (np.diff(x[p]) >= 0).all()


def test_determinant_laplacian():
    """The reference's oracle: det of the 5x5 path Laplacian + e1 e1^T... the
    actual assert in util_tests.f90 is det = 6 for its 5x5 matrix; we pin
    the same invariant via the (n+1) spanning-tree count: det of the 5x5
    tridiagonal [-1, 2, -1] is 6."""
    n = 5
    A = 2 * np.eye(n) - np.eye(n, k=1) - np.eye(n, k=-1)
    assert abs(determinant(A) - 6.0) < 1e-10


def test_init_seed():
    k1 = init_seed(42)
    k2 = init_seed(42)
    assert (np.asarray(k1) == np.asarray(k2)).all()
    assert init_seed() is not None  # clock-seeded


# -- vectors (vectors.f90) ----------------------------------------------------

def test_block_vector_fields(rng):
    u = rng.standard_normal(8)
    v = rng.standard_normal(5)
    b = BlockVector.from_fields([u, v])
    assert b.num_fields == 2 and b.size == 13
    assert np.allclose(np.asarray(b.field(0)), u)
    assert np.allclose(np.asarray(b.field(1)), v)
    assert b.get(2, field=1) == pytest.approx(v[2])
    assert b.get(9) == pytest.approx(v[1])


def test_block_vector_set_add():
    b = BlockVector.zeros([4, 3])
    b = b.set(1, 5.0, field=1)
    assert b.get(5) == 5.0
    b = b.add(1, 2.0, field=1)
    assert b.get(1, field=1) == 7.0
    b = b.with_field(0, jnp.arange(4.0))
    assert np.allclose(b.to_numpy()[:4], [0, 1, 2, 3])


def test_block_vector_arithmetic(rng):
    a = BlockVector.from_fields([rng.standard_normal(6), rng.standard_normal(4)])
    c = BlockVector.from_fields([rng.standard_normal(6), rng.standard_normal(4)])
    s = a + 2.0 * c
    assert np.allclose(s.to_numpy(), a.to_numpy() + 2 * c.to_numpy())
    assert float(a.dot(c)) == pytest.approx(float(a.to_numpy() @ c.to_numpy()))
    with pytest.raises(ValueError):
        a + BlockVector.zeros([5, 5])


def test_block_vector_with_solver(rng):
    """BlockVector flat storage drops straight into CG."""
    from sigma_tpu.solvers import cg_solve

    n1, n2 = 10, 6
    n = n1 + n2
    d = 2 * np.eye(n) - np.eye(n, k=1) - np.eye(n, k=-1) + np.eye(n)
    A = CSRMatrix.from_dense(d)
    xstar = BlockVector.from_fields(
        [rng.standard_normal(n1), rng.standard_normal(n2)]
    )
    b = A.matvec(xstar.values)
    x, _ = cg_solve(A, b, tol=1e-14)
    got = BlockVector.from_flat(x, (n1, n2))
    assert np.max(np.abs(got.to_numpy() - xstar.to_numpy())) < 1e-9


# -- io -----------------------------------------------------------------------

def test_graph_roundtrip(tmp_path, rng):
    n, m = 15, 11
    dense = rng.random((n, m)) < 0.2
    g = CSRGraph.from_dense(dense)
    p = tmp_path / "g.txt"
    write_graph(g, p)
    g2 = read_graph(p, "csr")
    assert g2.shape == g.shape
    r1, c1 = g.edges_numpy()
    r2, c2 = g2.edges_numpy()
    assert (r1 == r2).all() and (c1 == c2).all()


def test_matrix_text_roundtrip(tmp_path, rng):
    d = np.where(rng.random((12, 9)) < 0.3, rng.standard_normal((12, 9)), 0.0)
    A = CSRMatrix.from_dense(d)
    p = tmp_path / "A.txt"
    write_matrix(A, p)
    B = read_matrix(p, "ell")
    assert isinstance(B, ELLMatrix)
    assert np.max(np.abs(B.to_dense() - d)) < 1e-14


def test_matrix_npz_roundtrip(tmp_path, rng):
    d = np.where(rng.random((20, 20)) < 0.15, rng.standard_normal((20, 20)), 0.0)
    A = ELLMatrix.from_dense(d)
    p = tmp_path / "A.npz"
    save_matrix_npz(A, p)
    B = load_matrix_npz(p)
    assert isinstance(B, ELLMatrix)  # format tag preserved
    assert np.max(np.abs(B.to_dense() - d)) < 1e-15


def test_checkpoint_roundtrip(tmp_path, rng):
    x = rng.standard_normal(64)
    r = rng.standard_normal(64)
    p = tmp_path / "ckpt.npz"
    save_checkpoint(p, x, iteration=17, residual=1e-9, r=r)
    x2, meta, extras = load_checkpoint(p)
    assert np.allclose(np.asarray(x2), x)
    assert meta["iteration"] == 17 and meta["residual"] == 1e-9
    assert np.allclose(extras["r"], r)


def test_checkpoint_resume_solve(tmp_path, rng):
    """Interrupt CG, checkpoint, resume from x0 — converges identically."""
    from sigma_tpu.solvers import cg_solve

    n = 80
    d = 2 * np.eye(n) - np.eye(n, k=1) - np.eye(n, k=-1) + np.eye(n)
    A = CSRMatrix.from_dense(d)
    xstar = rng.standard_normal(n)
    b = jnp.asarray(d @ xstar)
    x_half, info = cg_solve(A, b, tol=0.0, maxiter=10)
    p = tmp_path / "solve.npz"
    save_checkpoint(p, x_half, iteration=int(info.iterations))
    x0, meta, _ = load_checkpoint(p)
    assert meta["iteration"] == 10
    x_final, _ = cg_solve(A, b, x0=x0, tol=1e-14)
    assert np.max(np.abs(np.asarray(x_final) - xstar)) < 1e-9


def test_matrix_market_roundtrip(tmp_path, rng):
    from sigma_tpu.io import read_matrix_market, write_matrix_market

    d = np.where(rng.random((14, 10)) < 0.3, rng.standard_normal((14, 10)), 0.0)
    A = CSRMatrix.from_dense(d)
    p = tmp_path / "A.mtx"
    write_matrix_market(A, p, comment="test matrix")
    B = read_matrix_market(p)
    assert np.max(np.abs(B.to_dense() - d)) < 1e-14


def test_matrix_market_symmetric(tmp_path):
    from sigma_tpu.io import read_matrix_market

    p = tmp_path / "S.mtx"
    p.write_text(
        "%%MatrixMarket matrix coordinate real symmetric\n"
        "3 3 4\n"
        "1 1 2.0\n"
        "2 1 -1.0\n"
        "2 2 2.0\n"
        "3 3 2.0\n"
    )
    A = read_matrix_market(p)
    d = A.to_dense()
    assert d[0, 1] == -1.0 and d[1, 0] == -1.0
    assert np.max(np.abs(d - d.T)) == 0.0


def test_matrix_market_pattern(tmp_path):
    from sigma_tpu.io import read_matrix_market

    p = tmp_path / "P.mtx"
    p.write_text(
        "%%MatrixMarket matrix coordinate pattern general\n"
        "% a comment line\n"
        "2 2 2\n"
        "1 2\n"
        "2 1\n"
    )
    A = read_matrix_market(p)
    assert A.get_value(0, 1) == 1.0 and A.get_value(1, 0) == 1.0


def test_scipy_interop(rng):
    import scipy.sparse

    from sigma_tpu.io import from_scipy, to_scipy

    d = np.where(rng.random((15, 12)) < 0.3, rng.standard_normal((15, 12)), 0.0)
    S = scipy.sparse.csc_matrix(d)
    A = from_scipy(S)  # format inferred: csc
    assert A.format == "csc"
    assert np.max(np.abs(A.to_dense() - d)) < 1e-15
    back = to_scipy(A)
    assert np.max(np.abs(back.toarray() - d)) < 1e-15


def test_matrix_market_skew_symmetric(tmp_path):
    from sigma_tpu.io import read_matrix_market

    p = tmp_path / "skew.mtx"
    p.write_text(
        "%%MatrixMarket matrix coordinate real skew-symmetric\n"
        "3 3 1\n"
        "2 1 1.5\n"
    )
    A = read_matrix_market(p)
    assert A.get_value(1, 0) == 1.5
    assert A.get_value(0, 1) == -1.5


def test_npz_bf16_and_dtype_roundtrip(rng, tmp_path):
    # review regressions: savez stored bf16 as raw void bytes; loads
    # without the dtype tag resumed at the platform default precision
    import jax.numpy as jnp

    from sigma_tpu import CSRMatrix, io

    n = 60
    dense = np.zeros((n, n))
    i = np.arange(n)
    dense[i, i] = 2.0
    dense[i[:-1], i[1:]] = -0.5
    dense[i[1:], i[:-1]] = -0.5
    A16 = CSRMatrix.from_dense(dense).astype(jnp.bfloat16)
    p = tmp_path / "m16.npz"
    io.save_matrix_npz(A16, p)
    B16 = io.load_matrix_npz(p)
    assert B16.dtype == jnp.bfloat16
    assert np.array_equal(
        B16.to_dense().astype(np.float32), A16.to_dense().astype(np.float32)
    )
    # MatrixMarket text write must accept bf16 too
    io.write_matrix_market(A16, tmp_path / "m16.mtx")
    # f32 stays f32 under the x64 test env
    A32 = CSRMatrix.from_coo(n, n, *np.nonzero(dense),
                             dense[np.nonzero(dense)], dtype=np.float32)
    p2 = tmp_path / "m32.npz"
    io.save_matrix_npz(A32, p2)
    assert io.load_matrix_npz(p2).dtype == jnp.float32


def test_block_vector_negative_field_index(rng):
    # review regression: set/add(-1, field=f) wrapped to the FLAT end
    # and silently wrote the wrong field's element
    from sigma_tpu.vectors import BlockVector

    v = BlockVector.from_fields([[1.0, 2.0, 3.0], [4.0, 5.0, 6.0]])
    assert v.get(-1, field=0) == 3.0
    v2 = v.set(-1, 99.0, field=0)
    assert np.asarray(v2.values).tolist() == [1.0, 2.0, 99.0, 4.0, 5.0, 6.0]
    v3 = v.add(-1, 1.0, field=1)
    assert np.asarray(v3.values).tolist() == [1.0, 2.0, 3.0, 4.0, 5.0, 7.0]
    with pytest.raises(IndexError):
        v.set(3, 0.0, field=0)
    with pytest.raises(IndexError):
        v.add(-4, 0.0, field=1)
