"""P1 FEM tests (the worked version of the reference's unbuilt
``examples/fem.f90``): element-matrix exactness, operator properties,
gradient exactness on linear fields, and Poisson h-convergence.
"""

import jax.numpy as jnp
import numpy as np

from sigma_tpu.fem import (
    gradient_2d,
    interior_dirichlet,
    mass_2d,
    stiffness_2d,
    torus_mesh,
    unit_square_mesh,
)
from sigma_tpu.solvers import cg_solve


def test_stiffness_properties():
    coords, ele = unit_square_mesh(8)
    A = stiffness_2d(coords, ele)
    d = A.to_dense()
    assert np.max(np.abs(d - d.T)) < 1e-13  # symmetric
    assert np.max(np.abs(d.sum(1))) < 1e-12  # constants in the kernel
    w = np.linalg.eigvalsh(d)
    assert w.min() > -1e-12  # positive semidefinite


def test_mass_properties():
    coords, ele = unit_square_mesh(6)
    M = mass_2d(coords, ele)
    d = M.to_dense()
    assert np.max(np.abs(d - d.T)) < 1e-14
    assert abs(d.sum() - 1.0) < 1e-12  # integrates 1 over the unit square
    assert np.linalg.eigvalsh(d).min() > 0  # positive definite


def test_stiffness_exact_on_linear():
    """Stiffness applied to a linear field = 0 on interior nodes (linear
    fields are harmonic and P1-exact)."""
    coords, ele = unit_square_mesh(7)
    A = stiffness_2d(coords, ele)
    u = 2.0 * coords[:, 0] - 3.0 * coords[:, 1] + 1.0
    r = np.asarray(A.matvec(jnp.asarray(u)))
    xs, ys = coords[:, 0], coords[:, 1]
    interior = ~((xs == 0) | (xs == 1) | (ys == 0) | (ys == 1))
    assert np.max(np.abs(r[interior])) < 1e-12


def test_gradient_exact_on_linear():
    coords, ele = unit_square_mesh(5)
    u = 4.0 * coords[:, 0] + 7.0 * coords[:, 1] - 2.0
    g = gradient_2d(coords, ele, u)
    assert np.max(np.abs(g - np.array([4.0, 7.0]))) < 1e-12


def test_poisson_convergence():
    """Manufactured solution: error drops ~4x when h halves (O(h^2))."""
    errs = []
    for nx in (8, 16):
        coords, ele = unit_square_mesh(nx)
        A = stiffness_2d(coords, ele)
        M = mass_2d(coords, ele)
        xs, ys = coords[:, 0], coords[:, 1]
        u_exact = np.sin(np.pi * xs) * np.sin(np.pi * ys)
        f = 2 * np.pi**2 * u_exact
        b = np.asarray(M.matvec(jnp.asarray(f)))
        bdry = (xs == 0) | (xs == 1) | (ys == 0) | (ys == 1)
        Aii, bi = interior_dirichlet(A, b, bdry)
        ui, _ = cg_solve(Aii, jnp.asarray(bi), tol=1e-13)
        u = np.zeros(coords.shape[0])
        u[~bdry] = np.asarray(ui)
        errs.append(np.max(np.abs(u - u_exact)))
    assert errs[1] < errs[0] / 3.0


def test_torus_mesh_assembly():
    """Periodic mesh: stiffness kernel contains constants; mass integrates
    the full fundamental domain."""
    coords, ele = torus_mesh(5, 5)
    A = stiffness_2d(coords, ele, period=(1.0, 1.0))
    M = mass_2d(coords, ele, period=(1.0, 1.0))
    ones = jnp.ones(coords.shape[0])
    assert np.max(np.abs(np.asarray(A.matvec(ones)))) < 1e-12
    # 25 cells of (1/5)x(1/5), two triangles each -> total area 1
    assert abs(float(M.matvec(ones).sum()) - 1.0) < 1e-12
