"""P1 triangular finite elements: vectorized assembly + gradients.

Reference: ``/root/reference/examples/fem.f90`` — ``laplacian2d:11``
(element stiffness AE = V V^T / (4 area) from rotated edge vectors),
``mass2d:56`` (BE = area/12 + area/12 on the diagonal), ``gradient:156``
(per-element affine map back to the reference triangle).  The reference
loops element-by-element calling ``A%add_value``; here ALL element matrices
are computed in one einsum batch and scattered in a single duplicate-
accumulating ``from_coo`` — the assembly idiom that scales to 10^7
elements.

Also provides the structured meshes used by the reference tests:
``unit_square_mesh`` (Dirichlet Poisson demos) and ``torus_mesh`` (the
periodic grid of ``eigensolver_test_generalized_lanczos.f90:120``).
"""

from __future__ import annotations

from typing import Tuple, Type

import numpy as np

from sigma_tpu.matrix.base import SparseMatrix
from sigma_tpu.matrix.formats import CSRMatrix

__all__ = [
    "stiffness_2d",
    "mass_2d",
    "gradient_2d",
    "unit_square_mesh",
    "torus_mesh",
    "interior_dirichlet",
    "fem3d_stiffness_mass_dia",
    "fem3d_generalized_spectrum",
]


def _wrap(delta: np.ndarray, period) -> np.ndarray:
    """Minimum-image convention for periodic (torus) meshes: wrapped
    elements keep correct geometry even though shared vertex coordinates
    live in one fundamental domain."""
    if period is None:
        return delta
    per = np.asarray(period, dtype=np.float64)
    return delta - per * np.round(delta / per)


def _element_geometry(x: np.ndarray, ele: np.ndarray, period=None):
    """Rotated edge vectors V (ne, 3, 2) and signed double areas (ne,)."""
    j = np.roll(ele, -1, axis=1)
    k = np.roll(ele, -2, axis=1)
    d = _wrap(x[j] - x[k], period)  # (ne, 3, 2) edge deltas
    V = np.empty_like(d)
    V[:, :, 0] = d[:, :, 1]  # y_j - y_k
    V[:, :, 1] = -d[:, :, 0]  # x_k - x_j
    det = V[:, 0, 0] * V[:, 1, 1] - V[:, 0, 1] * V[:, 1, 0]
    return V, det


def _assemble(n: int, ele: np.ndarray, element_mats: np.ndarray, cls, dtype):
    rows = np.repeat(ele, 3, axis=1).ravel()
    cols = np.tile(ele, (1, 3)).ravel()
    return cls.from_coo(n, n, rows, cols, element_mats.reshape(-1), dtype=dtype)


def stiffness_2d(
    x, ele, cls: Type[SparseMatrix] = CSRMatrix, dtype=None, period=None
) -> SparseMatrix:
    """Assembled P1 stiffness matrix (``laplacian2d:11``).  Pass
    ``period=(Lx, Ly)`` for periodic (torus) meshes."""
    x = np.asarray(x, dtype=np.float64)
    ele = np.asarray(ele, dtype=np.int64)
    V, det = _element_geometry(x, ele, period)
    area = np.abs(det) / 2.0
    AE = np.einsum("eia,eja->eij", V, V) * (0.25 / area)[:, None, None]
    return _assemble(x.shape[0], ele, AE, cls, dtype)


def mass_2d(
    x, ele, cls: Type[SparseMatrix] = CSRMatrix, dtype=None, period=None
) -> SparseMatrix:
    """Assembled P1 mass matrix (``mass2d:56``)."""
    x = np.asarray(x, dtype=np.float64)
    ele = np.asarray(ele, dtype=np.int64)
    _, det = _element_geometry(x, ele, period)
    area = np.abs(det) / 2.0
    BE = np.tile((area / 12.0)[:, None, None], (1, 3, 3))
    BE[:, np.arange(3), np.arange(3)] = (area / 6.0)[:, None]
    return _assemble(x.shape[0], ele, BE, cls, dtype)


def gradient_2d(x, ele, u, period=None) -> np.ndarray:
    """Per-element gradient of a P1 field (``gradient:156``): (ne, 2)."""
    x = np.asarray(x, dtype=np.float64)
    ele = np.asarray(ele, dtype=np.int64)
    u = np.asarray(u, dtype=np.float64)
    T = np.stack(
        [
            _wrap(x[ele[:, 0]] - x[ele[:, 2]], period),
            _wrap(x[ele[:, 1]] - x[ele[:, 2]], period),
        ],
        axis=2,
    )  # (ne, 2, 2): columns are edge vectors
    det = T[:, 0, 0] * T[:, 1, 1] - T[:, 0, 1] * T[:, 1, 0]
    S = np.empty_like(T)
    S[:, 0, 0] = T[:, 1, 1] / det
    S[:, 1, 1] = T[:, 0, 0] / det
    S[:, 0, 1] = -T[:, 0, 1] / det
    S[:, 1, 0] = -T[:, 1, 0] / det
    du = np.stack(
        [u[ele[:, 0]] - u[ele[:, 2]], u[ele[:, 1]] - u[ele[:, 2]]], axis=1
    )  # (ne, 2) directional derivatives along edges
    return np.einsum("ea,eab->eb", du, S)


def unit_square_mesh(nx: int) -> Tuple[np.ndarray, np.ndarray]:
    """Structured triangulation of [0,1]^2: (nx+1)^2 nodes, 2 nx^2 elements.
    Returns (coords (n, 2), elements (ne, 3))."""
    g = np.linspace(0.0, 1.0, nx + 1)
    X, Y = np.meshgrid(g, g, indexing="ij")
    coords = np.stack([X.ravel(), Y.ravel()], axis=1)
    idx = np.arange((nx + 1) ** 2).reshape(nx + 1, nx + 1)
    a = idx[:-1, :-1].ravel()
    b = idx[1:, :-1].ravel()
    c = idx[:-1, 1:].ravel()
    d = idx[1:, 1:].ravel()
    tris = np.concatenate(
        [np.stack([a, b, c], axis=1), np.stack([d, c, b], axis=1)]
    )
    return coords, tris


def torus_mesh(nx: int, ny: int) -> Tuple[np.ndarray, np.ndarray]:
    """Uniformly triangulated periodic grid (the generalized-Lanczos test
    geometry).  Coordinates are the fundamental-domain embedding."""
    xs = np.arange(nx) / nx
    ys = np.arange(ny) / ny
    X, Y = np.meshgrid(xs, ys, indexing="ij")
    coords = np.stack([X.ravel(), Y.ravel()], axis=1)
    idx = np.arange(nx * ny).reshape(nx, ny)

    def vid(i, j):
        return idx[i % nx, j % ny]

    tris = []
    for i in range(nx):
        for j in range(ny):
            tris.append((vid(i, j), vid(i + 1, j), vid(i, j + 1)))
            tris.append((vid(i + 1, j + 1), vid(i, j + 1), vid(i + 1, j)))
    return coords, np.asarray(tris)


def interior_dirichlet(
    A: SparseMatrix, b, boundary_mask
) -> Tuple[SparseMatrix, np.ndarray]:
    """Restrict A x = b to interior nodes (homogeneous Dirichlet): returns
    (A_ii as the same format, b_i) plus the interior index set via the mask's
    complement — the standard strong-BC reduction."""
    boundary_mask = np.asarray(boundary_mask, dtype=bool)
    interior = np.nonzero(~boundary_mask)[0]
    lut = -np.ones(A.shape[0], dtype=np.int64)
    lut[interior] = np.arange(interior.size)
    rows, cols, vals = A.entries()
    keep = (lut[rows] >= 0) & (lut[cols] >= 0)
    Aii = type(A).from_coo(
        interior.size,
        interior.size,
        lut[rows[keep]],
        lut[cols[keep]],
        vals[keep],
        dtype=A.dtype,
        **A._format_kwargs(),
    )
    return Aii, np.asarray(b)[interior]
