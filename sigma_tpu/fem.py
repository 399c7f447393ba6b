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


def fem3d_stiffness_mass_dia(nx: int, dtype=np.float64):
    """Trilinear (Q1) FEM stiffness/mass pair on the unit cube with
    homogeneous Dirichlet BCs, directly in DIA layout at any scale.

    Tensor-product elements integrate separably, so the interior-node
    matrices are exactly Kronecker forms of the 1-D P1 pair
    ``A1 = tridiag(-1, 2, -1)/h`` and ``M1 = h·tridiag(1, 4, 1)/6``
    (h = 1/(nx+1)):

        K = A1⊗M1⊗M1 + M1⊗A1⊗M1 + M1⊗M1⊗A1,   M = M1⊗M1⊗M1

    — the 3-D version of the pencil the reference's generalized-Lanczos
    test assembles element-by-element
    (``eigensolver_test_generalized_lanczos.f90:120-132``).  Both are
    27-point stencils; this builds their diagonal value grids in closed
    form with per-axis boundary masks (no element loop, no COO sort —
    the only construction that scales to the 10M-row north star).

    Returns ``(n, offsets, Kdata, Mdata)`` with data shaped
    ``(27, stride)`` ready for ``DIAMatrix`` (reshape to (27, -1, 128)).
    """
    if nx < 3:
        # nx <= 2: distinct (dx, dy, dz) displacements flatten to the
        # SAME diagonal offset (e.g. (0,-1,1) and (0,0,-1) at nx=2),
        # breaking the unique-sorted-offsets DIA invariant (review fix)
        raise ValueError("fem3d_stiffness_mass_dia requires nx >= 3 "
                         "(smaller grids alias distinct stencil offsets "
                         "onto the same flat diagonal)")
    n = nx * nx * nx
    h = 1.0 / (nx + 1)
    stride = -(-n // 128) * 128
    a = {0: 2.0 / h, 1: -1.0 / h, -1: -1.0 / h}
    m = {0: 4.0 * h / 6.0, 1: h / 6.0, -1: h / 6.0}
    i = np.arange(n)
    iz = i % nx
    iy = (i // nx) % nx
    ix = i // (nx * nx)
    valid = {}
    for d in (-1, 0, 1):
        valid[("x", d)] = (ix + d >= 0) & (ix + d < nx)
        valid[("y", d)] = (iy + d >= 0) & (iy + d < nx)
        valid[("z", d)] = (iz + d >= 0) & (iz + d < nx)
    offsets = []
    Kdata = np.zeros((27, stride), dtype)
    Mdata = np.zeros((27, stride), dtype)
    d_i = 0
    for dx in (-1, 0, 1):
        for dy in (-1, 0, 1):
            for dz in (-1, 0, 1):
                off = dx * nx * nx + dy * nx + dz
                mask = (
                    valid[("x", dx)] & valid[("y", dy)] & valid[("z", dz)]
                )
                kc = (
                    a[dx] * m[dy] * m[dz]
                    + m[dx] * a[dy] * m[dz]
                    + m[dx] * m[dy] * a[dz]
                )
                mc = m[dx] * m[dy] * m[dz]
                Kdata[d_i, :n] = np.where(mask, kc, 0.0)
                Mdata[d_i, :n] = np.where(mask, mc, 0.0)
                offsets.append(off)
                d_i += 1
    return n, tuple(offsets), Kdata, Mdata


def fem3d_generalized_spectrum(nx: int, count: int) -> np.ndarray:
    """Lowest ``count`` exact generalized eigenvalues of the
    :func:`fem3d_stiffness_mass_dia` pencil K x = λ M x.

    The 1-D pencil (A1, M1) is diagonalized by discrete sines:
    μ_p = 6 (1 − cos θ_p) / (h² (2 + cos θ_p)), θ_p = pπ/(nx+1); the
    tensor eigenvalues are sums of three 1-D values (the continuum limit
    is the Dirichlet Laplacian spectrum π²(p²+q²+r²))."""
    if not 1 <= count <= nx**3:
        raise ValueError(f"count={count} out of range [1, {nx**3}]")
    p = np.arange(1, nx + 1)
    th = np.pi * p / (nx + 1)
    h = 1.0 / (nx + 1)
    mu = 6.0 * (1.0 - np.cos(th)) / (h * h * (2.0 + np.cos(th)))
    # the k-th smallest triple sum of an increasing sequence uses 1-D
    # indices <= k, so a corner block of side min(nx, count) is exact
    # (a fixed small block would silently drop sums involving higher
    # 1-D modes once count grows)
    c = min(nx, count)
    block = (
        mu[:c, None, None] + mu[None, :c, None] + mu[None, None, :c]
    ).ravel()
    return np.sort(block)[:count]
