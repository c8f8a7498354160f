"""Geometry factor precompute: Jacobians, |detJ|*w, and G = J^-1 J^-T |detJ| w.

Vectorized re-derivation of the reference's host precompute layer:
- ``precompute_geometric_data``      (common/precomputation.hpp:18-110)
- ``compute_jacobian``               (common/precompute.hpp:49-96)
- ``compute_jacobian_determinant``   (common/precompute.hpp:102-116)
- ``compute_jacobian_inverse``       (common/precompute.hpp:122-143)
- ``compute_geometrical_factor``     (common/precompute.hpp:148-176)

The reference loops cell-by-cell, qpoint-by-qpoint with 3x3 dense helpers;
here everything is one batched einsum over [ncells, nq] (setup path, NumPy
float64, runs once).

Conventions:
  J[c, q, i, j] = d x_i / d xi_j  — physical coordinate i, reference coord j
  detJw[c, q]   = |det J| * w_q   (the scaled determinant the kernels consume)
  G[c, q, :, :] = J^-1 J^-T * |det J| * w_q   (symmetric 3x3 per qpoint)

For axis-aligned structured boxes J = diag(hx, hy, hz) is constant, detJ and G
collapse to closed form and G is diagonal — the operators exploit this.
"""

from __future__ import annotations

import numpy as np

from .basis import Tab1D, clamp_table, tabulate_1d
from .mesh import HexMesh, StructuredBoxMesh

__all__ = [
    "trilinear_tabulate",
    "compute_jacobian",
    "compute_jacobian_determinant",
    "compute_jacobian_inverse",
    "compute_geometrical_factor",
    "precompute_geometric_data",
    "structured_geometric_factors",
    "quadrature_points_3d",
]


def quadrature_points_3d(tab: Tab1D) -> np.ndarray:
    """Tensor-product quadrature points, flat order z-fastest.

    Flat index q = (qi * n + qj) * n + qk for point
    (qpts[qi], qpts[qj], qpts[qk]) — C-order flattening of the [n, n, n]
    tensor the element kernels operate on.
    """
    n = tab.nq
    X, Y, Z = np.meshgrid(tab.qpts, tab.qpts, tab.qpts, indexing="ij")
    return np.stack([X.ravel(), Y.ravel(), Z.ravel()], axis=-1)


def quadrature_weights_3d(tab: Tab1D) -> np.ndarray:
    WX, WY, WZ = np.meshgrid(tab.qwts, tab.qwts, tab.qwts, indexing="ij")
    return (WX * WY * WZ).ravel()


def trilinear_tabulate(points: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Tabulate the degree-1 (trilinear) coordinate basis at ``points``.

    Returns (phi[nq, 8], dphi[3, nq, 8]) in basix hexahedron vertex order —
    the coordinate-map table of the reference (precomputation.hpp:54-59),
    clamped at +-1/0.
    """
    pts = np.asarray(points, dtype=np.float64)
    nq = pts.shape[0]
    phi = np.ones((nq, 8))
    dphi = np.zeros((3, nq, 8))
    for v in range(8):
        vbits = [(v >> d) & 1 for d in range(3)]
        factors = [
            pts[:, d] if vbits[d] else 1.0 - pts[:, d] for d in range(3)
        ]
        phi[:, v] = factors[0] * factors[1] * factors[2]
        for d in range(3):
            dfac = np.ones(nq) if vbits[d] else -np.ones(nq)
            others = [factors[e] for e in range(3) if e != d]
            dphi[d, :, v] = dfac * others[0] * others[1]
    return clamp_table(phi), clamp_table(dphi)


def compute_jacobian(cell_coords: np.ndarray, dphi: np.ndarray) -> np.ndarray:
    """J[c, q, i, j] = sum_n coords[c, n, i] * dphi[j, q, n].

    Batched version of compute_jacobian (common/precompute.hpp:49-96).
    """
    return np.einsum("cni,jqn->cqij", cell_coords, dphi, optimize=True)


def compute_jacobian_determinant(J: np.ndarray) -> np.ndarray:
    """det J per cell/qpoint (signed; callers take abs as the reference does,
    common/precomputation.hpp:95)."""
    return np.linalg.det(J)


def compute_jacobian_inverse(J: np.ndarray) -> np.ndarray:
    """K = J^-1 per cell/qpoint (common/precompute.hpp:122-143)."""
    return np.linalg.inv(J)


def compute_geometrical_factor(
    J: np.ndarray, detJ: np.ndarray, weights: np.ndarray
) -> np.ndarray:
    """G = J^-1 J^-T * |detJ| * w per cell/qpoint
    (common/precompute.hpp:148-176, precomputation.hpp:98-100)."""
    K = compute_jacobian_inverse(J)
    scale = np.abs(detJ) * weights[None, :]
    return np.einsum("cqij,cqkj,cq->cqik", K, K, scale, optimize=True)


def precompute_geometric_data(
    mesh: HexMesh,
    p: int,
    q: int | None = None,
    rule: str = "gll",
    clamp: bool = True,
    use_native: bool | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """(G[nc, nq, 3, 3], detJw[nc, nq]) for a general hex mesh.

    Batched equivalent of precompute_geometric_data
    (common/precomputation.hpp:18-110), including the +-1/0 clamping of G
    (:105-107) and weight-scaling of |detJ| (:95).

    ``use_native``: route through the C++ wavecore kernel (auto: for large
    meshes when the native library is available).
    """
    tab = tabulate_1d(p, q, rule)
    pts3 = quadrature_points_3d(tab)
    w3 = quadrature_weights_3d(tab)
    _, dphi = trilinear_tabulate(pts3)
    coords = mesh.cell_coords()  # [nc, 8, 3]

    if use_native is None:
        use_native = mesh.ncells >= 4096
    if use_native:
        from .. import native

        if native.available():
            G, detJw = native.geometry_factors(coords, dphi, w3)
            if clamp:
                G = clamp_table(G)
            return G, detJw

    J = compute_jacobian(coords, dphi)
    detJ = compute_jacobian_determinant(J)
    detJw = np.abs(detJ) * w3[None, :]
    G = compute_geometrical_factor(J, detJ, w3)
    if clamp:
        G = clamp_table(G)
    return G, detJw


def structured_geometric_factors(
    mesh: StructuredBoxMesh, p: int, q: int | None = None, rule: str = "gll"
) -> tuple[np.ndarray, np.ndarray]:
    """(Gdiag[nq, 3], detJw[nq]) for an axis-aligned uniform box.

    J = diag(hx, hy, hz) for every cell/qpoint, so
      detJw[q]    = hx*hy*hz * w_q
      Gdiag[q, d] = detJw[q] / h_d^2
    Shapes broadcast against the per-cell arrays of the general path.
    """
    tab = tabulate_1d(p, q, rule)
    w3 = quadrature_weights_3d(tab)
    hx, hy, hz = mesh.h
    vol = hx * hy * hz
    detJw = vol * w3
    Gdiag = detJw[:, None] / np.array([hx * hx, hy * hy, hz * hz])[None, :]
    return Gdiag, detJw
