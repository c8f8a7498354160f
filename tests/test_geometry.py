"""Geometry precompute tests: structured closed form vs general einsum path
vs a direct per-cell/per-qpoint loop oracle implementing the reference
formulas (common/precomputation.hpp:69-101)."""

import numpy as np
import pytest

from wave_fenics_tpu.core import geometry
from wave_fenics_tpu.core.basis import tabulate_1d
from wave_fenics_tpu.core.mesh import box_mesh


def _loop_oracle(mesh_hex, p):
    """Reference-style per-cell/per-qpoint loop (precomputation.hpp:69-101)."""
    tab = tabulate_1d(p)
    pts = geometry.quadrature_points_3d(tab)
    w = geometry.quadrature_weights_3d(tab)
    _, dphi = geometry.trilinear_tabulate(pts)
    coords = mesh_hex.cell_coords()
    nc, nq = coords.shape[0], pts.shape[0]
    G = np.zeros((nc, nq, 3, 3))
    detJw = np.zeros((nc, nq))
    for c in range(nc):
        for q in range(nq):
            J = np.zeros((3, 3))
            for i in range(3):
                for j in range(3):
                    J[i, j] = np.sum(coords[c, :, i] * dphi[j, q, :])
            dj = abs(np.linalg.det(J)) * w[q]
            detJw[c, q] = dj
            K = np.linalg.inv(J)
            G[c, q] = (K * dj) @ K.T
    return G, detJw


@pytest.mark.parametrize("p", [1, 2, 4])
def test_general_vs_loop_oracle(p):
    m = box_mesh((2, 2, 1), (1.0, 2.0, 0.5)).to_hex_mesh()
    # distort vertices to exercise non-diagonal Jacobians
    rng = np.random.default_rng(0)
    pts = m.points + 0.03 * rng.standard_normal(m.points.shape)
    m = type(m)(points=pts, cells=m.cells)
    G, detJw = geometry.precompute_geometric_data(m, p, clamp=False)
    Go, detJwo = _loop_oracle(m, p)
    np.testing.assert_allclose(detJw, detJwo, rtol=1e-12)
    np.testing.assert_allclose(G, Go, rtol=1e-11, atol=1e-14)
    # G symmetric
    np.testing.assert_allclose(G, np.swapaxes(G, -1, -2), atol=1e-12)


@pytest.mark.parametrize("p", [2, 3, 4])
def test_structured_matches_general(p):
    mesh = box_mesh((2, 3, 2), (0.4, 0.9, 0.6))
    Gd, detJw_s = geometry.structured_geometric_factors(mesh, p)
    G, detJw = geometry.precompute_geometric_data(mesh.to_hex_mesh(), p, clamp=False)
    np.testing.assert_allclose(
        detJw, np.broadcast_to(detJw_s[None], detJw.shape), rtol=1e-12
    )
    # general G must be diagonal with the structured diagonal
    nc, nq = detJw.shape
    Gfull = np.zeros((nq, 3, 3))
    Gfull[:, [0, 1, 2], [0, 1, 2]] = Gd
    np.testing.assert_allclose(G, np.broadcast_to(Gfull[None], G.shape), atol=1e-13)


def test_detjw_sums_to_volume():
    mesh = box_mesh((3, 2, 2), (2.0, 1.0, 1.5))
    _, detJw = geometry.structured_geometric_factors(mesh, 4)
    cell_vol = np.prod(mesh.h)
    np.testing.assert_allclose(detJw.sum(), cell_vol, rtol=1e-12)
    G, detJw_g = geometry.precompute_geometric_data(mesh.to_hex_mesh(), 4)
    np.testing.assert_allclose(detJw_g.sum(), np.prod(mesh.extent), rtol=1e-12)
