"""Dofmap tests: structured tensor-product numbering and geometric dedup."""

import numpy as np
import pytest

from wave_fenics_tpu.core.dofmap import StructuredDofGrid, build_dofmap
from wave_fenics_tpu.core.mesh import box_mesh


@pytest.mark.parametrize("p", [1, 2, 4])
def test_structured_shapes(p):
    mesh = box_mesh((3, 2, 2), (1.0, 1.0, 1.0))
    dg = StructuredDofGrid(mesh, p)
    assert dg.grid_shape == (3 * p + 1, 2 * p + 1, 2 * p + 1)
    dm = dg.dofmap()
    assert dm.shape == (12, (p + 1) ** 3)
    assert dm.min() == 0 and dm.max() == dg.ndofs - 1
    # every dof referenced at least once, interior dofs exactly once
    counts = np.bincount(dm.ravel(), minlength=dg.ndofs)
    assert counts.min() >= 1
    assert counts.max() <= 8  # corner dofs shared by up to 8 cells


@pytest.mark.parametrize("p", [2, 3])
def test_structured_vs_geometric_dedup(p):
    """The explicit structured dofmap and the geometric-dedup general dofmap
    must induce the same dof identification (exact-value check in the spirit
    of gpu_scatter_local, demo/gpu_scatter_local/main.cpp:84-90)."""
    mesh = box_mesh((2, 2, 2), (1.0, 1.3, 0.7))
    dg = StructuredDofGrid(mesh, p)
    dm_s = dg.dofmap()
    gdm = build_dofmap(mesh.to_hex_mesh(), p)
    assert gdm.ndofs == dg.ndofs
    # same equivalence classes: renumbering must be a consistent bijection
    mapping = {}
    for a, b in zip(dm_s.ravel(), gdm.dofmap.ravel()):
        assert mapping.setdefault(int(a), int(b)) == int(b)
    assert len(set(mapping.values())) == dg.ndofs


def test_axis_coords_and_grid_coords():
    mesh = box_mesh((2, 1, 1), (1.0, 1.0, 1.0))
    dg = StructuredDofGrid(mesh, 2)
    x = dg.axis_coords(0)
    np.testing.assert_allclose(x, [0, 0.25, 0.5, 0.75, 1.0], atol=1e-15)
    grid = dg.dof_coords_grid()
    assert grid.shape == (5, 3, 3, 3)
    np.testing.assert_allclose(grid[..., 0], np.broadcast_to(
        np.array([0, 0.25, 0.5, 0.75, 1.0])[:, None, None], (5, 3, 3)))


def test_dof_coords_match_between_paths():
    mesh = box_mesh((2, 2, 1), (1.0, 1.0, 1.0))
    p = 2
    dg = StructuredDofGrid(mesh, p)
    gdm = build_dofmap(mesh.to_hex_mesh(), p)
    # coordinates of dofs (via structured dofmap ids) must agree
    grid_coords = dg.dof_coords_grid().reshape(-1, 3)
    dm_s = dg.dofmap().ravel()
    dm_g = gdm.dofmap.ravel()
    np.testing.assert_allclose(grid_coords[dm_s], gdm.dof_coords[dm_g], atol=1e-12)


def test_morton_order_is_permutation_and_local():
    from wave_fenics_tpu.core.dofmap import morton_cell_order

    mesh = box_mesh((4, 4, 4), (1.0, 1.0, 1.0)).to_hex_mesh()
    perm = morton_cell_order(mesh)
    assert sorted(perm.tolist()) == list(range(64))
    # locality: average centroid distance between consecutive cells is
    # much smaller than random order
    c = mesh.cell_coords().mean(axis=1)
    d_m = np.linalg.norm(np.diff(c[perm], axis=0), axis=1).mean()
    rng = np.random.default_rng(0)
    d_r = np.linalg.norm(
        np.diff(c[rng.permutation(64)], axis=0), axis=1
    ).mean()
    assert d_m < 0.6 * d_r


def test_build_dofmap_morton_reorder_consistent():
    from wave_fenics_tpu.core.dofmap import build_dofmap, morton_cell_order

    mesh = box_mesh((3, 3, 2), (1.0, 1.0, 1.0)).to_hex_mesh()
    d1 = build_dofmap(mesh, 2)
    d2 = build_dofmap(mesh, 2, reorder="morton")
    assert d2.ndofs == d1.ndofs
    # same dof identification up to renumbering: cell sets of coords match
    perm = morton_cell_order(mesh)
    np.testing.assert_allclose(
        d2.dof_coords[d2.dofmap], d1.dof_coords[d1.dofmap[perm]], atol=1e-12
    )
