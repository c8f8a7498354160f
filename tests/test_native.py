"""Native (C++) wavecore kernel tests vs the NumPy reference paths."""

import numpy as np
import pytest

from wave_fenics_tpu import native
from wave_fenics_tpu.core import geometry
from wave_fenics_tpu.core.basis import tabulate_1d
from wave_fenics_tpu.core.mesh import box_mesh

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library unavailable"
)


def test_geometry_factors_match_numpy():
    m = box_mesh((3, 2, 2), (1.0, 1.1, 0.9)).to_hex_mesh()
    rng = np.random.default_rng(0)
    m = type(m)(points=m.points + 0.03 * rng.standard_normal(m.points.shape),
                cells=m.cells)
    tab = tabulate_1d(4)
    pts3 = geometry.quadrature_points_3d(tab)
    w3 = geometry.quadrature_weights_3d(tab)
    _, dphi = geometry.trilinear_tabulate(pts3)
    G, dw = native.geometry_factors(m.cell_coords(), dphi, w3)
    G2, dw2 = geometry.precompute_geometric_data(m, 4, clamp=False,
                                                 use_native=False)
    np.testing.assert_allclose(G, G2, atol=1e-14)
    np.testing.assert_allclose(dw, dw2, atol=1e-15)


def test_dedup_matches_unique():
    rng = np.random.default_rng(1)
    keys = rng.integers(0, 6, size=(5000, 3))
    ids, n = native.dedup_dofs(keys)
    uniq, inv = np.unique(keys, axis=0, return_inverse=True)
    assert n == len(uniq)
    # same equivalence classes
    remap = {}
    for a, b in zip(ids, inv):
        assert remap.setdefault(int(a), int(b)) == int(b)


def test_box_cells():
    cells = native.box_cells(3, 2, 2)
    ref = box_mesh((3, 2, 2), (1, 1, 1)).to_hex_mesh().cells
    np.testing.assert_array_equal(cells, ref)


def test_geometry_singular_raises():
    m = box_mesh((1, 1, 1), (1.0, 1.0, 1.0)).to_hex_mesh()
    pts = m.points.copy()
    pts[:] = 0.0  # fully degenerate
    m = type(m)(points=pts, cells=m.cells)
    tab = tabulate_1d(2)
    pts3 = geometry.quadrature_points_3d(tab)
    w3 = geometry.quadrature_weights_3d(tab)
    _, dphi = geometry.trilinear_tabulate(pts3)
    with pytest.raises(ValueError):
        native.geometry_factors(m.cell_coords(), dphi, w3)


@pytest.mark.parametrize("p,cells", [(2, (5, 4, 3)), (4, (4, 3, 3)),
                                     (5, (3, 2, 2))])
def test_native_chain_assignment_exact(p, cells):
    """The C++ chain assignment must produce VALID tables (gather and
    scatter reproduce the dofmap movement exactly) and cover the same
    cells as the Python builder. Table bits may differ (the native
    sequential first-fit is a refinement); validity is the contract."""
    import os

    from wave_fenics_tpu.core.dofmap import build_dofmap
    from wave_fenics_tpu.ops.general_tables import (
        build_batch_tables, reference_gather, reference_scatter,
    )

    if not native.available():
        pytest.skip("native library unavailable")
    hm = box_mesh(cells, (1.0, 1.0, 1.0)).to_hex_mesh()
    dm = build_dofmap(hm, p)
    nd = (p + 1) ** 3
    os.environ["WAVE_FENICS_TABLE_CACHE"] = "off"
    try:
        tb_n = build_batch_tables(dm.dofmap, dm.ndofs, use_native=True)
        tb_p = build_batch_tables(dm.dofmap, dm.ndofs, use_native=False)
    finally:
        del os.environ["WAVE_FENICS_TABLE_CACHE"]
    assert len(tb_n.spill_cells) == len(tb_p.spill_cells) == 0
    assert tb_n.nbatch == tb_p.nbatch
    # native chains never exceed the Python builder's (refinement)
    assert tb_n.kg <= tb_p.kg and tb_n.ks <= tb_p.ks
    rng = np.random.default_rng(3)
    x = rng.standard_normal(dm.ndofs)
    xe = reference_gather(tb_n, x)
    ye = np.zeros((tb_n.nbatch, tb_n.H, 128))
    y_ref = np.zeros(dm.ndofs)
    for i in range(tb_n.nbatch):
        for b, cell in enumerate(tb_n.batch_cells[i]):
            if cell < 0:
                continue
            r_, lo_ = tb_n.slot_coords(b)
            np.testing.assert_array_equal(xe[i, r_, lo_],
                                          x[dm.dofmap[cell]])
            v = rng.standard_normal(nd)
            ye[i, r_, lo_] = v
            np.add.at(y_ref, dm.dofmap[cell], v)
    y = reference_scatter(tb_n, ye, dm.ndofs)
    np.testing.assert_allclose(y, y_ref, atol=1e-12)


@pytest.mark.parametrize("p,cells", [(2, (6, 5, 4)), (4, (4, 3, 3))])
def test_native_scatter_merge_exact(p, cells):
    """Native scatter-merge encoding must reassociate the exact same
    additions as the plain chain scatter (fixed deterministic order)."""
    import os

    from wave_fenics_tpu.core.dofmap import build_dofmap
    from wave_fenics_tpu.ops.general_tables import (
        build_batch_tables, build_scatter_merge,
        reference_merge_scatter, reference_scatter,
    )

    if not native.available():
        pytest.skip("native library unavailable")
    hm = box_mesh(cells, (1.0, 1.0, 1.0)).to_hex_mesh()
    dm = build_dofmap(hm, p)
    os.environ["WAVE_FENICS_TABLE_CACHE"] = "off"
    try:
        tb = build_batch_tables(dm.dofmap, dm.ndofs)
        mg = build_scatter_merge(tb, use_native=True)
    finally:
        del os.environ["WAVE_FENICS_TABLE_CACHE"]
    assert mg is not None and mg.ks < tb.ks
    rng = np.random.default_rng(2)
    ye = rng.standard_normal((tb.nbatch, tb.H, 128))
    # lane 127 is REAL data under full-lane packing; rows >= R are zero
    ye[:, tb.R:, :] = 0.0
    y_m = reference_merge_scatter(tb, mg, ye, dm.ndofs)
    y_p = reference_scatter(tb, ye, dm.ndofs)
    np.testing.assert_allclose(y_m, y_p, atol=1e-12)
