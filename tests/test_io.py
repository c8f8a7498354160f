"""Mesh I/O tests: XDMF (inline XML + HDF5) and npz round-trips."""

import numpy as np
import pytest

from wave_fenics_tpu.core import io as mio
from wave_fenics_tpu.core.dofmap import build_dofmap
from wave_fenics_tpu.core.mesh import box_mesh

_VTK_ORDER = np.array([0, 1, 3, 2, 4, 5, 7, 6])


def _write_xdmf_inline(path, points, cells_vtk, name="mesh"):
    pts = "\n".join(" ".join(f"{v:.17g}" for v in row) for row in points)
    tp = "\n".join(" ".join(str(int(v)) for v in row) for row in cells_vtk)
    path.write_text(f"""<?xml version="1.0"?>
<Xdmf Version="3.0"><Domain>
<Grid Name="{name}">
<Topology TopologyType="Hexahedron" NumberOfElements="{len(cells_vtk)}">
<DataItem Dimensions="{len(cells_vtk)} 8" Format="XML">{tp}</DataItem>
</Topology>
<Geometry GeometryType="XYZ">
<DataItem Dimensions="{len(points)} 3" Format="XML">{pts}</DataItem>
</Geometry>
</Grid>
</Domain></Xdmf>""")


def test_read_xdmf_inline(tmp_path):
    m = box_mesh((2, 2, 1), (1.0, 1.0, 0.5)).to_hex_mesh()
    # convert basix order -> VTK order for writing
    inv = np.argsort(_VTK_ORDER)
    cells_vtk = m.cells[:, inv]
    f = tmp_path / "m.xdmf"
    _write_xdmf_inline(f, m.points, cells_vtk)
    m2 = mio.read_xdmf(str(f))
    np.testing.assert_allclose(m2.points, m.points)
    np.testing.assert_array_equal(m2.cells, m.cells)
    # imported mesh builds a working dofmap
    dofs = build_dofmap(m2, 2)
    assert dofs.ndofs == (2 * 2 + 1) * (2 * 2 + 1) * (1 * 2 + 1)


def test_read_xdmf_hdf5(tmp_path):
    h5py = pytest.importorskip("h5py")
    m = box_mesh((2, 1, 1), (1.0, 1.0, 1.0)).to_hex_mesh()
    inv = np.argsort(_VTK_ORDER)
    with h5py.File(tmp_path / "m.h5", "w") as f:
        f["/Mesh/geom"] = m.points
        f["/Mesh/topo"] = m.cells[:, inv]
    (tmp_path / "m.xdmf").write_text(f"""<?xml version="1.0"?>
<Xdmf Version="3.0"><Domain>
<Grid Name="planar3d">
<Topology TopologyType="Hexahedron" NumberOfElements="2">
<DataItem Dimensions="2 8" Format="HDF">m.h5:/Mesh/topo</DataItem>
</Topology>
<Geometry GeometryType="XYZ">
<DataItem Dimensions="{len(m.points)} 3" Format="HDF">m.h5:/Mesh/geom</DataItem>
</Geometry>
</Grid>
</Domain></Xdmf>""")
    m2 = mio.read_xdmf(str(tmp_path / "m.xdmf"), "planar3d")
    np.testing.assert_allclose(m2.points, m.points)
    np.testing.assert_array_equal(m2.cells, m.cells)


def test_npz_roundtrip(tmp_path):
    m = box_mesh((2, 2, 2), (1.0, 1.0, 1.0)).to_hex_mesh()
    p = str(tmp_path / "m.npz")
    mio.save_npz(p, m)
    m2 = mio.load_npz(p)
    np.testing.assert_array_equal(m2.cells, m.cells)
    np.testing.assert_allclose(m2.points, m.points)


def test_write_xdmf_rectilinear(tmp_path):
    h5py = pytest.importorskip("h5py")
    from wave_fenics_tpu.core.dofmap import StructuredDofGrid
    from wave_fenics_tpu.core.mesh import box_mesh

    dg = StructuredDofGrid(box_mesh((2, 2, 1), (1.0, 1.0, 0.5)), 2)
    coords = tuple(dg.axis_coords(d) for d in range(3))
    u = np.random.default_rng(0).standard_normal(dg.grid_shape)
    p = str(tmp_path / "out.xdmf")
    mio.write_xdmf_rectilinear(p, coords, {"u": u}, time=1e-6)
    assert (tmp_path / "out.xdmf").exists()
    with h5py.File(tmp_path / "out.h5") as f:
        np.testing.assert_array_equal(f["/u"][()], u)
        np.testing.assert_allclose(f["/x"][()], coords[0])


def test_write_xdmf_time_series(tmp_path):
    h5py = pytest.importorskip("h5py")
    from wave_fenics_tpu.core.dofmap import StructuredDofGrid
    from wave_fenics_tpu.core.mesh import box_mesh

    dg = StructuredDofGrid(box_mesh((2, 1, 1), (1.0, 0.5, 0.5)), 2)
    coords = tuple(dg.axis_coords(d) for d in range(3))
    rng = np.random.default_rng(0)
    snaps = [
        (1e-6 * s, {"u": rng.standard_normal(dg.grid_shape)})
        for s in range(3)
    ]
    p = str(tmp_path / "series.xdmf")
    mio.write_xdmf_time_series(p, coords, snaps)
    with h5py.File(tmp_path / "series.h5") as f:
        np.testing.assert_array_equal(f["/step000002/u"][()], snaps[2][1]["u"])
    txt = (tmp_path / "series.xdmf").read_text()
    assert txt.count("<Grid Name=\"t") == 3 and "Temporal" in txt


def test_write_xdmf_unstructured(tmp_path):
    """General-dofmap output: p-refined sub-hex grid roundtrips through
    read_xdmf; nodal field lands exactly at the dof points; sub-hex
    volumes tile the box."""
    h5py = pytest.importorskip("h5py")
    from wave_fenics_tpu.core.dofmap import build_dofmap
    from wave_fenics_tpu.core.mesh import box_mesh

    p = 3
    hm = box_mesh((2, 2, 1), (1.0, 0.8, 0.5)).to_hex_mesh()
    dofs = build_dofmap(hm, p)
    u = dofs.dof_coords[:, 0] + 2.0 * dofs.dof_coords[:, 1]
    out = str(tmp_path / "sol.xdmf")
    mio.write_xdmf_unstructured(out, dofs, {"u": u}, time=0.5)

    sub = mio.read_xdmf(out)
    assert sub.ncells == hm.ncells * p**3
    np.testing.assert_allclose(sub.points, dofs.dof_coords, atol=1e-14)
    with h5py.File(tmp_path / "sol.h5") as f:
        np.testing.assert_array_equal(f["/u"][()], u)
    # rectangular sub-hexes tile the domain exactly
    cc = sub.cell_coords()  # [nsub, 8, 3]
    vol = np.prod(cc.max(axis=1) - cc.min(axis=1), axis=1).sum()
    np.testing.assert_allclose(vol, 1.0 * 0.8 * 0.5, rtol=1e-12)
    assert 'Time Value="0.5"' in (tmp_path / "sol.xdmf").read_text()
