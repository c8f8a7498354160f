"""End-to-end on an imported (XDMF) mesh: io -> dofmap -> operators -> CG.

Exercises the full unstructured/imported code path the reference drives via
DOLFINx XDMF ingest (demo/cpu_planar3d/main.cpp:40-45), including a
geometrically distorted mesh that the structured fast path cannot handle.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wave_fenics_tpu.core import io as mio
from wave_fenics_tpu.core.dofmap import build_dofmap
from wave_fenics_tpu.core.mesh import box_mesh
from wave_fenics_tpu.ops.operators import GeneralOperators
from wave_fenics_tpu.solvers.cg import cg

_VTK_ORDER = np.array([0, 1, 3, 2, 4, 5, 7, 6])


@pytest.fixture()
def imported_mesh(tmp_path):
    h5py = pytest.importorskip("h5py")
    m = box_mesh((3, 2, 2), (1.0, 0.8, 0.9)).to_hex_mesh()
    rng = np.random.default_rng(0)
    pts = m.points + 0.02 * rng.standard_normal(m.points.shape)
    inv = np.argsort(_VTK_ORDER)
    with h5py.File(tmp_path / "m.h5", "w") as f:
        f["/geom"] = pts
        f["/topo"] = m.cells[:, inv]
    (tmp_path / "m.xdmf").write_text(f"""<?xml version="1.0"?>
<Xdmf Version="3.0"><Domain>
<Grid Name="imported">
<Topology TopologyType="Hexahedron" NumberOfElements="{m.ncells}">
<DataItem Dimensions="{m.ncells} 8" Format="HDF">m.h5:/topo</DataItem>
</Topology>
<Geometry GeometryType="XYZ">
<DataItem Dimensions="{len(pts)} 3" Format="HDF">m.h5:/geom</DataItem>
</Geometry>
</Grid>
</Domain></Xdmf>""")
    return mio.read_xdmf(str(tmp_path / "m.xdmf"))


def test_imported_mesh_operators_and_cg(imported_mesh):
    p = 3
    dofs = build_dofmap(imported_mesh, p)
    ops = GeneralOperators(imported_mesh, dofs, dtype=jnp.float64)

    # mass solve by CG (BP1 shape on an imported distorted mesh)
    rng = np.random.default_rng(1)
    b = jnp.asarray(rng.standard_normal(ops.ndofs))
    solve = jax.jit(lambda bb: cg(ops.spectral_mass, bb, kmax=400, rtol=1e-9))
    x, k, _ = solve(b)
    res = np.asarray(ops.spectral_mass(x) - b)
    assert np.linalg.norm(res) / np.linalg.norm(np.asarray(b)) < 1e-7

    # stiffness annihilates constants on the imported mesh too
    ones = jnp.ones((ops.ndofs,), dtype=jnp.float64)
    y = np.asarray(ops.stiffness(ones, 1500.0))
    assert np.abs(y).max() < 1e-5 * 1500.0**2


def test_imported_mesh_distributed_solve(imported_mesh):
    """Complete imported-mesh workflow, distributed: XDMF mesh -> tagged
    facets -> GeneralLinearWave -> ShardedGeneralWave over 4 virtual
    devices == single-device solve (the reference's mesh-agnostic MPI
    driver, demo/cpu_planar3d/main.cpp:39-45 + VectorUpdater)."""
    from wave_fenics_tpu.models.general_wave import GeneralLinearWave
    from wave_fenics_tpu.parallel.sharded_general import ShardedGeneralWave

    hm = imported_mesh
    # tagged facets by TOPOLOGY (vertex ids survive the perturbation):
    # basix hex face (0,2,4,6) is the -x face, (1,3,5,7) the +x face
    xlo, xhi = [], []
    # cells on the box faces: original box (3,2,2), x-slowest C-order
    for c in range(hm.ncells):
        cx = c // 4
        cell = hm.cells[c]
        if cx == 0:
            xlo.append([cell[v] for v in (0, 2, 4, 6)])
        if cx == 2:
            xhi.append([cell[v] for v in (1, 3, 5, 7)])
    md = GeneralLinearWave(
        mesh=hm, p=3,
        facet_tags={1: np.asarray(xlo), 2: np.asarray(xhi)},
        dtype=jnp.float64,
    )
    dt = 1e-9
    u1, v1 = md.solve_n(0.0, dt, 5)
    sw = ShardedGeneralWave(md, 4)
    u4, v4, _ = sw.solve_n(0.0, dt, 5)
    v1n = np.asarray(v1)
    np.testing.assert_allclose(sw.to_global(v4), v1n, rtol=1e-13,
                               atol=1e-14 * np.abs(v1n).max())
