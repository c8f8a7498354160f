"""Gather/scatter tests.

Formalizes the reference's only hard unit test — gather of an iota vector
must reproduce the dofmap (demo/gpu_scatter_local/main.cpp:84-90) — and adds
adjointness + cross-path equivalence checks the reference lacks.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from wave_fenics_tpu.core.dofmap import StructuredDofGrid
from wave_fenics_tpu.core.mesh import box_mesh
from wave_fenics_tpu.ops import gather_scatter as gs


@pytest.mark.parametrize("p", [1, 2, 4])
@pytest.mark.parametrize("shape", [(2, 2, 2), (3, 1, 2)])
def test_gather_iota_matches_dofmap(p, shape):
    """gather(iota) == dofmap values — the gpu_scatter_local exact-value test."""
    mesh = box_mesh(shape, (1.0, 1.0, 1.0))
    dg = StructuredDofGrid(mesh, p)
    x = jnp.arange(dg.ndofs, dtype=jnp.float64)
    grid = x.reshape(dg.grid_shape)
    xe = gs.gather_grid(grid, p)
    dm = dg.dofmap()
    np.testing.assert_array_equal(
        np.asarray(xe).reshape(dg.ncells, -1), dm.astype(np.float64)
    )


@pytest.mark.parametrize("p", [1, 2, 3, 4])
def test_scatter_matches_indexed(p):
    mesh = box_mesh((2, 3, 2), (1.0, 1.0, 1.0))
    dg = StructuredDofGrid(mesh, p)
    rng = np.random.default_rng(1)
    m = p + 1
    ye = jnp.asarray(rng.standard_normal((dg.ncells, m, m, m)))
    out_grid = gs.scatter_grid(ye, p, mesh.shape)
    dm = jnp.asarray(dg.dofmap())
    out_ref = gs.scatter_indexed(ye.reshape(dg.ncells, -1), dm, dg.ndofs)
    np.testing.assert_allclose(
        np.asarray(out_grid).ravel(), np.asarray(out_ref), rtol=1e-13, atol=1e-13
    )


@pytest.mark.parametrize("p", [1, 2, 4])
def test_gather_scatter_adjoint(p):
    """<scatter(ye), x> == <ye, gather(x)> — scatter is the exact transpose."""
    mesh = box_mesh((2, 2, 3), (1.0, 1.0, 1.0))
    dg = StructuredDofGrid(mesh, p)
    rng = np.random.default_rng(2)
    m = p + 1
    x = jnp.asarray(rng.standard_normal(dg.grid_shape))
    ye = jnp.asarray(rng.standard_normal((dg.ncells, m, m, m)))
    lhs = jnp.vdot(gs.scatter_grid(ye, p, mesh.shape), x)
    rhs = jnp.vdot(ye, gs.gather_grid(x, p))
    np.testing.assert_allclose(float(lhs), float(rhs), rtol=1e-12)


def test_scatter_counts():
    """scatter(ones) counts cell multiplicity of each dof: 1 interior,
    2 faces, 4 edges, 8 corners (of the cell-block structure)."""
    p = 2
    mesh = box_mesh((2, 2, 2), (1.0, 1.0, 1.0))
    dg = StructuredDofGrid(mesh, p)
    m = p + 1
    ones = jnp.ones((dg.ncells, m, m, m))
    out = np.asarray(gs.scatter_grid(ones, p, mesh.shape))
    counts = np.bincount(dg.dofmap().ravel(), minlength=dg.ndofs).reshape(
        dg.grid_shape
    )
    np.testing.assert_array_equal(out, counts.astype(float))
    assert out.max() == 8.0 and out.min() == 1.0


@pytest.mark.parametrize("p", [1, 3])
def test_gather1d_scatter1d_roundtrip(p):
    n = 4
    N = n * p + 1
    rng = np.random.default_rng(3)
    arr = jnp.asarray(rng.standard_normal((N, 2)))
    xe = gs.gather_1d(arr, p, 0)
    assert xe.shape == (n, p + 1, 2)
    # scatter(gather(x)) multiplies shared nodes by 2
    back = gs.scatter_1d(xe, p, 0)
    mult = np.ones(N)
    mult[p:-1:p] = 2.0
    np.testing.assert_allclose(np.asarray(back), mult[:, None] * np.asarray(arr))


@pytest.mark.parametrize("seed", [0, 7])
def test_ell_scatter_matches_sorted(seed):
    """Transpose-gather scatter == sorted-scatter baseline, including
    high-valence dofs (bucket widths beyond 8)."""
    rng = np.random.default_rng(seed)
    ndofs = 400
    dofmap = rng.integers(0, ndofs, size=(50, 27))
    dofmap.ravel()[:ndofs] = np.arange(ndofs)  # every dof appears
    ye = jnp.asarray(rng.standard_normal(dofmap.shape))
    ref = gs.scatter_indexed(ye, jnp.asarray(dofmap), ndofs)
    ell = gs.build_ell_scatter(dofmap, ndofs)
    got = gs.scatter_ell(ye, ell)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-12)


def test_ell_scatter_on_real_dofmap():
    """On a real CG dofmap the buckets are exactly the 1/2/4/8 multiplicity
    classes and the gather-scatter roundtrip matches the structured path."""
    p = 2
    mesh = box_mesh((3, 2, 2), (1.0, 1.0, 1.0))
    dg = StructuredDofGrid(mesh, p)
    dofmap = dg.dofmap()
    ell = gs.build_ell_scatter(dofmap, dg.ndofs)
    assert sorted(s.shape[1] for _, s in ell.buckets) == [1, 2, 4, 8]
    rng = np.random.default_rng(1)
    ye = jnp.asarray(rng.standard_normal((dg.ncells, (p + 1) ** 3)))
    ref = gs.scatter_indexed(ye, jnp.asarray(dofmap), dg.ndofs)
    got = gs.scatter_ell(ye, ell)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-12)
