"""EA operator and assembled-sparse baselines vs matrix-free operators."""

import jax.numpy as jnp
import numpy as np
import pytest

from wave_fenics_tpu.core.dofmap import build_dofmap
from wave_fenics_tpu.core.mesh import box_mesh
from wave_fenics_tpu.ops.assembled import (
    EAOperator,
    assemble_csr,
    assemble_element_tensors,
)
from wave_fenics_tpu.ops.operators import GeneralOperators


def _mesh(seed=0):
    m = box_mesh((2, 2, 2), (1.0, 1.1, 0.9)).to_hex_mesh()
    rng = np.random.default_rng(seed)
    return type(m)(
        points=m.points + 0.03 * rng.standard_normal(m.points.shape),
        cells=m.cells,
    )


@pytest.mark.parametrize("kind", ["mass", "stiffness"])
def test_ea_matches_matrix_free(kind):
    mesh = _mesh()
    p = 3
    dofs = build_dofmap(mesh, p)
    mf = GeneralOperators(mesh, dofs, dtype=jnp.float64)
    A_e = assemble_element_tensors(mesh, p, kind=kind,
                                   coeff=-1.0 if kind == "stiffness" else 1.0)
    ea = EAOperator(dofs, A_e, dtype=jnp.float64)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal(dofs.ndofs))
    y_ea = np.asarray(ea(x))
    y_mf = np.asarray(mf.mass(x) if kind == "mass" else mf.stiffness(x, 1.0))
    np.testing.assert_allclose(y_ea, y_mf, rtol=1e-9, atol=1e-10)


def test_csr_matches_ea():
    mesh = _mesh(2)
    p = 2
    dofs = build_dofmap(mesh, p)
    A_e = assemble_element_tensors(mesh, p, kind="mass")
    ea = EAOperator(dofs, A_e, dtype=jnp.float64)
    M = assemble_csr(dofs, A_e)
    rng = np.random.default_rng(3)
    x = rng.standard_normal(dofs.ndofs)
    np.testing.assert_allclose(M @ x, np.asarray(ea(jnp.asarray(x))),
                               rtol=1e-10, atol=1e-12)
    # sparse assembled mass is symmetric
    assert abs(M - M.T).max() < 1e-12
