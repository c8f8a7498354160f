"""Padded-layout model vs the reference-semantics model (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wave_fenics_tpu.core.mesh import FacetTags, box_mesh
from wave_fenics_tpu.models.linear_wave import LinearWave
from wave_fenics_tpu.models.linear_wave_padded import PaddedLinearWave
from wave_fenics_tpu.ops.pallas_wave import PaddedLayout


def _model(shape=(4, 2, 2), p=4):
    tags = FacetTags({1: (0,), 2: (1,)})
    mesh = box_mesh(shape, (0.01, 0.005, 0.005), facet_tags=tags)
    return LinearWave(mesh, p=p, dtype=jnp.float64)


def test_layout_roundtrip():
    lay = PaddedLayout(shape=(17, 9, 9), p=4, tile_x=16)
    assert lay.padded_shape == ((2 + 2) * 16, 24, 128)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((17, 9, 9)))
    np.testing.assert_array_equal(np.asarray(lay.unpad(lay.pad(x))), np.asarray(x))


@pytest.mark.parametrize("p", [2, 4])
def test_padded_stiffness_matches_base(p):
    base = _model(p=p)
    pm = PaddedLinearWave(base, tile_x=16)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal(base.ops.grid_shape))
    # padded kernel returns stiffness/m; compare with base f1 sans boundary
    kv_p = pm._apply(pm.from_grid(x))
    ref = base.ops.stiffness(x, base.c0) * base.inv_m
    np.testing.assert_allclose(
        np.asarray(pm.to_grid(kv_p)), np.asarray(ref), rtol=1e-9, atol=1e-6
    )
    # padding stays zero
    outside = np.asarray(kv_p).copy()
    outside[tuple(pm.layout.interior)] = 0.0
    assert np.abs(outside).max() == 0.0


def test_padded_solve_matches_base():
    base = _model()
    pm = PaddedLinearWave(base, tile_x=16)
    dt = 1e-9
    nsteps = 25
    u_ref, v_ref, _ = base.solve(0.0, nsteps * dt, dt)
    u_p, v_p, _ = pm.solve(0.0, nsteps * dt, dt)
    np.testing.assert_allclose(
        np.asarray(pm.to_grid(u_p)), np.asarray(u_ref), rtol=1e-10, atol=1e-18
    )
    np.testing.assert_allclose(
        np.asarray(pm.to_grid(v_p)), np.asarray(v_ref), rtol=1e-10, atol=1e-12
    )
