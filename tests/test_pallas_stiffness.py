"""Fused Pallas stiffness kernel vs the XLA separable path (interpret mode
on CPU; the same kernel compiles with Mosaic on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import wave_fenics_tpu.ops.pallas_stiffness as ps
from wave_fenics_tpu.core.mesh import box_mesh
from wave_fenics_tpu.ops.operators import StructuredOperators
from wave_fenics_tpu.ops.separable import stiffness_separable


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    import jax.experimental.pallas as pl

    orig = pl.pallas_call

    def patched(*args, **kw):
        kw.setdefault("interpret", True)
        return orig(*args, **kw)

    monkeypatch.setattr(ps.pl, "pallas_call", patched)
    yield


def test_stencil_coeffs_interior_row():
    A = np.arange(25, dtype=np.float64).reshape(5, 5)
    C = ps.build_stencil_coeffs(A, 4)
    # interior row r=2: C[2, j-2+4] = A[2, j]
    np.testing.assert_array_equal(C[2, 2:7], A[2])
    # r=0 merges A[0, :] (k=0..p) and A[4, :] (k=-p..0); overlap at k=0
    assert C[0, 4] == A[0, 0] + A[4, 4]


@pytest.mark.parametrize("p", [2, 4])
@pytest.mark.parametrize("shape", [(4, 3, 3), (8, 2, 2)])
def test_fused_matches_separable(p, shape):
    mesh = box_mesh(shape, (1.0, 0.8, 1.2))
    ops = StructuredOperators(mesh, p, dtype=jnp.float64)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(ops.grid_shape))
    coeff = -(1500.0**2)
    y_ref = stiffness_separable(x, ops._sepA, ops._seplines, p, coeff)
    y = ps.stiffness_fused(x, ops._sepA, ops._seplines, p, coeff)
    np.testing.assert_allclose(
        np.asarray(y), np.asarray(y_ref), rtol=1e-11, atol=1e-6
    )


@pytest.mark.parametrize("tile_x", [4, 8])
def test_fused_ragged_tiles(tile_x):
    """Nx = 17 with tile 4/8 exercises partial last tiles."""
    p = 4
    mesh = box_mesh((4, 2, 2), (1.0, 1.0, 1.0))
    ops = StructuredOperators(mesh, p, dtype=jnp.float64)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal(ops.grid_shape))
    y_ref = stiffness_separable(x, ops._sepA, ops._seplines, p, -1.0)
    y = ps.stiffness_fused(x, ops._sepA, ops._seplines, p, -1.0, tile_x=tile_x)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), rtol=1e-11,
                               atol=1e-12)


@pytest.mark.parametrize("variant", ["vpu", "mxu"])
@pytest.mark.parametrize("p", [2, 4])
def test_fused_variants_match(variant, p):
    mesh = box_mesh((4, 2, 3), (1.0, 0.8, 1.2))
    ops = StructuredOperators(mesh, p, dtype=jnp.float64)
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal(ops.grid_shape))
    y_ref = stiffness_separable(x, ops._sepA, ops._seplines, p, -2.25e6)
    y = ps.stiffness_fused(x, ops._sepA, ops._seplines, p, -2.25e6,
                           variant=variant)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=1e-11, atol=1e-5)
