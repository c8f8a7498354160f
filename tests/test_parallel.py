"""Distributed tests on the virtual 8-device CPU mesh.

The reference only exercises its distributed paths on real clusters
(SURVEY.md §4.5); here the sharded solver is validated against the
single-device solve exactly, per partition shape.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wave_fenics_tpu.core.mesh import FacetTags, box_mesh
from wave_fenics_tpu.models.linear_wave import LinearWave
from wave_fenics_tpu.ops.operators import StructuredOperators
from wave_fenics_tpu.parallel.partition import (
    block_grid,
    decompose3d,
    unblock_grid,
)
from wave_fenics_tpu.parallel.sharded_wave import ShardedLinearWave, ownership_weights
from wave_fenics_tpu.solvers.cg import cg


def _model(shape=(4, 4, 2), p=3):
    tags = FacetTags({1: (0,), 2: (1,)})
    mesh = box_mesh(shape, (1.0e-2, 1.0e-2, 0.5e-2), facet_tags=tags)
    return LinearWave(mesh, p=p, c0=1500.0, freq0=0.5e6, dtype=jnp.float64)


def test_decompose3d():
    assert decompose3d(8) == (2, 2, 2)
    assert decompose3d(4) == (2, 2, 1)
    assert decompose3d(2) == (2, 1, 1)
    assert decompose3d(1) == (1, 1, 1)
    assert decompose3d(6) == (3, 2, 1)
    assert np.prod(decompose3d(12)) == 12


def test_block_unblock_roundtrip():
    rng = np.random.default_rng(0)
    g = rng.standard_normal((9, 9, 5))  # p=2, cells (4,4,2)
    b = block_grid(g, (2, 2, 1), 2)
    assert b.shape == (2, 2, 1, 5, 5, 5)
    np.testing.assert_array_equal(unblock_grid(b, 2), g)
    # duplicated interface plane present in both blocks
    np.testing.assert_array_equal(b[0, 0, 0][-1], b[1, 0, 0][0])


def test_ownership_weights_count_once():
    w = ownership_weights((2, 2, 2), (5, 5, 5))
    # weighted count of all copies == number of global dofs (9^3)
    np.testing.assert_allclose(w.sum(), 9 * 9 * 9)


@pytest.mark.parametrize("parts", [(2, 1, 1), (2, 2, 1), (2, 2, 2), (4, 2, 1)])
def test_sharded_stiffness_matches_single(parts):
    model = _model()
    sw = ShardedLinearWave(model, parts)
    rng = np.random.default_rng(1)
    g = rng.standard_normal(model.ops.grid_shape)
    y_single = np.asarray(model.ops.stiffness(jnp.asarray(g), 1500.0))
    y_blocked = sw.stiffness(sw.from_global(g), 1500.0)
    np.testing.assert_allclose(sw.to_global(y_blocked), y_single, rtol=1e-12, atol=1e-9)


@pytest.mark.parametrize("parts", [(2, 2, 2), (8, 1, 1)])
def test_sharded_solve_matches_single(parts):
    model = _model(shape=(8, 2, 2), p=3)
    dt = 2e-9
    tf = 100 * dt
    u1, v1, _ = model.solve(0.0, tf, dt)
    sw = ShardedLinearWave(model, parts)
    ub, vb, _ = sw.solve(0.0, tf, dt)
    np.testing.assert_allclose(
        sw.to_global(ub), np.asarray(u1), rtol=1e-10, atol=1e-12
    )
    np.testing.assert_allclose(
        sw.to_global(vb), np.asarray(v1), rtol=1e-10, atol=1e-12
    )
    # duplicated planes consistent across devices
    b = np.asarray(ub)
    np.testing.assert_array_equal(
        unblock_grid(b, model.p).shape,
        tuple(n * model.p + 1 for n in model.mesh.shape),
    )


def test_sharded_dot_matches_global():
    model = _model()
    sw = ShardedLinearWave(model, (2, 2, 2))
    rng = np.random.default_rng(2)
    a = rng.standard_normal(model.ops.grid_shape)
    b = rng.standard_normal(model.ops.grid_shape)
    d = float(sw.dot(sw.from_global(a), sw.from_global(b)))
    np.testing.assert_allclose(d, np.vdot(a, b), rtol=1e-12)


def test_distributed_cg_mass_solve():
    """CG at global level with sharded matvec + weighted dot — the gpu_cg
    workload distributed (cg.hpp:37-121 semantics)."""
    model = _model(shape=(4, 4, 4), p=2)
    sw = ShardedLinearWave(model, (2, 2, 2))
    rng = np.random.default_rng(3)
    b_np = rng.standard_normal(model.ops.grid_shape)
    b = sw.from_global(b_np)
    solve = jax.jit(
        lambda bb: cg(sw.spectral_mass, bb, kmax=60, rtol=1e-10, dot=sw.dot)
    )
    x, k, rnorm = solve(b)
    # residual check against the single-device operator
    xg = jnp.asarray(sw.to_global(x))
    res = np.asarray(model.ops.spectral_mass(xg)) - b_np
    assert np.linalg.norm(res) / np.linalg.norm(b_np) < 1e-8


def test_halo_sync_restores_invariant():
    """halo_sync (update_fwd analogue) repairs broken duplicated planes."""
    from jax import shard_map
    from jax.sharding import NamedSharding, PartitionSpec as P
    from wave_fenics_tpu.parallel.halo import halo_sync
    from wave_fenics_tpu.parallel.partition import block_grid, make_device_mesh

    p = 2
    parts = (2, 2, 2)
    rng = np.random.default_rng(4)
    g = rng.standard_normal((9, 9, 9))
    blocked = block_grid(g, parts, p)
    # corrupt the non-owner copies (low planes of non-first blocks)
    corrupted = blocked.copy()
    corrupted[1, :, :, 0, :, :] = -999.0
    corrupted[:, 1, :, :, 0, :] = -999.0
    corrupted[:, :, 1, :, :, 0] = -999.0
    mesh = make_device_mesh(parts)
    spec = P("x", "y", "z", None, None, None)
    arr = jax.device_put(jnp.asarray(corrupted), NamedSharding(mesh, spec))

    def local(xb):
        sq = xb.reshape(xb.shape[3:])
        return halo_sync(sq, parts).reshape(xb.shape)

    out = shard_map(local, mesh=mesh, in_specs=(spec,), out_specs=spec)(arr)
    np.testing.assert_allclose(np.asarray(out), blocked, atol=1e-12)


@pytest.mark.parametrize("parts", [(2, 2, 2), (4, 1, 2)])
def test_sharded_step_kernel_matches_single_device(parts):
    """Distributed value-halo fused-step path (one kernel + one 3p-deep
    value exchange per step, no per-stage halo-adds) == the single-device
    per-stage padded solver, at machine precision."""
    from wave_fenics_tpu.models.linear_wave_padded import PaddedLinearWave
    from wave_fenics_tpu.parallel.sharded_padded import ShardedPaddedWave

    tags = FacetTags({1: (0,), 2: (1,)})
    mesh = box_mesh((8, 4, 4), (0.02, 0.01, 0.01), facet_tags=tags)
    base = LinearWave(mesh, p=4, dtype=jnp.float64)
    dt = 1e-9
    pm = PaddedLinearWave(base, tile_x=16)
    u_ref, v_ref = pm.solve_n(0.0, dt, 12)
    gu = np.asarray(pm.to_grid(u_ref))
    gv = np.asarray(pm.to_grid(v_ref))

    sw = ShardedPaddedWave(base, parts, tile_x=16)
    assert sw._step_tables is not None
    u, v, _ = sw.solve_step_n(0.0, dt, 12)
    np.testing.assert_allclose(sw.to_global_step(u), gu, rtol=1e-13,
                               atol=1e-15 * max(np.abs(gu).max(), 1e-300))
    np.testing.assert_allclose(sw.to_global_step(v), gv, rtol=1e-13,
                               atol=1e-13 * np.abs(gv).max())


@pytest.mark.parametrize("parts", [(2, 2, 2), (4, 1, 2)])
def test_sharded_lf_kernel_matches_single_device(parts):
    """Distributed value-halo fused LEAPFROG path (one kernel + one
    2p-deep value exchange per step) == the single-device fused leapfrog
    step kernel, at machine precision."""
    from wave_fenics_tpu.models.linear_wave_padded import PaddedLinearWave
    from wave_fenics_tpu.parallel.sharded_padded import ShardedPaddedWave

    tags = FacetTags({1: (0,), 2: (1,)})
    mesh = box_mesh((8, 4, 4), (0.02, 0.01, 0.01), facet_tags=tags)
    base = LinearWave(mesh, p=4, dtype=jnp.float64)
    dt = 1e-9
    pm = PaddedLinearWave(base, tile_x=16)
    u_ref, v_ref, _ = pm.solve_lf_n(0.0, dt, 12)
    gu = np.asarray(pm.to_grid(u_ref))
    gv = np.asarray(pm.to_grid(v_ref))

    sw = ShardedPaddedWave(base, parts, tile_x=16)
    assert sw._lf_tables is not None
    u, v, _ = sw.solve_lf_n(0.0, dt, 12)
    np.testing.assert_allclose(sw.to_global_lf(u), gu, rtol=1e-13,
                               atol=1e-15 * max(np.abs(gu).max(), 1e-300))
    np.testing.assert_allclose(sw.to_global_lf(v), gv, rtol=1e-13,
                               atol=1e-13 * np.abs(gv).max())


@pytest.mark.parametrize("parts", [(2, 2, 2), (4, 1, 2)])
def test_sharded_lf2_kernel_matches_single_device(parts):
    """Distributed 2-step leapfrog (one kernel + one 3p-deep value
    exchange per TWO steps) == the single-device single-step leapfrog
    kernel, at machine precision."""
    from wave_fenics_tpu.models.linear_wave_padded import PaddedLinearWave
    from wave_fenics_tpu.parallel.sharded_padded import ShardedPaddedWave

    tags = FacetTags({1: (0,), 2: (1,)})
    mesh = box_mesh((8, 4, 4), (0.02, 0.01, 0.01), facet_tags=tags)
    base = LinearWave(mesh, p=4, dtype=jnp.float64)
    dt = 1e-9
    pm = PaddedLinearWave(base, tile_x=16)
    u_ref, v_ref, _ = pm.solve_lf_n(0.0, dt, 12)
    gu = np.asarray(pm.to_grid(u_ref))
    gv = np.asarray(pm.to_grid(v_ref))

    sw = ShardedPaddedWave(base, parts, tile_x=16)
    assert sw._lf2_tables is not None
    with pytest.raises(ValueError, match="even"):
        sw.solve_lf2_n(0.0, dt, 11)
    u, v, _ = sw.solve_lf2_n(0.0, dt, 12)
    np.testing.assert_allclose(sw.to_global_lf2(u), gu, rtol=1e-13,
                               atol=1e-15 * max(np.abs(gu).max(), 1e-300))
    np.testing.assert_allclose(sw.to_global_lf2(v), gv, rtol=1e-13,
                               atol=1e-13 * np.abs(gv).max())


@pytest.mark.parametrize("cells,parts", [((8, 4, 4), (2, 2, 2)),
                                         ((15, 4, 4), (3, 1, 1))])
def test_sharded_rk42_kernel_matches_single_device(cells, parts):
    """Distributed 2-step RK4 (one kernel + one 6p-deep value exchange
    per TWO steps) == the single-device single-step RK4 kernel, from a
    RANDOM O(1) initial state (non-vacuous for deep-halo staleness —
    zero-state face-source runs leave the deep-halo field exponentially
    small; experiments/exp_halo_staleness_probe.py). The (3,1,1) case
    sits exactly on the n>=5 one-hop supply guard boundary."""
    from wave_fenics_tpu.models.linear_wave_padded import PaddedLinearWave
    from wave_fenics_tpu.parallel.sharded_padded import ShardedPaddedWave

    tags = FacetTags({1: (0,), 2: (1,)})
    mesh = box_mesh(cells, (0.0025 * cells[0], 0.01, 0.01),
                    facet_tags=tags)
    base = LinearWave(mesh, p=4, dtype=jnp.float64)
    dt = 1e-9
    pm = PaddedLinearWave(base, tile_x=24)
    rng = np.random.default_rng(3)
    gshape = tuple(n * 4 + 1 for n in cells)
    u0g = rng.standard_normal(gshape)
    v0g = rng.standard_normal(gshape)
    u_ref, v_ref, _ = pm.solve_step_n(
        0.0, dt, 12, pm.from_grid(jnp.asarray(u0g)),
        pm.from_grid(jnp.asarray(v0g)))
    gu = np.asarray(pm.to_grid(u_ref))
    gv = np.asarray(pm.to_grid(v_ref))

    sw = ShardedPaddedWave(base, parts, tile_x=24)
    assert sw._rk42_tables is not None
    with pytest.raises(ValueError, match="even"):
        sw.solve_step2_n(0.0, dt, 11)
    lay = sw._rk42_layout
    ub = sw.from_global(u0g, lay)
    vb = sw.from_global(v0g, lay)
    u, v, _ = sw.solve_step2_n(0.0, dt, 12, ub, vb)
    np.testing.assert_allclose(sw.to_global_rk42(u), gu, rtol=1e-13,
                               atol=1e-13 * np.abs(gu).max())
    np.testing.assert_allclose(sw.to_global_rk42(v), gv, rtol=1e-13,
                               atol=1e-13 * np.abs(gv).max())


def test_sharded_rk42_unavailable_raises():
    """< 5 cells/block on an axis split >= 3 ways cannot supply the 6p
    one-hop value halo — solve_step2_n must raise (no silent fallback)."""
    from wave_fenics_tpu.parallel.sharded_padded import ShardedPaddedWave

    tags = FacetTags({1: (0,), 2: (1,)})
    mesh = box_mesh((8, 4, 4), (0.02, 0.01, 0.01), facet_tags=tags)
    base = LinearWave(mesh, p=4, dtype=jnp.float64)
    sw = ShardedPaddedWave(base, (4, 1, 2), tile_x=24)
    assert sw._rk42_tables is None
    with pytest.raises(ValueError, match="2-step RK4"):
        sw.solve_step2_n(0.0, 1e-9, 2)


def test_sharded_lf_unavailable_raises():
    """1 cell per block on an axis split >= 3 ways cannot supply the 2p
    one-hop value halo either — solve_lf_n must raise (no silent
    fallback with a 4x different cost profile)."""
    from wave_fenics_tpu.parallel.sharded_padded import ShardedPaddedWave

    tags = FacetTags({1: (0,), 2: (1,)})
    mesh = box_mesh((4, 2, 2), (0.02, 0.01, 0.01), facet_tags=tags)
    base = LinearWave(mesh, p=4, dtype=jnp.float64)
    sw = ShardedPaddedWave(base, (4, 1, 1), tile_x=16)
    assert sw._lf_layout is None
    with pytest.raises(ValueError, match="leapfrog"):
        sw.solve_lf_n(0.0, 1e-9, 2)


def test_sharded_step_min_extent_guard_falls_back():
    """1 cell per block on an axis split >= 3 ways cannot supply a valid
    3p one-hop value halo (the sent slab would include the sender's own
    halo rows, valid only to depth p) — the step path must refuse and
    solve_step_n must fall back to the per-stage halo-add path, which
    still matches the single-device solve."""
    from wave_fenics_tpu.models.linear_wave_padded import PaddedLinearWave
    from wave_fenics_tpu.parallel.sharded_padded import ShardedPaddedWave

    tags = FacetTags({1: (0,), 2: (1,)})
    mesh = box_mesh((4, 2, 2), (0.02, 0.01, 0.01), facet_tags=tags)
    base = LinearWave(mesh, p=4, dtype=jnp.float64)
    sw = ShardedPaddedWave(base, (4, 1, 1), tile_x=16)
    assert sw._step_layout is None
    assert sw._step_tables is None
    dt = 1e-9
    u, v, _ = sw.solve_step_n(0.0, dt, 6)  # falls back to solve_n
    pm = PaddedLinearWave(base, tile_x=16)
    u_ref, v_ref = pm.solve_n(0.0, dt, 6)
    gv = np.asarray(pm.to_grid(v_ref))
    np.testing.assert_allclose(sw.to_global(v), gv, rtol=1e-13,
                               atol=1e-13 * np.abs(gv).max())


def test_sharded_step_duplicated_plane_bitwise():
    """After the value-halo refresh, duplicated x-interface planes are
    canonicalized to the low-side owner: both copies bitwise equal."""
    from wave_fenics_tpu.parallel.sharded_padded import ShardedPaddedWave

    tags = FacetTags({1: (0,), 2: (1,)})
    mesh = box_mesh((8, 4, 4), (0.02, 0.01, 0.01), facet_tags=tags)
    base = LinearWave(mesh, p=4, dtype=jnp.float64)
    sw = ShardedPaddedWave(base, (2, 2, 1), tile_x=16)
    dt = 1e-9
    u, v, _ = sw.solve_step_n(0.0, dt, 8)
    # refresh once more so the duplicated planes are canonicalized state
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    spec = P("x", "y", "z", None, None, None)
    refresh = shard_map(
        lambda a: sw._refresh_value_halos(a.reshape(a.shape[3:])).reshape(
            a.shape
        ),
        mesh=sw.mesh, in_specs=(spec,), out_specs=spec, check_vma=False,
    )
    v = refresh(v)
    lay = sw._step_layout
    vb = np.asarray(v)
    inter = lay.interior
    left = vb[0, 0, 0][inter][-1]
    right = vb[1, 0, 0][inter][0]
    np.testing.assert_array_equal(left, right)
