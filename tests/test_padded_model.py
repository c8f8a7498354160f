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


@pytest.mark.parametrize("p", [2, 4])
def test_padded_yz_matmul_variant(p):
    from wave_fenics_tpu.ops.pallas_wave import make_padded_stiffness
    from wave_fenics_tpu.ops.separable import grid_lines, separable_stiffness_tables

    base = _model(p=p)
    lay = PaddedLayout(
        shape=tuple(n * p + 1 for n in base.mesh.shape), p=p, tile_x=8
    )
    A, _ = separable_stiffness_tables(p, base.mesh.h, jnp.float64)
    lines = grid_lines(base.mesh.shape, p, jnp.float64)
    f_roll = make_padded_stiffness(lay, A, lines, -2.25e6, dtype=jnp.float64)
    f_mm = make_padded_stiffness(
        lay, A, lines, -2.25e6, dtype=jnp.float64, yz_matmul=True
    )
    rng = np.random.default_rng(7)
    x = lay.pad(jnp.asarray(rng.standard_normal(lay.shape)))
    np.testing.assert_allclose(
        np.asarray(f_mm(x)), np.asarray(f_roll(x)), rtol=1e-11, atol=1e-6
    )


@pytest.mark.parametrize("parts", [(2, 1, 1), (2, 2, 2)])
def test_sharded_padded_matches_single(parts):
    """Multi-chip padded path == single-device reference solve (8 virtual
    CPU devices, interpret-mode kernel)."""
    from wave_fenics_tpu.parallel.sharded_padded import ShardedPaddedWave

    base = _model(shape=(4, 2, 2), p=3)
    dt = 1e-9
    nsteps = 10
    u_ref, v_ref, _ = base.solve(0.0, nsteps * dt, dt)
    sw = ShardedPaddedWave(base, parts, tile_x=8)
    u_p, v_p, _ = sw.solve(0.0, nsteps * dt, dt)
    np.testing.assert_allclose(
        sw.to_global(u_p), np.asarray(u_ref), rtol=1e-10, atol=1e-18
    )
    np.testing.assert_allclose(
        sw.to_global(v_p), np.asarray(v_ref), rtol=1e-10, atol=1e-12
    )


@pytest.mark.parametrize("p,tile_x", [(4, 16), (2, 16), (3, 24)])
def test_flat_kernel_matches_3d(p, tile_x):
    from wave_fenics_tpu.ops.pallas_wave import (
        build_tables_flat, make_apply_flat, make_padded_stiffness,
    )
    from wave_fenics_tpu.ops.separable import grid_lines, separable_stiffness_tables
    from wave_fenics_tpu.core.basis import lumped_weight_line

    base = _model(shape=(4, 2, 3), p=p)
    shape = tuple(n * p + 1 for n in base.mesh.shape)
    lay3 = PaddedLayout(shape=shape, p=p, tile_x=tile_x)
    layf = PaddedLayout(shape=shape, p=p, tile_x=tile_x, z_align=16)
    A, _ = separable_stiffness_tables(p, base.mesh.h, jnp.float64)
    lines = grid_lines(base.mesh.shape, p, jnp.float64)
    m_lines = [
        lumped_weight_line(base.mesh.shape[d], p, base.mesh.h[d])
        for d in range(3)
    ]
    f3 = make_padded_stiffness(lay3, A, lines, -2.25e6, inv_m_lines=m_lines,
                               dtype=jnp.float64)
    tabs = [jnp.asarray(t) for t in build_tables_flat(
        layf, A, lines, -2.25e6, inv_m_lines=m_lines, dtype=jnp.float64)]
    ff = make_apply_flat(layf, dtype=jnp.float64)
    rng = np.random.default_rng(9)
    x = jnp.asarray(rng.standard_normal(shape))
    y3 = lay3.unpad(f3(lay3.pad(x)))
    yf = layf.unpad(ff(layf.pad(x), *tabs))
    np.testing.assert_allclose(np.asarray(yf), np.asarray(y3),
                               rtol=1e-11, atol=1e-9)


def test_fused_stage_solve_matches_base():
    """Fully fused RK-stage kernel == reference-semantics solve (f64)."""
    base = _model(shape=(4, 2, 2), p=4)
    pm = PaddedLinearWave(base, tile_x=16)
    dt = 1e-9
    u1, v1, _ = base.solve(0.0, 25 * dt, dt)
    u2, v2, _ = pm.solve_fused_n(0.0, dt, 25)
    vmax = float(jnp.max(jnp.abs(v1)))
    assert float(jnp.max(jnp.abs(pm.to_grid(u2) - u1))) < 1e-12 * max(vmax, 1)
    assert float(jnp.max(jnp.abs(pm.to_grid(v2) - v1))) < 1e-12 * vmax


def test_bf16_state_runs_and_stays_finite():
    """bf16 state path compiles and stays finite (accuracy is use-at-own-risk;
    f32 is the production dtype)."""
    base_tags = FacetTags({1: (0,), 2: (1,)})
    mesh = box_mesh((4, 2, 2), (0.01, 0.005, 0.005), facet_tags=base_tags)
    model = LinearWave(mesh, p=4, dtype=jnp.bfloat16)
    dt = 1e-9
    u, v, _ = model.solve(0.0, 10 * dt, dt)
    assert u.dtype == jnp.bfloat16
    assert np.isfinite(np.asarray(v, dtype=np.float32)).all()
    assert float(jnp.abs(v.astype(jnp.float32)).max()) > 0


def test_sharded_padded_3d_kernel_variant():
    """The 3D-slab kernel variant of the sharded path stays correct."""
    from wave_fenics_tpu.parallel.sharded_padded import ShardedPaddedWave

    base = _model(shape=(4, 2, 2), p=3)
    dt = 1e-9
    u_ref, v_ref, _ = base.solve(0.0, 10 * dt, dt)
    sw = ShardedPaddedWave(base, (2, 1, 1), tile_x=8, kernel="3d")
    u_p, v_p, _ = sw.solve(0.0, 10 * dt, dt)
    np.testing.assert_allclose(
        sw.to_global(v_p), np.asarray(v_ref), rtol=1e-10, atol=1e-12
    )


def test_sharded_padded_multitile_per_device():
    """Multiple interior x-tiles per device + cross-device halo together."""
    from wave_fenics_tpu.parallel.sharded_padded import ShardedPaddedWave

    base = _model(shape=(16, 1, 1), p=3)
    dt = 1e-9
    u_ref, v_ref, _ = base.solve(0.0, 8 * dt, dt)
    sw = ShardedPaddedWave(base, (2, 1, 1), tile_x=8)  # local Nx=25 -> 2 tiles
    assert sw.layout.ntx >= 2
    u_p, v_p, _ = sw.solve(0.0, 8 * dt, dt)
    np.testing.assert_allclose(
        sw.to_global(v_p), np.asarray(v_ref), rtol=1e-10, atol=1e-12
    )


def test_sharded_padded_non_power_of_two_mesh():
    """Device meshes need not be powers of two (the reference's Cartesian
    partitioner required 2^s ranks, mesh.hpp:263-271)."""
    from wave_fenics_tpu.parallel.sharded_padded import ShardedPaddedWave

    base = _model(shape=(6, 2, 2), p=3)
    dt = 1e-9
    u_ref, v_ref, _ = base.solve(0.0, 8 * dt, dt)
    sw = ShardedPaddedWave(base, (3, 2, 1), tile_x=8)  # 6 devices
    u_p, v_p, _ = sw.solve(0.0, 8 * dt, dt)
    np.testing.assert_allclose(
        sw.to_global(v_p), np.asarray(v_ref), rtol=1e-10, atol=1e-12
    )


def test_padded_high_degree_fallback():
    """p=9 exceeds the flat kernel's halo window; the 3D kernel takes over."""
    base = _model(shape=(2, 1, 1), p=9)
    pm = PaddedLinearWave(base, tile_x=16)
    assert pm._kernel_resolved == "3d"
    rng = np.random.default_rng(10)
    x = jnp.asarray(rng.standard_normal(base.ops.grid_shape))
    kv = pm._apply(pm.from_grid(x))
    ref = base.ops.stiffness(x, base.c0) * base.inv_m
    np.testing.assert_allclose(
        np.asarray(pm.to_grid(kv)), np.asarray(ref), rtol=1e-9, atol=1e-6
    )


def test_sharded_overlap_on_off_equivalent():
    """The overlapped x-face exchange (faces recomputed from u, ppermute
    issued before the kernel) equals the post-kernel halo-add path, and both
    keep the duplicated interface plane bitwise-consistent across copies."""
    from wave_fenics_tpu.parallel.sharded_padded import ShardedPaddedWave

    base = _model(shape=(4, 2, 2), p=3)
    dt = 1e-9
    sw_ov = ShardedPaddedWave(base, (2, 2, 1), tile_x=8, overlap_x=True)
    sw_no = ShardedPaddedWave(base, (2, 2, 1), tile_x=8, overlap_x=False)
    u_o, v_o, _ = sw_ov.solve(0.0, 10 * dt, dt)
    u_n, v_n, _ = sw_no.solve(0.0, 10 * dt, dt)
    np.testing.assert_allclose(
        sw_ov.to_global(v_o), sw_no.to_global(v_n), rtol=1e-10, atol=1e-13
    )
    # duplicated x-interface plane: the two copies must be EXACTLY equal
    # (both compute faces_mine + faces_received with swapped operands)
    lay = sw_ov.layout
    vb = np.asarray(v_o)
    inter = lay.interior
    left = vb[0, 0, 0][inter][-1]   # hi plane of block bx=0
    right = vb[1, 0, 0][inter][0]   # lo plane of block bx=1
    np.testing.assert_array_equal(left, right)


def test_fused_step_solve_matches_base():
    """Communication-avoiding fused RK4 STEP kernel (one pallas call per
    timestep, ops.pallas_rk4step) == reference-semantics solve (f64)."""
    base = _model(shape=(4, 2, 2), p=4)
    pm = PaddedLinearWave(base, tile_x=16)
    assert pm._step_fn is not None
    dt = 1e-9
    u1, v1, _ = base.solve(0.0, 25 * dt, dt)
    u2, v2, _ = pm.solve_step_n(0.0, dt, 25)
    vmax = float(jnp.max(jnp.abs(v1)))
    assert float(jnp.max(jnp.abs(pm.to_grid(u2) - u1))) < 1e-12 * max(vmax, 1)
    assert float(jnp.max(jnp.abs(pm.to_grid(v2) - v1))) < 1e-12 * vmax


@pytest.mark.parametrize("p", [2, 4])
def test_lean_step_kernel_matches_reference_kernel(p):
    """The compute-lean RK4 step kernel (_kernel_rk4_step_lean:
    collapsed stage algebra, pl.when face-plane source/ABC terms,
    merged shift-0 y/z tap) == the reference step kernel, f64 (the
    algebra is exact for the linear system; only association order
    differs). Distinct per-stage sources exercise all four g paths;
    the model has both a source and an ABC face."""
    from wave_fenics_tpu.models.linear_wave_padded import _x_face_planes
    from wave_fenics_tpu.ops.pallas_rk4step import (build_step_tables,
                                                    make_rk4_step_raw)
    from wave_fenics_tpu.ops.separable import (grid_lines,
                                               separable_stiffness_tables)

    base = _model(shape=(4, 2, 2), p=p)
    pm = PaddedLinearWave(base, tile_x=16)
    lay, b = pm.layout, pm.base
    w1, w2, src_x, abc_x = _x_face_planes(pm)
    A, _ = separable_stiffness_tables(b.p, b.mesh.h, b.dtype)
    lines = grid_lines(b.mesh.shape, b.p, b.dtype)
    tab = tuple(jnp.asarray(t) for t in build_step_tables(
        lay, A, lines, -float(b.c0) ** 2, pm._m_lines,
        w1, w2, src_x, abc_x, dtype=b.dtype,
    ))
    s_ref = make_rk4_step_raw(lay, b.c0, dtype=b.dtype)
    s_lean = make_rk4_step_raw(lay, b.c0, dtype=b.dtype, lean=True)
    dt = 1e-9
    gs = (1.0, 0.7, 0.4, 0.1)
    ur, vr = pm.zero_state()
    ul, vl = pm.zero_state()
    for _ in range(10):
        ur, vr = s_ref(ur, vr, dt, *gs, *tab)
        ul, vl = s_lean(ul, vl, dt, *gs, *tab)
    vmax = float(jnp.max(jnp.abs(vr))) or 1.0
    assert float(jnp.max(jnp.abs(ur - ul))) < 1e-13 * max(vmax, 1)
    assert float(jnp.max(jnp.abs(vr - vl))) < 1e-13 * vmax


def test_lean_step_env_knob(monkeypatch):
    """WAVE_FENICS_STEP_LEAN=1 routes solve_step_n through the lean
    kernel and the solution still matches the reference-semantics
    model (f64)."""
    monkeypatch.setenv("WAVE_FENICS_STEP_LEAN", "1")
    base = _model(shape=(4, 2, 2), p=4)
    pm = PaddedLinearWave(base, tile_x=16)
    assert pm._step_fn is not None
    dt = 1e-9
    u1, v1, _ = base.solve(0.0, 25 * dt, dt)
    u2, v2, _ = pm.solve_step_n(0.0, dt, 25)
    vmax = float(jnp.max(jnp.abs(v1)))
    assert float(jnp.max(jnp.abs(pm.to_grid(u2) - u1))) < 1e-12 * max(vmax, 1)
    assert float(jnp.max(jnp.abs(pm.to_grid(v2) - v1))) < 1e-12 * vmax


@pytest.mark.parametrize("p", [2, 3, 5])
def test_fused_step_other_degrees(p):
    """Step-kernel window bookkeeping holds for p != 4 (off0 rounding)."""
    base = _model(shape=(4, 2, 2), p=p)
    pm = PaddedLinearWave(base, tile_x=16)
    assert pm._step_fn is not None
    dt = 1e-9
    u1, v1, _ = pm.solve_fused_n(0.0, dt, 10)
    u2, v2, _ = pm.solve_step_n(0.0, dt, 10)
    vmax = float(jnp.max(jnp.abs(v1)))
    assert float(jnp.max(jnp.abs(u2 - u1))) < 1e-12 * max(vmax, 1)
    assert float(jnp.max(jnp.abs(v2 - v1))) < 1e-12 * vmax


def test_fused_step_fallback_when_unavailable():
    """p=8 needs a 24-row slab halo > tile_x=16: solve_step_n must fall
    back to the per-stage path rather than mis-window."""
    base = _model(shape=(4, 2, 2), p=8)
    pm = PaddedLinearWave(base, tile_x=16)
    assert pm._step_fn is None  # off0(8)=24 > tile_x=16
    dt = 1e-9
    u1, v1, _ = pm.solve_fused_n(0.0, dt, 5)
    u2, v2, _ = pm.solve_step_n(0.0, dt, 5)
    np.testing.assert_array_equal(np.asarray(u1), np.asarray(u2))


def test_jit_first_access_no_tracer_leak():
    """Jitting solve_step_n/solve_fused_n BEFORE any eager access must not
    cache tracers in the lazily-built table properties (regression: the
    cached_property constants leaked tracers when first built inside a jit
    trace; guarded by jax.ensure_compile_time_eval)."""
    base = _model()
    pm = PaddedLinearWave(base, tile_x=16)
    dt = 1e-8
    u0, v0 = pm.zero_state()
    # first-ever access happens inside the trace
    us, vs, _ = jax.jit(
        lambda u, v: pm.solve_step_n(0.0, dt, 2, u, v)
    )(u0, v0)
    # the cached tables must now be concrete: eager reuse works
    ue, ve, _ = pm.solve_step_n(0.0, dt, 2, u0, v0)
    np.testing.assert_allclose(np.asarray(us), np.asarray(ue), rtol=1e-12)
    pm2 = PaddedLinearWave(_model(), tile_x=16)
    uf, _, _ = jax.jit(
        lambda u, v: pm2.solve_fused_n(0.0, dt, 2, u, v)
    )(*pm2.zero_state())
    np.testing.assert_allclose(np.asarray(uf), np.asarray(ue), rtol=1e-12)


def test_dynamic_step_count_solvers_match_scan():
    """solve_step_dyn / solve_fused_dyn (traced step count, fori_loop —
    one executable for any window length, what bench.py's canary+timed
    rely on) must match the static-scan solvers exactly."""
    import jax.numpy as jnp

    base = _model()
    pm = PaddedLinearWave(base, tile_x=16)
    dt = 1e-8
    u0, v0 = pm.zero_state()
    us, vs, _ = pm.solve_step_n(0.0, dt, 4, u0, v0)
    run = jax.jit(lambda u, v, n: pm.solve_step_dyn(0.0, dt, n, u, v))
    ud, vd = run(u0, v0, jnp.int32(4))
    np.testing.assert_allclose(np.asarray(vd), np.asarray(vs), rtol=1e-13,
                               atol=1e-13 * np.abs(np.asarray(vs)).max())
    # same executable serves a different length
    ud1, vd1 = run(u0, v0, jnp.int32(1))
    us1, vs1, _ = pm.solve_step_n(0.0, dt, 1, u0, v0)
    np.testing.assert_allclose(np.asarray(vd1), np.asarray(vs1), rtol=1e-13,
                               atol=1e-13 * np.abs(np.asarray(vs1)).max())
    uf, vf, _ = pm.solve_fused_n(0.0, dt, 4, u0, v0)
    ufd, vfd = jax.jit(
        lambda u, v, n: pm.solve_fused_dyn(0.0, dt, n, u, v)
    )(u0, v0, jnp.int32(4))
    np.testing.assert_allclose(np.asarray(vfd), np.asarray(vf), rtol=1e-13,
                               atol=1e-13 * np.abs(np.asarray(vf)).max())


def _padded_damping(pm):
    """Diagonal ABC damping D = c0 * W2/m scattered into a padded array
    (the leapfrog split of pm.f1; solvers/leapfrog.py)."""
    damp = jnp.zeros(pm.layout.padded_shape, dtype=pm.base.dtype)
    for axis, pidx, attr, plane in pm._boundary_planes:
        if attr == "w2":
            damp = damp.at[pidx].add(pm.base.c0 * plane)
    return damp


@pytest.mark.parametrize("p", [2, 3, 4, 5])
def test_lf_step_matches_xla_leapfrog(p):
    """Fused leapfrog STEP kernel (one pallas call per step,
    ops.pallas_lfstep) == the XLA leapfrog integrator on the padded
    model (f64): same kick-drift-kick scheme, same physics split."""
    from wave_fenics_tpu.solvers.leapfrog import leapfrog_solve_n

    base = _model(shape=(4, 2, 2), p=p)
    pm = PaddedLinearWave(base, tile_x=16)
    assert pm._lf_step_fn is not None
    dt = 1e-9
    nsteps = 25
    u0, v0 = pm.zero_state()
    force = lambda t, u: pm.f1(t, u, jnp.zeros_like(u))
    u1, v1 = leapfrog_solve_n(force, _padded_damping(pm), u0, v0, 0.0,
                              dt, nsteps)
    u2, v2, _ = pm.solve_lf_n(0.0, dt, nsteps)
    vmax = float(jnp.max(jnp.abs(v1)))
    assert vmax > 0.0
    assert float(jnp.max(jnp.abs(u2 - u1))) < 1e-12 * max(vmax, 1)
    assert float(jnp.max(jnp.abs(v2 - v1))) < 1e-12 * vmax


def test_lf_step_second_order_vs_rk4():
    """The fused leapfrog step converges to the RK4 solution at O(dt^2)
    (the integrator itself, through the kernel path)."""
    base = _model(shape=(4, 2, 2), p=4)
    pm = PaddedLinearWave(base, tile_x=16)
    dt = 4e-9
    T = 64 * dt
    u_ref, v_ref, _ = pm.solve_step_n(0.0, dt / 4, 256)
    scale = float(jnp.max(jnp.abs(u_ref)))
    e1 = float(jnp.max(jnp.abs(
        pm.solve_lf_n(0.0, dt / 2, 128)[0] - u_ref))) / scale
    e2 = float(jnp.max(jnp.abs(
        pm.solve_lf_n(0.0, dt / 4, 256)[0] - u_ref))) / scale
    assert e2 < 0.02, e2
    assert 2.8 < e1 / e2 < 5.5, (e1, e2, e1 / e2)


@pytest.mark.parametrize("p", [2, 3, 4, 5])
@pytest.mark.parametrize("nsteps", [24, 25])
def test_lf2_step_matches_lf_step(p, nsteps):
    """Temporal-blocked 2-step leapfrog kernel (ops.pallas_lf2step) ==
    the single-step leapfrog kernel at machine precision (f64), even
    and odd step counts (odd tail runs the single-step kernel)."""
    base = _model(shape=(4, 2, 2), p=p)
    pm = PaddedLinearWave(base, tile_x=16)
    assert pm._lf2_step_fn is not None
    dt = 1e-9
    u1, v1, _ = pm.solve_lf_n(0.0, dt, nsteps)
    u2, v2, _ = pm.solve_lf2_n(0.0, dt, nsteps)
    vmax = float(jnp.max(jnp.abs(v1)))
    assert vmax > 0.0
    assert float(jnp.max(jnp.abs(u2 - u1))) < 1e-13 * max(vmax, 1)
    assert float(jnp.max(jnp.abs(v2 - v1))) < 1e-13 * vmax


@pytest.mark.parametrize("p,tile", [(2, 16), (3, 24), (4, 24), (5, 40)])
@pytest.mark.parametrize("nsteps", [12, 13])
def test_rk42_step_matches_rk4_step(p, tile, nsteps):
    """Temporal-blocked 2-step RK4 kernel (ops.pallas_rk42step) == the
    single-step RK4 kernel at machine precision (f64), even and odd
    step counts (odd tail runs the single-step kernel)."""
    base = _model(shape=(4, 2, 2), p=p)
    pm = PaddedLinearWave(base, tile_x=tile)
    assert pm._rk42_step_fn is not None
    dt = 1e-9
    u1, v1, _ = pm.solve_step_n(0.0, dt, nsteps)
    u2, v2, _ = pm.solve_step2_n(0.0, dt, nsteps)
    vmax = float(jnp.max(jnp.abs(v1)))
    assert vmax > 0.0
    assert float(jnp.max(jnp.abs(u2 - u1))) < 1e-12 * max(vmax, 1)
    assert float(jnp.max(jnp.abs(v2 - v1))) < 1e-12 * vmax


def test_rk42_step_unavailable_raises():
    """No silent fallback: tile_x=16 < the 6p slab halo at p=4."""
    base = _model(shape=(4, 2, 2), p=4)
    pm = PaddedLinearWave(base, tile_x=16)
    assert pm._rk42_step_fn is None
    with pytest.raises(ValueError, match="2-step RK4"):
        pm.solve_step2_n(0.0, 1e-9, 2)


def test_lf2_step_unavailable_raises():
    """No silent fallback for the 2-step kernel either (p=9 -> 3d
    kernel path)."""
    base = _model(shape=(4, 2, 2), p=9)
    pm = PaddedLinearWave(base, tile_x=16)
    assert pm._lf2_step_fn is None
    with pytest.raises(ValueError, match="2-step leapfrog"):
        pm.solve_lf2_n(0.0, 1e-9, 2)


def test_lf_step_unavailable_raises():
    """No silent fallback: configs outside the fused leapfrog window
    (here p=9 -> 3d kernel) must raise, not quietly run 4x slower."""
    base = _model(shape=(4, 2, 2), p=9)
    pm = PaddedLinearWave(base, tile_x=16)
    assert pm._lf_step_fn is None
    with pytest.raises(ValueError, match="leapfrog step kernel"):
        pm.solve_lf_n(0.0, 1e-9, 2)
