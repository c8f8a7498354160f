"""RK4 and CG solver tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wave_fenics_tpu.core.dofmap import StructuredDofGrid
from wave_fenics_tpu.core.mesh import box_mesh
from wave_fenics_tpu.ops.operators import StructuredOperators
from wave_fenics_tpu.solvers.cg import cg
from wave_fenics_tpu.solvers.rk4 import rk4_solve, rk4_step


def test_rk4_harmonic_oscillator_order():
    """u'' = -w^2 u as the (u, v) system; RK4 must show 4th-order convergence."""
    w = 2.0
    f0 = lambda t, u, v: v
    f1 = lambda t, u, v: -(w**2) * u
    u0 = jnp.asarray(1.0, dtype=jnp.float64)
    v0 = jnp.asarray(0.0, dtype=jnp.float64)
    tf = 2.0
    errs = []
    for n in (50, 100, 200):
        dt = tf / n
        u, v, ns = rk4_solve(f0, f1, u0, v0, 0.0, tf, dt)
        assert ns == n
        errs.append(abs(float(u) - np.cos(w * tf)))
    order1 = np.log2(errs[0] / errs[1])
    order2 = np.log2(errs[1] / errs[2])
    assert 3.7 < order1 < 4.3 and 3.7 < order2 < 4.3


def test_rk4_final_partial_step():
    f0 = lambda t, u, v: v
    f1 = lambda t, u, v: -u
    u0 = jnp.asarray(1.0, dtype=jnp.float64)
    v0 = jnp.asarray(0.0, dtype=jnp.float64)
    u, v, ns = rk4_solve(f0, f1, u0, v0, 0.0, 1.05, 0.1)
    assert ns == 11  # 10 full + 1 partial
    np.testing.assert_allclose(float(u), np.cos(1.05), atol=1e-6)


def test_rk4_step_time_dependent_forcing():
    # du/dt = v ; dv/dt = cos(t): v = sin(t), u = 1 - cos(t)
    f0 = lambda t, u, v: v
    f1 = lambda t, u, v: jnp.cos(t)
    u, v, _ = rk4_solve(
        f0, f1, jnp.asarray(0.0, dtype=jnp.float64),
        jnp.asarray(0.0, dtype=jnp.float64), 0.0, 3.0, 0.01
    )
    np.testing.assert_allclose(float(u), 1 - np.cos(3.0), atol=1e-8)
    np.testing.assert_allclose(float(v), np.sin(3.0), atol=1e-8)


def test_cg_dense_spd():
    rng = np.random.default_rng(0)
    A = rng.standard_normal((40, 40))
    A = A @ A.T + 40 * np.eye(40)
    b = rng.standard_normal(40)
    Aj = jnp.asarray(A)
    x, k, rnorm = cg(lambda v: Aj @ v, jnp.asarray(b), kmax=100, rtol=1e-10)
    np.testing.assert_allclose(np.asarray(x), np.linalg.solve(A, b), rtol=1e-7)
    assert int(k) < 100


@pytest.mark.parametrize("p", [2, 3])
def test_cg_mass_solve(p):
    """Matrix-free CG on the (diagonal) mass system — the gpu_cg BP1 workload
    shape (demo/gpu_cg/main.cpp:104-120). Diagonal SPD => converges fast."""
    mesh = box_mesh((3, 3, 3), (1.0, 1.0, 1.0))
    dg = StructuredDofGrid(mesh, p)
    ops = StructuredOperators(mesh, p, dtype=jnp.float64)
    rng = np.random.default_rng(1)
    b = jnp.asarray(rng.standard_normal(dg.grid_shape))
    solve = jax.jit(lambda b: cg(ops.spectral_mass, b, kmax=50, rtol=1e-10))
    x, k, rnorm = solve(b)
    # verify A x == b
    res = np.asarray(ops.spectral_mass(x) - b)
    assert np.linalg.norm(res) / np.linalg.norm(np.asarray(b)) < 1e-8


def test_cg_stiffness_shifted():
    """CG on (M + dt^2 K)-like SPD operator (implicit-step shape)."""
    mesh = box_mesh((2, 2, 2), (1.0, 1.0, 1.0))
    ops = StructuredOperators(mesh, 3, dtype=jnp.float64)

    def A(v):
        return ops.mass(v) - 1e-3 * ops.stiffness(v, 1.0)  # M + 1e-3*K_pos

    rng = np.random.default_rng(2)
    b = jnp.asarray(rng.standard_normal(ops.grid_shape))
    x, k, _ = cg(A, b, kmax=400, rtol=1e-10)
    res = np.asarray(A(x) - b)
    assert np.linalg.norm(res) / np.linalg.norm(np.asarray(b)) < 1e-7


def test_pcg_jacobi_accelerates_distorted_mass():
    """Jacobi-preconditioned CG on a distorted-mesh diagonal mass system
    converges in O(1) iterations (preconditioner is exact for a diagonal)."""
    from wave_fenics_tpu.core.dofmap import build_dofmap
    from wave_fenics_tpu.ops.operators import GeneralOperators

    m = box_mesh((2, 2, 2), (1.0, 1.0, 1.0)).to_hex_mesh()
    rng = np.random.default_rng(5)
    m = type(m)(points=m.points + 0.04 * rng.standard_normal(m.points.shape),
                cells=m.cells)
    dofs = build_dofmap(m, 3)
    ops = GeneralOperators(m, dofs, dtype=jnp.float64)
    inv_diag = 1.0 / ops.lumped_mass
    b = jnp.asarray(rng.standard_normal(ops.ndofs))
    x_plain, k_plain, _ = cg(ops.spectral_mass, b, kmax=500, rtol=1e-10)
    x_pcg, k_pcg, _ = cg(
        ops.spectral_mass, b, kmax=500, rtol=1e-10,
        precond=lambda r: inv_diag * r,
    )
    assert int(k_pcg) <= 3
    assert int(k_pcg) < int(k_plain)
    res = np.asarray(ops.spectral_mass(x_pcg) - b)
    assert np.linalg.norm(res) / np.linalg.norm(np.asarray(b)) < 1e-9


def test_newmark_matches_rk4_and_is_stable():
    """Implicit Newmark (trapezoidal) vs RK4 at CFL dt: agree to O(dt^2);
    Newmark stays bounded at 10x-CFL dt where RK4 blows up."""
    from wave_fenics_tpu.core.dofmap import StructuredDofGrid
    from wave_fenics_tpu.core.mesh import FacetTags
    from wave_fenics_tpu.models.linear_wave import LinearWave
    from wave_fenics_tpu.solvers.newmark import newmark_solve_n

    mesh = box_mesh((6, 2, 2), (1.0, 0.3, 0.3), facet_tags=FacetTags({}))
    model = LinearWave(mesh, p=3, c0=1.0, dtype=jnp.float64)
    dg = StructuredDofGrid(mesh, 3)
    C = dg.dof_coords_grid()
    u0 = jnp.asarray(np.sin(np.pi * C[..., 0]))
    v0 = jnp.zeros_like(u0)

    dt = 2e-3
    n = 100
    u_rk, v_rk, _ = model.solve(0.0, n * dt, dt, u0, v0)
    u_nm, v_nm, _ = newmark_solve_n(model, dt, n, u0, v0)
    rel = float(jnp.linalg.norm(u_nm - u_rk) / jnp.linalg.norm(u_rk))
    assert rel < 5e-3, rel  # O(dt^2) phase error vs O(dt^4)

    # stability beyond the explicit CFL limit
    big_dt = 0.2  # ~4x beyond the RK4 stability limit for this mesh
    u_big, v_big, _ = newmark_solve_n(model, big_dt, 200, u0, v0)
    assert np.isfinite(np.asarray(u_big)).all()
    assert float(jnp.abs(u_big).max()) < 10 * float(jnp.abs(u0).max())
    u_rk_big, _, _ = model.solve(0.0, 200 * big_dt, big_dt, u0, v0)
    assert not np.isfinite(np.asarray(u_rk_big)).all()  # RK4 explodes
