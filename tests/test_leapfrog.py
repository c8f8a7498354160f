"""Leapfrog integrator tests: 2nd-order convergence, damping exactness,
energy stability, and agreement with RK4 on the wave models.

The leapfrog path (solvers/leapfrog.py) is the production option for
imported-mesh solves (1 stiffness apply/step vs RK4's 4); RK4 remains
the reference-parity default (common/LinearGLL.hpp:198-287)."""

import jax.numpy as jnp
import numpy as np
import pytest

from wave_fenics_tpu.solvers.leapfrog import leapfrog_solve_n
from wave_fenics_tpu.solvers.rk4 import rk4_solve_n


def _damped_oscillator_error(dt, w=3.0, d=0.4, T=4.0):
    """Max error vs the analytic underdamped oscillator
    u'' = -w^2 u - d u', u(0)=1, u'(0)=0."""
    force = lambda t, u: -(w**2) * u
    damp = jnp.asarray([d])
    u0 = jnp.asarray([1.0])
    v0 = jnp.asarray([0.0])
    n = int(round(T / dt))
    u, v = leapfrog_solve_n(force, damp, u0, v0, 0.0, T / n, n)
    wd = np.sqrt(w**2 - d**2 / 4)
    t = T
    ue = np.exp(-d * t / 2) * (
        np.cos(wd * t) + d / (2 * wd) * np.sin(wd * t)
    )
    return abs(float(u[0]) - ue)


def test_leapfrog_order2_damped_oscillator():
    e1 = _damped_oscillator_error(0.02)
    e2 = _damped_oscillator_error(0.01)
    assert e1 < 5e-3
    ratio = e1 / e2
    assert 3.3 < ratio < 4.7, (e1, e2, ratio)  # 2nd order: ~4


def test_leapfrog_undamped_energy_bounded():
    """Symplectic: the oscillator energy oscillates but does not drift
    over many periods (RK4 by contrast dissipates monotonically)."""
    w = 2.0
    force = lambda t, u: -(w**2) * u
    u0 = jnp.asarray([1.0])
    v0 = jnp.asarray([0.0])
    dt = 0.02
    u, v = leapfrog_solve_n(force, None, u0, v0, 0.0, dt, 50_000)
    E = float(v[0] ** 2 + w**2 * u[0] ** 2)
    E0 = w**2
    assert abs(E - E0) / E0 < 1e-3, E / E0


def test_leapfrog_energy_stable_closed_box():
    """Closed-box standing wave through the structured model: energy
    stays within O(dt^2) of E0 with no drift over 400 steps."""
    from wave_fenics_tpu.core.dofmap import StructuredDofGrid
    from wave_fenics_tpu.core.mesh import FacetTags, box_mesh
    from wave_fenics_tpu.models.diagnostics import energy
    from wave_fenics_tpu.models.linear_wave import LinearWave

    mesh = box_mesh((4, 4, 4), (1.0, 1.0, 1.0), facet_tags=FacetTags({}))
    model = LinearWave(mesh, p=3, c0=1.0, dtype=jnp.float64)
    dg = StructuredDofGrid(mesh, 3)
    C = dg.dof_coords_grid()
    u0 = jnp.asarray(
        np.sin(np.pi * C[..., 0]) * np.sin(np.pi * C[..., 1])
        * np.sin(np.pi * C[..., 2])
    )
    v0 = jnp.zeros_like(u0)
    E0 = float(energy(model, u0, v0))
    dt = 2e-3
    damp = jnp.asarray(model.damping)  # all-zero here (no ABC facets)
    assert float(jnp.abs(damp).max()) == 0.0
    u, v = leapfrog_solve_n(model.force, damp, u0, v0, 0.0, dt, 400)
    E = float(energy(model, u, v))
    assert abs(E - E0) / E0 < 2e-4, (E, E0)


@pytest.mark.slow
def test_leapfrog_matches_rk4_on_general_mesh():
    """Full physics (source + ABC) on a perturbed unstructured box:
    leapfrog converges to the RK4 solution at O(dt^2)."""
    from wave_fenics_tpu.benchmarks.general_solve import (min_edge,
                                                          perturbed_box)
    from wave_fenics_tpu.models.general_wave import GeneralLinearWave

    hm, tags = perturbed_box((6, 3, 3), h=0.002, amp_rel=0.05, seed=1)
    md = GeneralLinearWave(mesh=hm, p=3, facet_tags=tags,
                           dtype=jnp.float64)
    p = 3
    dt_cfl = 0.5 * min_edge(hm) / (md.c0 * p * p)
    T = 256 * dt_cfl

    def run(integrator, dt):
        n = int(round(T / dt))
        u, v = md.solve_n(0.0, T / n, n, integrator=integrator)
        return np.asarray(u)

    u_ref = run("rk4", dt_cfl / 4)  # near-exact in time
    scale = np.abs(u_ref).max()
    e1 = np.abs(run("leapfrog", dt_cfl / 2) - u_ref).max() / scale
    e2 = np.abs(run("leapfrog", dt_cfl / 4) - u_ref).max() / scale
    assert e2 < 0.02, e2
    ratio = e1 / e2
    assert 2.8 < ratio < 5.5, (e1, e2, ratio)  # 2nd order: ~4
