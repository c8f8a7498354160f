"""End-to-end validation: planar HIFU solve vs the analytic plane wave.

Runs a short 2-wavelength domain in float64 and prints the relative L2
error against u(x,t) = p0 sin(w0 (t - x/c0)) — the quantitative version of
the reference's offline physics validation (SURVEY.md §4.6).

Run on CPU (f64): python examples/plane_wave_validation.py
"""

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from wave_fenics_tpu.core.dofmap import StructuredDofGrid  # noqa: E402
from wave_fenics_tpu.models.planar3d import (  # noqa: E402
    analytic_plane_wave,
    planar3d_case,
)

case = planar3d_case(ncells=(32, 2, 2), domain_length=6.0e-3, dtype=jnp.float64)
m = case.model
print(f"dofs={m.ops.ndofs}  dt={case.dt:.3e}  steps={case.nsteps}")
u, v, nsteps = m.solve(case.t0, case.tf, case.dt)

dg = StructuredDofGrid(m.mesh, m.p)
x = dg.axis_coords(0)
u_line = np.asarray(u)[:, 0, 0]
u_exact = analytic_plane_wave(x, case.tf, case)
rel = np.linalg.norm(u_line - u_exact) / np.linalg.norm(u_exact)
print(f"relative L2 error vs analytic plane wave: {rel:.3e}")
assert rel < 1e-6
print("PASS")
