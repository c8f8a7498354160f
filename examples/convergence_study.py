"""h- and p-convergence study of the planar wave solve.

Prints a table of relative L2 errors vs the analytic traveling wave —
the quantitative physics validation (SURVEY.md §4.6) as a runnable study.

Run on CPU: python examples/convergence_study.py
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


def err_for(nx, p):
    case = planar3d_case(
        ncells=(nx, 1, 1), domain_length=4.5e-3,
        width=4.5e-3 / nx, degree=p, dtype=jnp.float64,
    )
    m = case.model
    u, v, _ = m.solve(case.t0, case.tf, case.dt)
    dg = StructuredDofGrid(m.mesh, p)
    x = dg.axis_coords(0)
    ue = analytic_plane_wave(x, case.tf, case)
    return float(
        np.linalg.norm(np.asarray(u)[:, 0, 0] - ue) / np.linalg.norm(ue)
    )


print(f"{'p \\ nx':>7} " + " ".join(f"{nx:>10}" for nx in (8, 12, 16)))
for p in (2, 3, 4):
    row = [err_for(nx, p) for nx in (8, 12, 16)]
    print(f"{p:>7} " + " ".join(f"{e:10.2e}" for e in row))
