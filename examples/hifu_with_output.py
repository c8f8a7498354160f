"""End-to-end HIFU demo producing visualization + probe outputs.

Runs a short planar solve, writes a ParaView time series and a probe CSV —
the full production workflow (solve -> observables -> files).

Run: python examples/hifu_with_output.py [outdir]
"""

import sys

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402

from wave_fenics_tpu.core.dofmap import StructuredDofGrid  # noqa: E402
from wave_fenics_tpu.core.io import write_xdmf_time_series  # noqa: E402
from wave_fenics_tpu.models.linear_wave import solve_recording  # noqa: E402
from wave_fenics_tpu.models.planar3d import planar3d_case  # noqa: E402

outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/hifu_demo"
import os  # noqa: E402

os.makedirs(outdir, exist_ok=True)

case = planar3d_case(ncells=(16, 2, 2), domain_length=6.0e-3,
                     dtype=jax.numpy.float64)
m = case.model
dg = StructuredDofGrid(m.mesh, m.p)
coords = tuple(dg.axis_coords(d) for d in range(3))

# probe time series at 3 stations
points = np.array([[1.5e-3, 0, 0], [3.0e-3, 0, 0], [4.5e-3, 0, 0]])
nsteps = case.nsteps
u, v, series = solve_recording(m, case.t0, case.dt, nsteps, points)
ts = case.t0 + case.dt * np.arange(1, nsteps + 1)
np.savetxt(
    os.path.join(outdir, "probes.csv"),
    np.column_stack([ts, np.asarray(series)]),
    delimiter=",", header="t,p1,p2,p3", comments="",
)

# coarse time series of full fields (4 snapshots via chunked solve)
snaps = []
uu, vv = m.zero_state()
t = case.t0
chunk = nsteps // 4
from wave_fenics_tpu.solvers.rk4 import rk4_solve_n  # noqa: E402

for s in range(4):
    uu, vv = rk4_solve_n(m.f0, m.f1, uu, vv, t, case.dt, chunk)
    t += chunk * case.dt
    snaps.append((t, {"u": np.asarray(uu), "v": np.asarray(vv)}))
write_xdmf_time_series(os.path.join(outdir, "fields.xdmf"), coords, snaps)
print(f"wrote {outdir}/probes.csv and {outdir}/fields.xdmf "
      f"({nsteps} steps, {m.ops.ndofs} dofs)")
