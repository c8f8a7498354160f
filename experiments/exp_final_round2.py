"""Last round-2 chip pass (one client): tile_x=32 + yz_chunk=9 step
kernel at steady-state windows, and an RTT-free explicit-dofmap
(unstructured-path) operator measurement at a non-trivial grid.

Run: python experiments/exp_final_round2.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def main():
    from wave_fenics_tpu.core.dofmap import build_dofmap
    from wave_fenics_tpu.core.mesh import box_mesh
    from wave_fenics_tpu.models.linear_wave_padded import PaddedLinearWave
    from wave_fenics_tpu.models.planar3d import planar3d_case
    from wave_fenics_tpu.ops.operators import GeneralOperators
    from wave_fenics_tpu.utils.timing import timeit

    nsteps = 600
    case = planar3d_case(
        ncells=(64, 32, 32), domain_length=0.1, degree=4, dtype=jnp.float32
    )
    m, dt = case.model, case.dt
    for tx in (32, 16):
        pm = PaddedLinearWave(m, tile_x=tx)
        if pm._step_fn is None:
            continue
        u0, v0 = pm.zero_state()

        @jax.jit
        def run(u, v, pm=pm):
            u, v, _ = pm.solve_step_n(0.0, dt, nsteps, u, v)
            return u, v

        try:
            t = timeit(run, u0, v0, reps=3, warmup=1)
        except Exception as e:  # VMEM exhaustion etc.
            print(json.dumps({"tile_x": tx, "error": str(e)[:200]}),
                  flush=True)
            continue
        print(json.dumps({
            "metric": "step solver", "tile_x": tx, "steps": nsteps,
            "ms_per_step": round(t / nsteps * 1e3, 4),
            "gdof_steps": round(m.ops.ndofs * nsteps / t / 1e9, 4),
        }), flush=True)

    # explicit-dofmap path, 24^3 cells (p=4 -> 912673 dofs), 200 applies
    rng = np.random.default_rng(0)
    mesh = box_mesh((24, 24, 24), (1.0, 1.0, 1.0)).to_hex_mesh()
    dofs = build_dofmap(mesh, 4)
    ops = GeneralOperators(mesh, dofs, dtype=jnp.float32, rule="gll")
    x = jnp.asarray(rng.standard_normal(ops.ndofs), dtype=jnp.float32)
    for name, f in (("stiffness-general", lambda a: ops.stiffness(a, 1500.0)),
                    ("mass-general-gll", ops.mass)):
        @jax.jit
        def run(x, f=f):
            return lax.fori_loop(0, 200, lambda i, a: f(a), x)

        t = timeit(run, x, reps=3, warmup=1) / 200
        print(json.dumps({
            "metric": f"{name} matvec", "degree": 4, "ndofs": ops.ndofs,
            "reps": 200, "ms_per_apply": round(t * 1e3, 4),
            "gdofs_per_s": round(ops.ndofs / t / 1e9, 4),
        }), flush=True)


if __name__ == "__main__":
    main()
