"""Single-client re-measurement of the operator-matvec suite entries with
200-apply on-device loops (the suite's subprocess-per-entry runs at
reps=20 carried ~1.5 ms of tunnel dispatch RTT in every ms_per_apply).

Emits suite-schema JSON lines; merge into BENCH_SUITE.json afterwards.

Run: python experiments/exp_operator_repass.py
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
    from wave_fenics_tpu.core.mesh import box_mesh
    from wave_fenics_tpu.ops.operators import StructuredOperators
    from wave_fenics_tpu.utils.timing import timeit

    reps = 200
    rng = np.random.default_rng(0)

    def time_apply(f, x, ndofs, metric, degree):
        @jax.jit
        def run(x):
            return lax.fori_loop(0, reps, lambda i, a: f(a), x)

        t = timeit(run, x, reps=3, warmup=1) / reps
        print(json.dumps({
            "metric": metric, "degree": degree, "ndofs": ndofs,
            "dtype": "f32", "reps": reps,
            "ms_per_apply": round(t * 1e3, 4),
            "gdofs_per_s": round(ndofs / t / 1e9, 4),
        }), flush=True)

    # stiffness sweep: constant-dof sizes + the large grids for p=5/6
    for p, s in [(2, 64), (3, 42), (4, 32), (5, 26), (6, 21),
                 (5, 32), (6, 32)]:
        mesh = box_mesh((s, s, s), (1.0, 1.0, 1.0))
        ops = StructuredOperators(mesh, p, dtype=jnp.float32)
        x = jnp.asarray(rng.standard_normal(ops.grid_shape), dtype=jnp.float32)
        time_apply(lambda a, o=ops: o.stiffness(a, 1500.0), x, ops.ndofs,
                   "stiffness matvec", p)

    # spectral (diagonal + reference-shaped roundtrip) and fused mass, p=4
    mesh = box_mesh((32, 32, 32), (1.0, 1.0, 1.0))
    ops = StructuredOperators(mesh, 4, dtype=jnp.float32)
    x = jnp.asarray(rng.standard_normal(ops.grid_shape), dtype=jnp.float32)
    time_apply(ops.spectral_mass, x, ops.ndofs, "spectral matvec", 4)
    time_apply(ops.spectral_mass_roundtrip, x, ops.ndofs,
               "spectral-roundtrip matvec", 4)
    time_apply(ops.mass_gauss, x, ops.ndofs, "mass-fused matvec", 4)

    # BP1 consistent-mass matvec at the CG campaign sizes, p=4 and 5
    from wave_fenics_tpu.benchmarks.cg_bench import _bp1_setup

    for p in (4, 5):
        mesh = box_mesh((64, 64, 64), (1.0, 1.0, 1.0))
        grid = tuple(n * p + 1 for n in mesh.shape)
        layout, matvec, _ = _bp1_setup(mesh, p, jnp.float32, False)
        xg = layout.pad(jnp.asarray(
            rng.standard_normal(grid), dtype=jnp.float32))
        ndofs = int(np.prod(grid))
        time_apply(matvec, xg, ndofs, "bp1-mass matvec", p)


if __name__ == "__main__":
    main()
