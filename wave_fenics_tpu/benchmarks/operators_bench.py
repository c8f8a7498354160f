"""Operator matvec benchmarks (gpu_operator / gpu_operator_monolithic /
gpu_spectral_mass demos).

- ``mass``: decomposed B^T D B pipeline at Gauss points on a general-dofmap
  box (demo/gpu_operator/main.cpp:139-172 shape)
- ``mass-fused``: structured collocated mass (fused MassOperator.apply,
  demo/gpu_operator_monolithic/main.cpp:98-126), with ``--check`` against
  the f64 per-cell oracle (1e-8-style elementwise check, :102-118)
- ``spectral``: diagonal mass gather->transform->scatter
  (demo/gpu_spectral_mass/main.cpp:73-80)
- ``stiffness``: separable sum-factorized stiffness (the RK hot kernel)

Run: python -m wave_fenics_tpu.benchmarks.operators_bench --op stiffness --size 32
Metric: DOF/s (size_local/t of the reference).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..core.dofmap import build_dofmap
from ..core.mesh import box_mesh
from ..ops.operators import GeneralOperators, StructuredOperators
from ..utils.timing import timeit
from .common import (apply_platform, cells_from_args, make_parser,
                     report, resolve_dtype)


def main():
    ap = make_parser(size=32, degree=4, reps=50)
    ap.add_argument(
        "--op",
        choices=["mass", "mass-fused", "spectral", "stiffness",
                 "stiffness-padded"],
        default="stiffness",
    )
    args = ap.parse_args()
    apply_platform(args)
    dtype = resolve_dtype(args.dtype)
    cells = cells_from_args(args)
    mesh = box_mesh(cells, (1.0, 1.0, 1.0))
    p = args.degree
    rng = np.random.default_rng(0)

    if args.op == "stiffness-padded":
        # production persistent-padded fused kernel (models hot path)
        from ..models.linear_wave import LinearWave
        from ..models.linear_wave_padded import PaddedLinearWave

        model = LinearWave(mesh, p=p, c0=1500.0, dtype=dtype)
        pm = PaddedLinearWave(model)
        x = pm.from_grid(
            jnp.asarray(rng.standard_normal(model.ops.grid_shape), dtype=dtype)
        )
        f = pm._apply
        ndofs = model.ops.ndofs
    elif args.op == "mass":
        hexm = mesh.to_hex_mesh()
        dofs = build_dofmap(hexm, p)
        ops = GeneralOperators(hexm, dofs, dtype=dtype, rule="gauss")
        x = jnp.asarray(rng.standard_normal(ops.ndofs), dtype=dtype)
        f = ops.mass
        ndofs = ops.ndofs
    else:
        ops = StructuredOperators(mesh, p, dtype=dtype)
        x = jnp.asarray(rng.standard_normal(ops.grid_shape), dtype=dtype)
        ndofs = ops.ndofs
        f = {
            "mass-fused": ops.mass,
            "spectral": ops.spectral_mass,
            "stiffness": lambda a: ops.stiffness(a, 1500.0),
        }[args.op]

    reps = args.reps

    @jax.jit
    def run(x):
        return lax.fori_loop(0, reps, lambda i, a: f(a), x)

    t = timeit(run, x, reps=3, warmup=1) / reps

    out = {"metric": f"{args.op} matvec", "degree": p, "ndofs": ndofs,
           "dtype": args.dtype, "ms_per_apply": round(t * 1e3, 4),
           "gdofs_per_s": round(ndofs / t / 1e9, 4)}

    if args.check and args.op in ("mass-fused", "spectral", "stiffness"):
        ops64 = StructuredOperators(mesh, p, dtype=jnp.float64)
        x64 = jnp.asarray(np.asarray(x), dtype=jnp.float64)
        g64 = {
            "mass-fused": ops64.mass,
            "spectral": ops64.spectral_mass,
            "stiffness": lambda a: ops64.stiffness_percell(a, 1500.0),
        }[args.op]
        y = np.asarray(f(x), dtype=np.float64)
        y64 = np.asarray(g64(x64))
        scale = np.abs(y64).max() or 1.0
        out["max_rel_err_vs_f64_oracle"] = float(
            np.abs(y - y64).max() / scale
        )
    report(**out)


if __name__ == "__main__":
    main()
