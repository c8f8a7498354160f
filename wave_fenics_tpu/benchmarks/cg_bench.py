"""Matrix-free CG benchmark (the ``gpu_cg`` CEED BP1 demo).

Reference: E = 2^s hex cells, degree p mass system, CG with kmax=50,
rtol=1e-4; metric ``Dofs*iteration/second`` = ndofs_global/(t/iters)
(demo/gpu_cg/main.cpp:104-120, utils.hpp:58-64).

Single chip by default; --ndev N runs the sharded matvec over an N-device
mesh (virtual CPU devices or a real slice).

Run: python -m wave_fenics_tpu.benchmarks.cg_bench --s 18 --p 4
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..core.mesh import box_mesh
from ..models.linear_wave import LinearWave
from ..ops.operators import StructuredOperators
from ..solvers.cg import cg
from ..utils.timing import timeit
from .common import (apply_platform, cells_from_args, make_parser,
                     report, resolve_dtype)


def main():
    ap = make_parser(size=32, degree=2, reps=1)
    ap.add_argument("--kmax", type=int, default=50)
    ap.add_argument("--rtol", type=float, default=1e-4)
    ap.add_argument("--ndev", type=int, default=1)
    ap.add_argument("--precond", action="store_true",
                    help="Jacobi (lumped-mass) preconditioning")
    args = ap.parse_args()
    apply_platform(args)
    dtype = resolve_dtype(args.dtype)
    cells = cells_from_args(args)
    mesh = box_mesh(cells, (1.0, 1.0, 1.0))
    p = args.degree
    rng = np.random.default_rng(0)

    if args.ndev > 1:
        from ..parallel.partition import decompose3d
        from ..parallel.sharded_wave import ShardedLinearWave

        model = LinearWave(mesh, p=p, dtype=dtype)
        sw = ShardedLinearWave(model, decompose3d(args.ndev))
        b = sw.from_global(rng.standard_normal(model.ops.grid_shape))
        matvec, dot = sw.spectral_mass, sw.dot
        ndofs = model.ops.ndofs
    else:
        ops = StructuredOperators(mesh, p, dtype=dtype)
        b = jnp.asarray(rng.standard_normal(ops.grid_shape), dtype=dtype)
        matvec, dot = ops.spectral_mass, None
        ndofs = ops.ndofs

    precond = None
    if args.precond and args.ndev == 1:
        inv_diag = jnp.asarray(
            1.0 / ops.lumped_mass.reshape(ops.grid_shape), dtype=dtype
        )
        precond = lambda r: inv_diag * r

    @jax.jit
    def solve(b):
        return cg(matvec, b, kmax=args.kmax, rtol=args.rtol, dot=dot,
                  precond=precond)

    x, k, rnorm = solve(b)
    iters = int(k)
    t = timeit(solve, b, reps=3, warmup=1)
    report(
        metric="CG BP1 (diagonal mass)",
        s=args.s, degree=p, ndofs=ndofs, iters=iters, ndev=args.ndev,
        dtype=args.dtype,
        ms_total=round(t * 1e3, 3),
        dofs_iter_per_s=round(ndofs * iters / t, 1),
        gdofs_iter_per_s=round(ndofs * iters / t / 1e9, 4),
    )


if __name__ == "__main__":
    main()
