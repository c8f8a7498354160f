"""Coarsening sweep of the fused general kernel on chip.

Measures stiffness+mass ms/apply at C in {1, 2, 4, 8} sub-batches per
grid step (affine rank-1 geometry, box mesh).

Run: python experiments/exp_general_coarsen.py [--sizes 24 32]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from wave_fenics_tpu.core import geometry
from wave_fenics_tpu.core.dofmap import build_dofmap
from wave_fenics_tpu.core.mesh import box_mesh
from wave_fenics_tpu.ops.operators import GeneralOperators
from wave_fenics_tpu.ops.pallas_general import make_general_apply
from wave_fenics_tpu.utils.closure import hoisted_jit
from wave_fenics_tpu.utils.timing import timeit


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", type=int, nargs="+", default=[32])
    ap.add_argument("--coarsen", type=int, nargs="+", default=[1, 2, 4, 8])
    ap.add_argument("--resident", action="store_true")
    ap.add_argument("--reps", type=int, default=100)
    args = ap.parse_args()
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.wave_fenics_jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from wave_fenics_tpu.benchmarks.common import compile_with_retry

    p = 4
    for size in args.sizes:
        hexm = box_mesh((size,) * 3, (1.0, 1.0, 1.0)).to_hex_mesh()
        dofs = build_dofmap(hexm, p)
        ops = GeneralOperators(hexm, dofs, dtype=jnp.float32)
        tb = ops._fused_tables
        mg = ops._fused_merge
        af = ops._fused_affine
        wq = geometry.quadrature_weights_3d(ops._tab)
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal(ops.ndofs), jnp.float32)
        oracle = None
        for C in args.coarsen:
            for op_name, geo, kw in (
                ("stiffness", af["g6"],
                 dict(D1=ops._D, coeff=-1500.0 ** 2)),
                ("mass", af["m1"], dict()),
            ):
                f = make_general_apply(
                    tb, geo, op_name, p=p, dtype=jnp.float32, merge=mg,
                    affine_w=wq, coarsen=C, resident=args.resident,
                    **kw,
                )
                run = hoisted_jit(
                    lambda a, n, f=f: lax.fori_loop(
                        0, n, lambda i, b: f(b), a, unroll=False),
                    x, jnp.int32(2),
                )
                compile_with_retry(run, x, jnp.int32(2))
                if op_name == "stiffness":
                    y = np.asarray(run(x, jnp.int32(1)), np.float64)
                    if oracle is None:
                        oracle = y
                    err = float(np.abs(y - oracle).max()
                                / np.abs(oracle).max())
                else:
                    err = None
                t = timeit(run, x, jnp.int32(args.reps), reps=3,
                           warmup=1) / args.reps
                print(json.dumps({
                    "metric": f"general {op_name} {size}^3", "C": C,
                    "resident": args.resident, "nbatch": tb.nbatch,
                    "ms_per_apply": round(t * 1e3, 4),
                    "gdofs_per_s": round(ops.ndofs / t / 1e9, 4),
                    "rel_vs_C1": err,
                }), flush=True)


if __name__ == "__main__":
    main()
