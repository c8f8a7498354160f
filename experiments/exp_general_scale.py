"""Fused general operators at mesh sizes the contiguous window cannot
reach (one TPU client): 16^3 (E=1 regression), 24^3 and 32^3 p=4 via
4-extent windows.

Run: python experiments/exp_general_scale.py
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from wave_fenics_tpu.core.dofmap import build_dofmap
from wave_fenics_tpu.core.mesh import box_mesh
from wave_fenics_tpu.ops.operators import GeneralOperators
from wave_fenics_tpu.utils.timing import timeit


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", type=int, nargs="+", default=[16, 24, 32])
    ap.add_argument("--degree", type=int, default=4)
    ap.add_argument("--reps", type=int, default=100)
    args = ap.parse_args()
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.wave_fenics_jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from wave_fenics_tpu.benchmarks.common import compile_with_retry

    p = args.degree
    for size in args.sizes:
        t0 = time.time()
        hexm = box_mesh((size,) * 3, (1.0, 1.0, 1.0)).to_hex_mesh()
        dofs = build_dofmap(hexm, p)
        ops = GeneralOperators(hexm, dofs, dtype=jnp.float32)
        tb = ops._fused_tables
        if tb is None:
            print(json.dumps({"setup": f"size={size}", "fused": None}),
                  flush=True)
            continue
        mg = ops._fused_merge
        print(json.dumps({
            "setup": f"size={size}", "ndofs": ops.ndofs,
            "extents": tb.extents, "nbatch": tb.nbatch,
            "spill": int(len(tb.spill_cells)), "kg": tb.kg,
            "ks": tb.ks if mg is None else mg.ks,
            "nrounds": 0 if mg is None else mg.nrounds,
            "table_MB": round(tb.table_bytes / 2**20, 1),
            "build_s": round(time.time() - t0, 1),
        }), flush=True)

        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal(ops.ndofs), jnp.float32)

        # correctness: fused vs f32 indexed path (f64 oracle emulated on
        # TPU is too slow at these sizes; the small-mesh f64 oracle
        # tests pin the math — here we pin fused == indexed).
        # hoisted_jit: tables/G as runtime args, not HLO literals (the
        # tunnel 413s compile requests > ~100 MB)
        from wave_fenics_tpu.utils.closure import hoisted_jit

        jf = hoisted_jit(lambda a: ops.stiffness_fused(a, 1500.0), x)
        ji = hoisted_jit(lambda a: ops.stiffness_indexed(a, 1500.0), x)
        compile_with_retry(jf, x)
        compile_with_retry(ji, x)
        yf = np.asarray(jf(x), np.float64)
        yi = np.asarray(ji(x), np.float64)
        scale = np.abs(yi).max()
        print(json.dumps({
            "check": f"size={size} fused vs indexed (f32)",
            "max_rel_err": float(np.abs(yf - yi).max() / scale),
        }), flush=True)

        reps = args.reps

        def bench(name, f):
            run = hoisted_jit(
                lambda a, n: lax.fori_loop(0, n, lambda i, b: f(b), a,
                                           unroll=False),
                x, jnp.int32(2),
            )
            compile_with_retry(run, x, jnp.int32(2))
            t = timeit(run, x, jnp.int32(reps), reps=3, warmup=1) / reps
            print(json.dumps({
                "metric": name, "ndofs": ops.ndofs, "degree": p,
                "ms_per_apply": round(t * 1e3, 4),
                "gdofs_per_s": round(ops.ndofs / t / 1e9, 4),
            }), flush=True)

        bench(f"general stiffness fused {size}^3",
              lambda a: ops.stiffness_fused(a, 1500.0))
        bench(f"general mass fused {size}^3", ops.spectral_mass_fused)


if __name__ == "__main__":
    main()
