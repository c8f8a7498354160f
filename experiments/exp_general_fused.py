"""Hardware validation + timing of the fused unstructured-dofmap kernel.

One TPU client: builds the explicit-dofmap box (the suite's general-path
benchmark mesh), checks the fused windowed kernel against the XLA indexed
path and the f64 oracle, then times fused vs indexed.

Run: python experiments/exp_general_fused.py [--size 16] [--degree 4]
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

from wave_fenics_tpu.core.dofmap import build_dofmap
from wave_fenics_tpu.core.mesh import box_mesh
from wave_fenics_tpu.ops.operators import GeneralOperators
from wave_fenics_tpu.utils.timing import timeit


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=16)
    ap.add_argument("--degree", type=int, default=4)
    ap.add_argument("--reps", type=int, default=100)
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.wave_fenics_jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    p = args.degree
    hexm = box_mesh((args.size,) * 3, (1.0, 1.0, 1.0)).to_hex_mesh()
    dofs = build_dofmap(hexm, p)
    ops = GeneralOperators(hexm, dofs, dtype=jnp.float32)
    tb = ops._fused_tables
    print(json.dumps({
        "setup": "tables", "nbatch": tb.nbatch if tb else None,
        "H": tb.H if tb else None, "kg": tb.kg if tb else None,
        "ks": tb.ks if tb else None,
        "spill": int(len(tb.spill_cells)) if tb else None,
        "ndofs": ops.ndofs,
        "table_MB": round(tb.table_bytes / 2**20, 1) if tb else None,
    }), flush=True)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(ops.ndofs), dtype=jnp.float32)

    from wave_fenics_tpu.benchmarks.common import compile_with_retry

    # correctness on chip: fused vs f64 indexed oracle
    jf = jax.jit(lambda a: ops.stiffness_fused(a, 1500.0))
    compile_with_retry(jf, x)
    yf = np.asarray(jf(x), np.float64)
    ops64 = GeneralOperators(hexm, dofs, dtype=jnp.float64)
    y64 = np.asarray(ops64.stiffness_indexed(
        jnp.asarray(np.asarray(x), jnp.float64), 1500.0))
    scale = np.abs(y64).max()
    print(json.dumps({"check": "stiffness_fused vs f64 oracle",
                      "max_rel_err": float(np.abs(yf - y64).max() / scale)}),
          flush=True)
    ym = np.asarray(jax.jit(ops.spectral_mass_fused)(x), np.float64)
    m64 = np.asarray(ops64.spectral_mass_roundtrip(
        jnp.asarray(np.asarray(x), jnp.float64)))
    print(json.dumps({"check": "mass_fused vs f64 oracle",
                      "max_rel_err": float(
                          np.abs(ym - m64).max() / np.abs(m64).max())}),
          flush=True)

    reps = args.reps

    def bench(name, f):
        @jax.jit
        def run(a):
            return lax.fori_loop(0, reps, lambda i, b: f(b), a)

        t = timeit(run, x, reps=3, warmup=1) / reps
        print(json.dumps({
            "metric": name, "ndofs": ops.ndofs, "degree": p,
            "ms_per_apply": round(t * 1e3, 4),
            "gdofs_per_s": round(ops.ndofs / t / 1e9, 4),
        }), flush=True)

    bench("general stiffness FUSED", lambda a: ops.stiffness_fused(a, 1500.0))
    bench("general mass FUSED", ops.spectral_mass_fused)
    bench("general stiffness XLA indexed",
          lambda a: ops.stiffness_indexed(a, 1500.0))


if __name__ == "__main__":
    main()
