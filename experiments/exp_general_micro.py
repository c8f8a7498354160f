"""Fused general kernel micro-variants on chip (one client):
concat-free per-half scatter (now default) x index-table width.

Run: python experiments/exp_general_micro.py
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
from wave_fenics_tpu.ops.pallas_general import make_general_apply
from wave_fenics_tpu.utils.timing import timeit


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=16)
    ap.add_argument("--degree", type=int, default=4)
    ap.add_argument("--reps", type=int, default=200)
    args = ap.parse_args()
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.wave_fenics_jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    p = args.degree
    hexm = box_mesh((args.size,) * 3, (1.0, 1.0, 1.0)).to_hex_mesh()
    dofs = build_dofmap(hexm, p)
    ops = GeneralOperators(hexm, dofs, dtype=jnp.float32)
    tb = ops._fused_tables
    geo_m, geo_s = ops._fused_geo
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(ops.ndofs), dtype=jnp.float32)
    reps = args.reps

    from wave_fenics_tpu.benchmarks.common import compile_with_retry

    # on-chip correctness pin for the reworked scatter
    ops64 = GeneralOperators(hexm, dofs, dtype=jnp.float64)

    def bench(name, apply, extra=None):
        @jax.jit
        def run(a, n):
            return lax.fori_loop(0, n, lambda i, b: apply(b), a,
                                 unroll=False)

        compile_with_retry(run, x, jnp.int32(2))
        t = timeit(run, x, jnp.int32(reps), reps=3, warmup=1) / reps
        rec = {"metric": name, "ms_per_apply": round(t * 1e3, 4),
               "us_per_batch": round(t * 1e6 / tb.nbatch, 2),
               "gdofs_per_s": round(ops.ndofs / t / 1e9, 4)}
        rec.update(extra or {})
        print(json.dumps(rec), flush=True)

    mk = lambda geo, op, **kw: make_general_apply(
        tb, geo, op, D1=ops._D if op == "stiffness" else None,
        coeff=1.0 if op == "mass" else -1500.0**2, p=p,
        dtype=jnp.float32, **kw)

    st = mk(geo_s, "stiffness")
    y = np.asarray(jax.jit(st)(x), np.float64)
    o = np.asarray(ops64.stiffness_indexed(
        jnp.asarray(np.asarray(x), jnp.float64), 1500.0))
    print(json.dumps({"check": "halfscatter stiffness vs oracle",
                      "max_rel_err": float(
                          np.abs(y - o).max() / np.abs(o).max())}),
          flush=True)
    bench("halfscatter stiffness", st)
    bench("halfscatter mass", mk(geo_m, "mass"))
    for idt, nm in ((jnp.int16, "i16"), (jnp.int32, "i32")):
        bench(f"halfscatter mass {nm}",
              mk(geo_m, "mass", idx_dtype=idt), {"idx": nm})
        bench(f"halfscatter stiffness {nm}",
              mk(geo_s, "stiffness", idx_dtype=idt), {"idx": nm})


if __name__ == "__main__":
    main()
