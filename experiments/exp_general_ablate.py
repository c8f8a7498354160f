"""Where do the fused general kernel's 15 us/batch go? (one TPU client)

Times TIMING-ONLY variants of the fused windowed kernel (results are
numerically wrong for truncated chains — that is fine, the dataflow and
op mix per chain are identical):

  - full kernel (kg=6, ks=6) mass + stiffness  [the production config]
  - chain sweep: kg=ks=k for k in 0,1,2,4      [slope = cost per chain]
  - gather-only (ks=0) / scatter-only (kg=0)   [split the two sides]
  - H=128 table build (if the builder finds windows) — halves both the
    window DMA and the per-chain gather op count

Everything shares one client/process; dynamic-reps fori loops; all
programs compiled before any timing.

Run: python experiments/exp_general_ablate.py [--size 16] [--degree 4]
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
from wave_fenics_tpu.ops.general_tables import build_batch_tables
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

    def bench(name, apply, extra=None):
        @jax.jit
        def run(a, n):
            return lax.fori_loop(0, n, lambda i, b: apply(b), a,
                                 unroll=False)

        compile_with_retry(run, x, jnp.int32(2))
        t = timeit(run, x, jnp.int32(reps), reps=3, warmup=1) / reps
        rec = {"metric": name, "ms_per_apply": round(t * 1e3, 4),
               "us_per_batch": round(t * 1e6 / tb.nbatch, 2)}
        rec.update(extra or {})
        print(json.dumps(rec), flush=True)

    print(json.dumps({
        "setup": "tables", "nbatch": tb.nbatch, "H": tb.H, "R": tb.R,
        "kg": tb.kg, "ks": tb.ks, "spill": int(len(tb.spill_cells)),
        "ndofs": ops.ndofs, "table_MB": round(tb.table_bytes / 2**20, 1),
    }), flush=True)

    mk = lambda t, geo, op, **kw: make_general_apply(
        t, geo, op, D1=ops._D if op == "stiffness" else None,
        coeff=1.0, p=p, dtype=jnp.float32, **kw)

    bench("full stiffness", mk(tb, geo_s, "stiffness"))
    bench("full mass", mk(tb, geo_m, "mass"))
    for k in (4, 2, 1, 0):
        bench(f"chains k={k} mass", mk(tb, geo_m, "mass", kg=k, ks=k),
              {"kg": k, "ks": k})
    bench("gather-only mass (ks=0)", mk(tb, geo_m, "mass", ks=0),
          {"ks": 0})
    bench("scatter-only mass (kg=0)", mk(tb, geo_m, "mass", kg=0),
          {"kg": 0})

    # H=128 build (independent tables; spill cells just excluded from
    # the timing — kernel-only comparison)
    tb128 = build_batch_tables(np.asarray(dofs.dofmap), ops.ndofs,
                               tile_h=128)
    print(json.dumps({
        "setup": "tables H=128", "nbatch": tb128.nbatch, "R": tb128.R,
        "kg": tb128.kg, "ks": tb128.ks,
        "spill": int(len(tb128.spill_cells)),
        "table_MB": round(tb128.table_bytes / 2**20, 1),
    }), flush=True)
    if tb128.nbatch:
        from wave_fenics_tpu.ops.general_tables import pack_cell_values

        nd = (p + 1) ** 3
        detJw = np.asarray(ops._detJw).reshape(hexm.ncells, nd)
        g128 = pack_cell_values(tb128, detJw[None], np.float32)
        sym = [(0, 0), (0, 1), (0, 2), (1, 1), (1, 2), (2, 2)]
        G = np.asarray(ops._G).reshape(hexm.ncells, nd, 3, 3)
        gs128 = pack_cell_values(
            tb128, np.stack([G[:, :, a, b] for a, b in sym]), np.float32)
        bench("H=128 mass", mk(tb128, g128, "mass"),
              {"nbatch": tb128.nbatch})
        bench("H=128 stiffness", mk(tb128, gs128, "stiffness"),
              {"nbatch": tb128.nbatch})


if __name__ == "__main__":
    main()
