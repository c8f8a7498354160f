"""Probe: is the fused general kernel per-grid-step-bound?

Times stiffness at 24^3 with batch_cells 64 vs 128 (double vs normal
batch count, same total traffic). Time scaling ~2x => fixed per-step
cost dominates => grid coarsening (multiple sub-batches per step) is
the right lever.

Run: python experiments/exp_general_bsize.py
"""

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
from wave_fenics_tpu.ops.general_tables import (
    build_batch_tables, build_scatter_merge, pack_cell_values,
)
from wave_fenics_tpu.ops.operators import GeneralOperators
from wave_fenics_tpu.ops.pallas_general import make_general_apply
from wave_fenics_tpu.utils.closure import hoisted_jit
from wave_fenics_tpu.utils.timing import timeit


def main():
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.wave_fenics_jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from wave_fenics_tpu.benchmarks.common import compile_with_retry

    p = 4
    size = 24
    hexm = box_mesh((size,) * 3, (1.0, 1.0, 1.0)).to_hex_mesh()
    dofs = build_dofmap(hexm, p)
    ops = GeneralOperators(hexm, dofs, dtype=jnp.float32)
    dm = np.asarray(dofs.dofmap, np.int64)
    nd = (p + 1) ** 3
    sym = [(0, 0), (0, 1), (0, 2), (1, 1), (1, 2), (2, 2)]
    G = np.asarray(ops._G).reshape(hexm.ncells, nd, 3, 3)
    Gs = np.stack([G[:, :, a, b] for a, b in sym])
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(ops.ndofs), jnp.float32)
    reps = 100

    for bc in (128, 64, 32):
        t0 = time.time()
        tb = build_batch_tables(dm, ops.ndofs, tile_h=256, extents=4,
                                batch_cells=bc)
        mg = build_scatter_merge(tb)
        geo = pack_cell_values(tb, Gs, np.float32)
        f = make_general_apply(tb, geo, "stiffness", D1=ops._D,
                               coeff=-1500.0 ** 2, p=p,
                               dtype=jnp.float32, merge=mg)
        run = hoisted_jit(
            lambda a, n: lax.fori_loop(0, n, lambda i, b: f(b), a,
                                       unroll=False),
            x, jnp.int32(2),
        )
        compile_with_retry(run, x, jnp.int32(2))
        t = timeit(run, x, jnp.int32(reps), reps=3, warmup=1) / reps
        print(json.dumps({
            "batch_cells": bc, "nbatch": tb.nbatch,
            "spill": len(tb.spill_cells),
            "build_s": round(time.time() - t0, 1),
            "ms_per_apply": round(t * 1e3, 4),
            "us_per_batch": round(t * 1e6 / max(tb.nbatch, 1), 2),
        }), flush=True)


if __name__ == "__main__":
    main()
