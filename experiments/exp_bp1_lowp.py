"""Why does fused BP1 mass collapse at low degree? (VERDICT r2 weak #3)

BENCH_SUITE round 2: bp1-mass 12.2 GDoF/s at p=4-5 but 0.16 at p=1 and
1.4 at p=2 (64^3 cells). One TPU client, batched sweep:

  1. per-p baseline at the production tile_x=16,
  2. tile_x sweep (fewer, fatter grid steps),
  3. stage ablation (no x-matmul / no rolls) to find the fixed cost.

Run: python experiments/exp_bp1_lowp.py [--size 64] [--degrees 1 2 4]
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

from wave_fenics_tpu.core.mesh import box_mesh
from wave_fenics_tpu.ops.pallas_mass import make_mass_apply
from wave_fenics_tpu.ops.pallas_wave import PaddedLayout
from wave_fenics_tpu.ops.separable import separable_mass_tables
from wave_fenics_tpu.utils.timing import timeit


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=64)
    ap.add_argument("--degrees", type=int, nargs="*", default=[1, 2, 4])
    ap.add_argument("--reps", type=int, default=200)
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    jax.config.update(
        "jax_compilation_cache_dir",
        "/root/.wave_fenics_jax_cache",
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    rng = np.random.default_rng(0)
    mesh = box_mesh((args.size,) * 3, (1.0, 1.0, 1.0))

    def bench(p, tile_x, ablate=()):
        grid = tuple(n * p + 1 for n in mesh.shape)
        try:
            layout = PaddedLayout(grid, p, tile_x=tile_x, z_align=16)
            apply = make_mass_apply(
                layout, separable_mass_tables(p, mesh.h, jnp.float32),
                jnp.float32, ablate=ablate,
            )
        except Exception as e:
            print(json.dumps({"p": p, "tile_x": tile_x,
                              "ablate": list(ablate),
                              "error": str(e)[:200]}), flush=True)
            return
        x = layout.pad(jnp.asarray(
            rng.standard_normal(grid), dtype=jnp.float32))
        reps = args.reps

        @jax.jit
        def run(a):
            return lax.fori_loop(0, reps, lambda i, b: apply(b), a)

        t = timeit(run, x, reps=3, warmup=1) / reps
        nd = int(np.prod(grid))
        ntiles = layout.padded_shape[0] // layout.tile_x
        F = layout.padded_shape[1] * layout.padded_shape[2]
        print(json.dumps({
            "p": p, "tile_x": tile_x, "ablate": list(ablate),
            "ndofs": nd, "ntiles": ntiles, "F": F,
            "ms_per_apply": round(t * 1e3, 4),
            "us_per_tile": round(t * 1e6 / ntiles, 2),
            "gdofs_per_s": round(nd / t / 1e9, 4),
        }), flush=True)

    for p in args.degrees:
        bench(p, 16)
    for p in args.degrees:
        for tx in (32, 64, 128):
            bench(p, tx)
    for p in args.degrees:
        bench(p, 16, ablate=("xmm",))
        bench(p, 16, ablate=("rolls",))
        bench(p, 16, ablate=("xmm", "rolls"))


if __name__ == "__main__":
    main()
