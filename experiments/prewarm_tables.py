"""Pre-warm the fused-general-kernel table disk cache (host-only work).

The general_tables cache version bump (v2 -> v3, rpc field) orphaned
every cached window/chain/merge build; pass-2 chain assignment is
host-side Python and takes minutes at production sizes. This script
rebuilds (and thereby disk-caches) the exact table sets the benchmark
suite / rerecord orchestrator will need, WITHOUT touching the TPU —
meant to run during tunnel outages so the later chip session spends its
lease on compiles and timing only.

Configs mirror wave_fenics_tpu.benchmarks.operators_bench exactly
(box_mesh(size^3, unit box) -> to_hex_mesh -> build_dofmap): the cache
key is the dofmap content + parameters, so any deviation misses.

Run: python experiments/prewarm_tables.py [--configs p,size ...]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def prewarm(p: int, size: int) -> None:
    from wave_fenics_tpu.core.dofmap import build_dofmap
    from wave_fenics_tpu.core.mesh import box_mesh
    from wave_fenics_tpu.ops.general_tables import (
        build_batch_tables, build_gather_overflow, build_scatter_merge,
    )

    t0 = time.time()
    hexm = box_mesh((size,) * 3, (1.0, 1.0, 1.0)).to_hex_mesh()
    dm = build_dofmap(hexm, p)
    # the operators.GeneralOperators._fused_tables search order
    best = None
    for H, E in ((128, 1), (256, 1), (256, 4)):
        tb = build_batch_tables(dm.dofmap, dm.ndofs, tile_h=H, extents=E,
                                max_spill_frac=0.5)
        if best is None or len(tb.spill_cells) < len(best.spill_cells):
            best = tb
        if len(tb.spill_cells) <= 0.02 * hexm.ncells:
            break
    mg = build_scatter_merge(best)
    ov = build_gather_overflow(best)
    print(
        f"p={p} size={size}: nbatch={best.nbatch} rpc={best.rpc} "
        f"kg={best.kg} ks={best.ks} spill={len(best.spill_cells)} "
        f"merge={'none' if mg is None else mg.nrounds} "
        f"overflow={'none' if ov is None else ov.slots} "
        f"[{time.time() - t0:.1f}s]",
        flush=True,
    )


def main():
    # host-only work: keep jax (preloaded by sitecustomize) off the TPU
    import jax

    jax.config.update("jax_platforms", "cpu")
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--configs", nargs="*", default=["4,16", "4,32", "5,16"],
        help="comma-separated p,size pairs",
    )
    args = ap.parse_args()
    for cfg in args.configs:
        p, size = (int(v) for v in cfg.split(","))
        prewarm(p, size)


if __name__ == "__main__":
    main()
