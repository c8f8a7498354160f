"""Chip experiment: H=128 multi-extent windows vs the production H=256
config for the fused general kernel.

Hypothesis (host analysis, round 3c): at H = 128 the per-chain
row-select and lane-gather each touch ONE [128, 128] tile instead of two
masked halves (~0.5x chain compute per batch), while 4x32-row extents
still cover 32^3 Morton batches with 0 spill at B_avg ~79 (~1.62x more
batches) — net ~0.8x expected, all inside the measured chain-compute
floor. The kernel's H==128 fast path (mask-free gathers) ships either
way; this experiment decides whether the table search order should
prefer (128, 4).

ONE TPU client for all measurements (CLAUDE.md lease discipline).

Run: python experiments/exp_h128_windows.py [--size 32] [--reps 200]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=32)
    ap.add_argument("--degree", type=int, default=4)
    ap.add_argument("--reps", type=int, default=200)
    ap.add_argument("--platform", choices=["default", "cpu"],
                    default="default")
    args = ap.parse_args()

    from wave_fenics_tpu.benchmarks.common import apply_platform

    apply_platform(argparse.Namespace(platform=args.platform, ndev=1))

    import jax
    import jax.numpy as jnp
    from jax import lax

    from wave_fenics_tpu.benchmarks.common import compile_with_retry
    from wave_fenics_tpu.core.dofmap import build_dofmap
    from wave_fenics_tpu.core.mesh import box_mesh
    from wave_fenics_tpu.ops.general_tables import (
        build_batch_tables, build_gather_overflow, build_scatter_merge,
        pack_cell_values,
    )
    from wave_fenics_tpu.ops.pallas_general import make_general_apply
    from wave_fenics_tpu.utils.closure import hoisted_jit
    from wave_fenics_tpu.utils.timing import timeit

    # lease warmer
    print(f"# canary {float(jnp.arange(8.0).sum())}", flush=True)

    import numpy as np

    hm = box_mesh((args.size,) * 3, (1.0,) * 3).to_hex_mesh()
    dm = build_dofmap(hm, args.degree)
    nd = (args.degree + 1) ** 3
    from wave_fenics_tpu.core import geometry
    from wave_fenics_tpu.core.basis import tabulate_1d

    tab = tabulate_1d(args.degree)
    G, detJw = geometry.precompute_geometric_data(hm, args.degree)
    Gs = np.asarray(G, np.float64).reshape(hm.ncells, nd, 3, 3)
    sym = [(0, 0), (0, 1), (0, 2), (1, 1), (1, 2), (2, 2)]
    Gp = np.stack([Gs[:, :, a, b] for a, b in sym]).astype(np.float32)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(dm.ndofs), jnp.float32)
    y_ref = None

    for H, E in ((256, 4), (128, 4)):
        tb = build_batch_tables(dm.dofmap, dm.ndofs, tile_h=H, extents=E,
                                max_spill_frac=0.5)
        if len(tb.spill_cells):
            print(json.dumps({"H": H, "E": E,
                              "spill": len(tb.spill_cells),
                              "skipped": True}), flush=True)
            continue
        mg = build_scatter_merge(tb)
        geo = pack_cell_values(tb, Gp, np.float32)
        apply_fn = make_general_apply(
            tb, geo, "stiffness", D1=tab.D, coeff=-1500.0**2,
            p=args.degree, dtype=jnp.float32, merge=mg,
        )
        run = hoisted_jit(
            lambda v: lax.fori_loop(0, args.reps, lambda i, a: apply_fn(a), v),
            x,
        )
        compile_with_retry(run, x)
        t = timeit(run, x, reps=3, warmup=1) / args.reps
        y = apply_fn(x)
        ymax = float(jnp.max(jnp.abs(y)))
        rel = None
        if y_ref is None:
            y_ref = y
        else:
            rel = float(jnp.max(jnp.abs(y - y_ref)) /
                        jnp.max(jnp.abs(y_ref)))
        print(json.dumps({
            "H": H, "E": E, "nbatch": tb.nbatch, "kg": tb.kg,
            "ks": tb.ks, "ms_per_apply": round(t * 1e3, 4),
            "gdofs_per_s": round(dm.ndofs / t / 1e9, 4),
            "ymax": ymax, "rel_vs_first": rel,
        }), flush=True)


if __name__ == "__main__":
    main()
