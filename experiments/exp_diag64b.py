"""Probe the 64^3 fused-general remote-compile failure on chip.

exp_diag64 showed the hoisted module is 0.1 MB with the SAME kernel
config as 32^3 except grid size (nbatch 2048 vs 256), and the host has
128 GB free — so the tpu_compile_helper exit-1 is suspected to be
grid-size-dependent. This probes compiles at 64^3: plain (C=1) and
coarsen C=8 (grid 256 steps, same as 32^3); full tracebacks.

Run: python experiments/exp_diag64b.py [--variants plain,c8]
"""

from __future__ import annotations

import argparse
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=64)
    ap.add_argument("--variants", default="c8,plain")
    args = ap.parse_args()

    import numpy as np

    from wave_fenics_tpu.core.dofmap import build_dofmap
    from wave_fenics_tpu.core.mesh import box_mesh
    from wave_fenics_tpu.ops.operators import GeneralOperators
    from wave_fenics_tpu.ops.pallas_general import make_general_apply
    from wave_fenics_tpu.utils.closure import hoisted_jit

    import jax
    import jax.numpy as jnp

    print(f"# canary: {float(jnp.arange(4.0).sum())}", flush=True)

    s = args.size
    t0 = time.time()
    hm = box_mesh((s, s, s), (1.0, 1.0, 1.0)).to_hex_mesh()
    dofs = build_dofmap(hm, 4)
    ops = GeneralOperators(hm, dofs)
    tb = ops._fused_tables
    geo_m, _ = ops._fused_geo
    print(f"# setup {time.time()-t0:.0f}s nbatch={tb.nbatch}", flush=True)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(ops.ndofs), jnp.float32)

    for v in args.variants.split(","):
        C = {"plain": None, "c8": 8}[v]
        t1 = time.time()
        try:
            apply = make_general_apply(
                tb, geo_m, "mass", p=4, merge=ops._fused_merge,
                coarsen=C,
            )
            run = hoisted_jit(apply, x)
            y = np.asarray(run(x))
            dt = time.time() - t1
            print(f"# {v}: OK compile+run {dt:.0f}s "
                  f"|y|={np.linalg.norm(y):.6e}", flush=True)
        except Exception:
            print(f"# {v}: FAILED after {time.time()-t1:.0f}s",
                  flush=True)
            traceback.print_exc()
            tb_txt = traceback.format_exc()
            with open(f"experiments/logs/diag64b_{v}.err", "w") as f:
                f.write(tb_txt)


if __name__ == "__main__":
    main()
