"""Diagnose the 64^3 fused-general remote-compile HTTP 500.

Host-side only: build the 64^3 operator, LOWER the fused apply (no
remote compile), and report the StableHLO module size + the table
builder's config. A multi-hundred-MB module means a constant slipped
past hoisted_jit; a small module means the compiler itself chokes.

Run: python experiments/exp_diag64.py [--size 64]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=64)
    ap.add_argument("--op", default="mass")
    args = ap.parse_args()

    import numpy as np

    from wave_fenics_tpu.core.dofmap import build_dofmap
    from wave_fenics_tpu.core.mesh import box_mesh
    from wave_fenics_tpu.ops.operators import GeneralOperators

    s = args.size
    t0 = time.time()
    hm = box_mesh((s, s, s), (1.0, 1.0, 1.0)).to_hex_mesh()
    dofs = build_dofmap(hm, 4)
    print(f"# mesh+dofmap: {time.time()-t0:.1f}s ndofs={dofs.ndofs}",
          flush=True)

    import jax.numpy as jnp

    ops = GeneralOperators(hm, dofs)
    tb = ops._fused_tables
    print(f"# tables: H={tb.H} R={tb.R} B={tb.B} E={tb.extents} "
          f"kg={tb.kg} ks={tb.ks} nbatch={tb.nbatch} "
          f"spill={len(tb.spill_cells)} rpc={tb.rpc} cpr={tb.cpr} "
          f"table_bytes={tb.table_bytes/1e6:.1f}MB "
          f"({time.time()-t0:.1f}s)", flush=True)

    # lower through the public path: the same program bench would run,
    # but .lower() only — no remote compile.
    import jax

    from wave_fenics_tpu.utils.closure import hoisted_jit

    x = jnp.zeros((ops.ndofs,), jnp.float32)
    target = (ops.spectral_mass_fused if args.op == "mass"
              else lambda v: ops.stiffness_fused(v, 1.0))
    run = hoisted_jit(target, x)  # the bench's wrapping (reps folded out)
    print(f"# hoisted consts: {run.n_hoisted}", flush=True)
    lowered = run.jitted.lower(run.consts, x)
    t1 = time.time()
    try:
        blob = lowered.compiler_ir("stablehlo")
        txt = blob.operation.get_asm(binary=True, enable_debug_info=False)
        size = len(txt)
    except Exception as e:
        # fall back to text form
        txt = lowered.as_text()
        size = len(txt)
        print(f"# (binary asm failed: {e})", flush=True)
    print(f"# lowered module (hoisted): {size/1e6:.1f} MB "
          f"(lower {t1-t0:.1f}s, serialize {time.time()-t1:.1f}s)",
          flush=True)


if __name__ == "__main__":
    main()
