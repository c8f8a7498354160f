"""Round-5c: compute-lean RK4 step kernel A/B on the real chip.

The r5b bisection decomposes the step kernel's unhidden compute; the
lean kernel (ops.pallas_rk4step._kernel_rk4_step_lean) attacks the
non-stencil part: collapsed RK4 stage algebra for the linear system
(u1 = u0 + dt v0 + dt^2/6 (kv0+kv1+kv2); no running b_j accumulators,
no vn formations), face-plane source/ABC terms under pl.when (paid
only on the 2-3 tiles whose slab window contains a face row), and the
two shift-0 y/z taps merged. Exact same scheme — f64 agreement is
pinned at 1e-13 in tests; this batch pins it ON CHIP (real Mosaic) and
A/Bs the rate at the production config.

Sections:
  - agree:      5 steps ref vs lean from the driven state, max rel diff
  - ab:         two-point ms/step — ref t32 / lean t32 / lean t48 /
                lean t64 (each guarded; a VMEM OOM is recorded, not fatal)
  - lean-chunk: yz_chunk 4 / 18 at tile 32 (the lean kernel changes the
                accumulator-churn balance, so re-sweep the chunk)

Run:  python experiments/exp_round5c_lean.py [--smoke]
Log:  experiments/logs/r5c_lean.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LOG = "experiments/logs/r5c_lean.json"
RESULTS: list[dict] = []


def emit(rec: dict) -> None:
    RESULTS.append(rec)
    print(json.dumps(rec), flush=True)
    os.makedirs(os.path.dirname(LOG), exist_ok=True)
    with open(LOG, "w") as f:
        json.dump(RESULTS, f, indent=1)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--smoke", action="store_true")
    args = ap.parse_args()
    if args.smoke:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import jax
    import jax.numpy as jnp

    from wave_fenics_tpu.benchmarks.common import two_point_time
    from wave_fenics_tpu.models.linear_wave_padded import (PaddedLinearWave,
                                                           _x_face_planes)
    from wave_fenics_tpu.models.planar3d import planar3d_case
    from wave_fenics_tpu.ops.pallas_rk4step import (build_step_tables,
                                                    make_rk4_step_raw)
    from wave_fenics_tpu.ops.separable import (grid_lines,
                                               separable_stiffness_tables)

    x = jnp.full((256, 256), 1.0 / 256.0)
    print(f"# warm ok backend={jax.default_backend()} "
          f"val={float((x @ x).sum()):.3f}", file=sys.stderr, flush=True)

    cells = (16, 4, 4) if args.smoke else (64, 32, 32)
    reps = 8 if args.smoke else 600
    case = planar3d_case(ncells=cells, domain_length=0.1, degree=4,
                         dtype=jnp.float32)
    m, dt = case.model, float(case.dt)
    nd = m.ops.ndofs
    gs = (1.0, 0.7, 0.4, 0.1)

    def setup(tx):
        pm = PaddedLinearWave(m, tile_x=tx)
        lay, b = pm.layout, pm.base
        w1, w2, sx, ax = _x_face_planes(pm)
        A, _ = separable_stiffness_tables(b.p, b.mesh.h, b.dtype)
        lines = grid_lines(b.mesh.shape, b.p, b.dtype)
        tab = tuple(jnp.asarray(t) for t in build_step_tables(
            lay, A, lines, -float(b.c0) ** 2, pm._m_lines,
            w1, w2, sx, ax, dtype=b.dtype,
        ))
        return pm, lay, b, tab

    pm32, lay32, b, tab32 = setup(32)

    # --- agreement on the real backend (both kernels, 5 driven steps) ---
    try:
        t0 = time.perf_counter()
        s_ref = make_rk4_step_raw(lay32, b.c0, dtype=b.dtype)
        s_lean = make_rk4_step_raw(lay32, b.c0, dtype=b.dtype, lean=True)

        @jax.jit
        def agree():
            ur, vr = pm32.zero_state()
            ul, vl = pm32.zero_state()
            for _ in range(5):
                ur, vr = s_ref(ur, vr, dt, *gs, *tab32)
                ul, vl = s_lean(ul, vl, dt, *gs, *tab32)
            scale = jnp.maximum(jnp.max(jnp.abs(vr)), 1e-30)
            return (jnp.max(jnp.abs(ur - ul)) / scale,
                    jnp.max(jnp.abs(vr - vl)) / scale,
                    scale)

        du, dv, sc = (float(v) for v in agree())
        emit({"section": "lean-agree", "steps": 5,
              "rel_du": du, "rel_dv": dv, "v_scale": sc,
              "ok": bool(max(du, dv) < 5e-6),
              "build_s": round(time.perf_counter() - t0, 1)})
    except Exception as e:  # noqa: BLE001
        emit({"section": "lean-agree",
              "error": f"{type(e).__name__}: {e}"[:400]})

    # --- rate A/B ---
    def time_step(name, tx, lean, yz_chunk=9):
        t0 = time.perf_counter()
        try:
            if tx == 32:
                pm, lay, tab = pm32, lay32, tab32
            else:
                pm, lay, _, tab = setup(tx)
            step = make_rk4_step_raw(lay, b.c0, dtype=b.dtype, lean=lean,
                                     yz_chunk=yz_chunk)

            def body(i, carry):
                u, v = carry
                return step(u, v, dt, *gs, *tab)

            t = two_point_time(body, pm.zero_state(), reps)
            emit({"section": "lean-ab", "variant": name, "tile_x": tx,
                  "lean": lean, "yz_chunk": yz_chunk,
                  "ms_per_step": round(t * 1e3, 4),
                  "gdof_steps_per_s": round(nd / t / 1e9, 4),
                  "timing": "two-point",
                  "build_s": round(time.perf_counter() - t0, 1)})
        except Exception as e:  # noqa: BLE001
            emit({"section": "lean-ab", "variant": name, "tile_x": tx,
                  "lean": lean,
                  "error": f"{type(e).__name__}: {e}"[:400]})

    time_step("ref-t32", 32, lean=False)
    time_step("lean-t32", 32, lean=True)
    time_step("lean-t48", 48, lean=True)
    time_step("lean-t64", 64, lean=True)
    time_step("lean-t32-c4", 32, lean=True, yz_chunk=4)
    time_step("lean-t32-c18", 32, lean=True, yz_chunk=18)
    print("# lean batch done", file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()
