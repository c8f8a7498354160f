"""Round-5d: leapfrog step kernels at tile 48 (one-client A/B).

r5c showed the RK4 step kernel gains 7% from tile 32 -> 48 (x-overhang
amortization + slab-read-amplification drop) once the lean kernel's
smaller live set lets the compile fit. The lf (ops.pallas_lfstep) and
lf2 (ops.pallas_lf2step) kernels have smaller live sets than even the
lean RK4 kernel (1-2 stencil windows vs 4 stages), so tile 48 may
compile and win there too. Records feed the app/bench lf tile default.

Sections (all two-point, production case (64,32,32) p=4 f32, driven
source/ABC amplitudes like the production solve):
  - lf t32 / t48:   1-step leapfrog kernel ms/step
  - lf2 t32 / t48:  2-step temporal-blocked kernel ms/step (per step)
  - agree-t48: 60 driven steps lf t48 vs lf t32 (cross-tile physics)

Run:  python experiments/exp_round5d_lf48.py [--smoke]
Log:  experiments/logs/r5d_lf48.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LOG = "experiments/logs/r5d_lf48.json"
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
    from wave_fenics_tpu.models.linear_wave_padded import PaddedLinearWave
    from wave_fenics_tpu.models.planar3d import planar3d_case

    x = jnp.full((256, 256), 1.0 / 256.0)
    print(f"# warm ok backend={jax.default_backend()} "
          f"val={float((x @ x).sum()):.3f}", file=sys.stderr, flush=True)

    cells = (16, 4, 4) if args.smoke else (64, 32, 32)
    reps = 8 if args.smoke else 600
    case = planar3d_case(ncells=cells, domain_length=0.1, degree=4,
                         dtype=jnp.float32)
    m = case.model
    dt = float(case.dt) * 0.71
    nd = m.ops.ndofs

    pms = {}

    def pm_for(tx):
        if tx not in pms:
            pms[tx] = PaddedLinearWave(m, tile_x=tx)
        return pms[tx]

    def time_lf(name, tx, two_step):
        t0 = time.perf_counter()
        try:
            pm = pm_for(tx)
            fn = pm._lf2_step_fn if two_step else pm._lf_step_fn
            if fn is None:
                emit({"section": name, "tile_x": tx,
                      "error": "kernel unavailable at this tile"})
                return
            n_sub = 2 if two_step else 1
            b = pm.base
            dtf = float(dt)

            if two_step:
                def body(i, carry):
                    u, v, t = carry
                    g0 = b.g_amplitude(t)
                    g1 = b.g_amplitude(t + dtf)
                    g2 = b.g_amplitude(t + 2 * dtf)
                    u, v = fn(u, v, dtf, g0, g1, g2)
                    return (u, v, t + 2 * dtf)
            else:
                def body(i, carry):
                    u, v, t = carry
                    g0 = b.g_amplitude(t)
                    g1 = b.g_amplitude(t + dtf)
                    u, v = fn(u, v, dtf, g0, g1)
                    return (u, v, t + dtf)

            u0, v0 = pm.zero_state()
            init = (u0, v0, jnp.zeros((), dtype=u0.dtype))
            t = two_point_time(body, init, reps)
            ms = t * 1e3 / n_sub
            emit({"section": name, "tile_x": tx,
                  "ms_per_step": round(ms, 4),
                  "gdof_steps_per_s": round(nd / (ms * 1e-3) / 1e9, 4),
                  "timing": "two-point",
                  "build_s": round(time.perf_counter() - t0, 1)})
        except Exception as e:  # noqa: BLE001
            emit({"section": name, "tile_x": tx,
                  "error": f"{type(e).__name__}: {e}"[:400]})

    time_lf("lf", 32, two_step=False)
    time_lf("lf", 48, two_step=False)
    time_lf("lf2", 32, two_step=True)
    time_lf("lf2", 48, two_step=True)

    # cross-tile agreement, driven state (source/ABC active)
    try:
        t0 = time.perf_counter()
        pm32, pm48 = pm_for(32), pm_for(48)
        fa, fb = pm32._lf_step_fn, pm48._lf_step_fn
        if fa is None or fb is None:
            raise RuntimeError("lf kernel unavailable")
        ua, va, _ = pm32.solve_lf_n(0.0, dt, 60)
        ub, vb, _ = pm48.solve_lf_n(0.0, dt, 60)
        ga, gva = pm32.to_grid(ua), pm32.to_grid(va)
        gb, gvb = pm48.to_grid(ub), pm48.to_grid(vb)
        s = float(jnp.maximum(jnp.max(jnp.abs(gva)), 1e-30))
        du = float(jnp.max(jnp.abs(ga - gb))) / s
        dv = float(jnp.max(jnp.abs(gva - gvb))) / s
        emit({"section": "agree-t48", "steps": 60, "rel_du": du,
              "rel_dv": dv, "ok": bool(max(du, dv) < 5e-6),
              "build_s": round(time.perf_counter() - t0, 1)})
    except Exception as e:  # noqa: BLE001
        emit({"section": "agree-t48",
              "error": f"{type(e).__name__}: {e}"[:400]})
    print("# lf48 batch done", file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()
