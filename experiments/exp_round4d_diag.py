"""Round-4d diagnosis of the r4c app-E2E anomaly (ONE TPU client).

r4c measured planar3d_app E2E at 80 ms/step (RK4) / 15.4 ms/step
(leapfrog) while the identical kernels measure 1.44 / 0.81 ms/step via
the dynamic-trip bench path — 55x/19x, cold ~= warm (112.7 vs 119.7 s).
Two candidate explanations, distinguished here by AOT-splitting compile
from execution on the EXACT r4c program:

  (a) compile-bound: each app run recompiled the static-length scan
      (jit cache keyed on function identity misses across runs; the
      persistent cache should hit — HLO verified bit-identical across
      fresh model builds on CPU — unless executable serialization
      silently fails on the axon backend for this program);
  (b) execution pathology: the scan-with-static-trip executable itself
      runs 55x slower than the fori_loop executable.

Sections (appended to experiments/logs/r4d_diag.json as they finish):
  scan-static     AOT compile time + 2 timed executions of the old app
                  program (lax.scan, static n=1489, step kernel)
  scan-rebuild    same program from a FRESH PaddedLinearWave — second
                  AOT compile time probes the persistent-cache hit
  fori-dyn        AOT compile + two-point (n=189/1489) execution of the
                  dynamic-trip program (the bench.py path)
  app-rk4/app-lf  the FIXED app (dynamic-trip + AOT) run twice each —
                  solve_seconds now excludes compile by construction

Run:  python experiments/exp_round4d_diag.py [--only SECTION]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LOG = "experiments/logs/r4d_diag.json"
NSTEP = 1489  # the r4c RK4 app step count (64x32x32 p=4 default case)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default=None)
    args = ap.parse_args()

    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("WAVE_FENICS_JAX_CACHE",
                       os.path.expanduser("~/.wave_fenics_jax_cache")),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np

    from wave_fenics_tpu.utils.timing import sync

    # lease warmer: trivial non-Pallas dispatch inside THIS client
    x = jnp.full((256, 256), 1.0 / 256.0)
    print(f"# warm ok backend={jax.default_backend()} "
          f"val={float((x @ x).sum()):.3f}", file=sys.stderr, flush=True)

    results: list[dict] = []

    def emit(rec: dict) -> None:
        results.append(rec)
        print(json.dumps(rec), flush=True)
        os.makedirs(os.path.dirname(LOG), exist_ok=True)
        with open(LOG, "w") as f:
            json.dump(results, f, indent=1)

    def want(name: str) -> bool:
        return args.only is None or args.only == name

    from wave_fenics_tpu.models.linear_wave_padded import PaddedLinearWave
    from wave_fenics_tpu.utils.config import SimulationConfig

    def build_pm():
        case = SimulationConfig().build_case()
        return case, PaddedLinearWave(case.model, tile_x=32)

    case, pm = build_pm()
    dt = case.dt
    u0, v0 = pm.zero_state()

    def aot_scan(pm_):
        fn = jax.jit(
            lambda uu, vv, tt: pm_.solve_step_n(tt, dt, NSTEP, uu, vv)[:2]
        )
        t0 = time.perf_counter()
        lowered = fn.lower(u0, v0, jnp.asarray(0.0, dtype=pm_.base.dtype))
        t_lower = time.perf_counter() - t0
        t0 = time.perf_counter()
        compiled = lowered.compile()
        t_compile = time.perf_counter() - t0
        return compiled, t_lower, t_compile

    def timed_exec(compiled, *cargs):
        t0 = time.perf_counter()
        out = compiled(*cargs)
        sync(*jax.tree.leaves(out))
        return time.perf_counter() - t0

    scan_compiled = None
    if want("scan-static"):
        scan_compiled, t_lower, t_compile = aot_scan(pm)
        targ = jnp.asarray(0.0, dtype=pm.base.dtype)
        e1 = timed_exec(scan_compiled, u0, v0, targ)
        e2 = timed_exec(scan_compiled, u0, v0, targ)
        emit({
            "section": "scan-static", "nsteps": NSTEP,
            "lower_s": round(t_lower, 3), "compile_s": round(t_compile, 3),
            "exec1_s": round(e1, 3), "exec2_s": round(e2, 3),
            "ms_per_step_exec2": round(e2 / NSTEP * 1e3, 4),
        })

    if want("scan-rebuild"):
        _, pm2 = build_pm()
        _, t_lower2, t_compile2 = aot_scan(pm2)
        emit({
            "section": "scan-rebuild",
            "lower_s": round(t_lower2, 3),
            "compile_s": round(t_compile2, 3),
            "note": "fresh PaddedLinearWave, bit-identical HLO — compile_s"
                    " >> 1 s means the persistent cache does not hit",
        })

    if want("fori-dyn"):
        fn = jax.jit(lambda uu, vv, tt, n: pm.solve_step_dyn(tt, dt, n, uu, vv))
        targ = jnp.asarray(0.0, dtype=pm.base.dtype)
        t0 = time.perf_counter()
        compiled = fn.lower(u0, v0, targ, np.int32(1)).compile()
        t_compile = time.perf_counter() - t0
        e_warm = timed_exec(compiled, u0, v0, targ, np.int32(1))
        n_lo, n_hi = 189, NSTEP
        e_lo = timed_exec(compiled, u0, v0, targ, np.int32(n_lo))
        e_hi = timed_exec(compiled, u0, v0, targ, np.int32(n_hi))
        ms = (e_hi - e_lo) / (n_hi - n_lo) * 1e3
        emit({
            "section": "fori-dyn", "compile_s": round(t_compile, 3),
            "warm1_s": round(e_warm, 3),
            "exec_lo_s": round(e_lo, 3), "exec_hi_s": round(e_hi, 3),
            "n_lo": n_lo, "n_hi": n_hi,
            "ms_per_step_two_point": round(ms, 4),
        })

    for integ in ("rk4", "leapfrog"):
        name = f"app-{integ}"
        if not want(name):
            continue
        from wave_fenics_tpu.apps.planar3d_app import run as app_run

        cfg = SimulationConfig()
        cfg.time.integrator = integ
        t0 = time.perf_counter()
        cold = app_run(cfg)
        cold_wall = time.perf_counter() - t0
        warm = app_run(cfg)
        emit({
            "section": name,
            "metric": f"planar3d app E2E ({integ.upper()}, GDoF*steps/s)",
            "cells": [64, 32, 32], "degree": 4, "dtype": "f32",
            **{k: warm[k] for k in ("ndofs", "nsteps", "solve_seconds",
                                    "gdof_steps_per_s", "u_norm",
                                    "solver_path", "compile_seconds")},
            "cold_solve_seconds": round(cold["solve_seconds"], 3),
            "cold_compile_seconds": round(cold["compile_seconds"] or 0, 3),
            "cold_wall_seconds": round(cold_wall, 3),
            "warm_vs_cold_u_norm_rel":
                abs(warm["u_norm"] - cold["u_norm"]) / abs(cold["u_norm"]),
            "timing": "warm app run (AOT compile excluded, sync'd)",
        })

    # ---- rk42: first real-Mosaic run of the 2-step RK4 kernel --------
    # runs LAST (r4c discipline): a hanging miscompile must not block
    # the app diagnosis records above.
    if want("rk42-step"):
        assert pm._rk42_step_fn is not None
        fn2 = jax.jit(
            lambda uu, vv, tt, n: pm.solve_step2_dyn(tt, dt, n, uu, vv))
        targ = jnp.asarray(0.0, dtype=pm.base.dtype)
        t0 = time.perf_counter()
        compiled2 = fn2.lower(u0, v0, targ, np.int32(2)).compile()
        t_compile = time.perf_counter() - t0
        e_canary = timed_exec(compiled2, u0, v0, targ, np.int32(2))
        print(f"# rk42 canary ok ({e_canary:.3f}s)", file=sys.stderr,
              flush=True)

        # on-chip agreement vs the single-step RK4 kernel (f32, 50 steps)
        fn1 = jax.jit(
            lambda uu, vv, tt, n: pm.solve_step_dyn(tt, dt, n, uu, vv))
        compiled1 = fn1.lower(u0, v0, targ, np.int32(2)).compile()
        cmp_fn = jax.jit(lambda a, b: (
            jnp.max(jnp.abs(a[0] - b[0])) / jnp.max(jnp.abs(b[0])),
            jnp.max(jnp.abs(b[0]))))
        out1 = compiled1(u0, v0, targ, np.int32(50))
        out2 = compiled2(u0, v0, targ, np.int32(50))
        rel, umax = cmp_fn(out2, out1)
        emit({
            "section": "rk42-agreement",
            "metric": "rk42 vs rk4-step on-chip agreement "
                      "(50 steps, f32, rel max)",
            "value": float(rel), "u_max": float(umax),
            "compile_s": round(t_compile, 3),
        })
        assert float(rel) < 1e-4, f"rk42 disagrees with step: {float(rel)}"

        n_lo, n_hi = 200, 1200
        e_lo = timed_exec(compiled2, u0, v0, targ, np.int32(n_lo))
        e_hi = timed_exec(compiled2, u0, v0, targ, np.int32(n_hi))
        ms = (e_hi - e_lo) / (n_hi - n_lo) * 1e3
        nd = pm.base.ops.ndofs
        emit({
            "section": "rk42-step",
            "metric": f"planar3d RK4 GDoF*steps/s (p=4, {nd} dofs, "
                      "1 chip, step2)",
            "value": round(nd / ms / 1e6, 4), "unit": "GDoF*steps/s",
            "ms_per_step": round(ms, 4),
            "cells": [64, 32, 32], "degree": 4, "dtype": "f32",
            "tile_x": 32, "timing": "two-point",
            "t_hi_s": round(e_hi, 4), "t_lo_s": round(e_lo, 4),
        })

    print("# done", file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()
