"""Round-5e: app E2E at the tile-48 defaults + first-execution probe.

Context: the first r5e chip run of the fixed app (RK4, tile 48) recorded
solve_seconds 17.66 for 1489 steps (11.9 ms/step) while the SAME
pm.solve_step_dyn program measured 1.309 ms/step in bench.py minutes
earlier (3.2679 GDoF*steps/s two-point). r4d's protocol recorded the
app WARM (second in-process run), and its COLD solve was fast too
(2.151 s at t32) — so either (a) first-EXECUTION of an executable is
expensive this session (bench's canary absorbs it, the app's solve
timer does not), or (b) something t48- or session-specific.

Sections (ONE client):
  probe      AOT-compile solve_step_dyn@t48, then time: exec#1 (n=1),
             exec#2 (n=1), two-point n=1489/189 — if exec#1 >> exec#2
             the 17.66 s is first-execution cost landing in the timer
  app-rk4    app_run cold + warm (r4d protocol) — warm is the record
  app-lf     same for the leapfrog (lf2 composite) path

Run:  python experiments/exp_round5e_app.py [--smoke]
Log:  experiments/logs/r5e_app.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LOG = "experiments/logs/r5e_app.json"
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
    ap.add_argument("--only", default=None)
    args = ap.parse_args()
    if args.smoke:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import jax
    import jax.numpy as jnp
    import numpy as np

    from wave_fenics_tpu.utils.timing import sync

    x = jnp.full((256, 256), 1.0 / 256.0)
    print(f"# warm ok backend={jax.default_backend()} "
          f"val={float((x @ x).sum()):.3f}", file=sys.stderr, flush=True)

    def want(name: str) -> bool:
        return args.only is None or args.only == name

    from wave_fenics_tpu.apps.planar3d_app import run as app_run
    from wave_fenics_tpu.models.linear_wave_padded import PaddedLinearWave
    from wave_fenics_tpu.utils.config import SimulationConfig

    def mkcfg(integ: str) -> SimulationConfig:
        cfg = SimulationConfig()
        cfg.time.integrator = integ
        if args.smoke:
            cfg.domain.ncells = (16, 4, 4)
        return cfg

    NSTEP = 8 if args.smoke else 1489

    def timed_exec(compiled, *cargs):
        t0 = time.perf_counter()
        out = compiled(*cargs)
        sync(*jax.tree.leaves(out))
        return time.perf_counter() - t0

    if want("probe"):
        t0 = time.perf_counter()
        case = mkcfg("rk4").build_case()
        pm = PaddedLinearWave(case.model,
                              tile_x=16 if args.smoke else 48)
        dt = case.dt
        u0, v0 = pm.zero_state()
        fn = jax.jit(lambda uu, vv, tt, n: pm.solve_step_dyn(tt, dt, n,
                                                             uu, vv))
        targ = jnp.asarray(0.0, dtype=pm.base.dtype)
        tc = time.perf_counter()
        compiled = fn.lower(u0, v0, targ, np.int32(1)).compile()
        t_compile = time.perf_counter() - tc
        e1 = timed_exec(compiled, u0, v0, targ, np.int32(1))
        e2 = timed_exec(compiled, u0, v0, targ, np.int32(1))
        n_lo = max(NSTEP // 8, 1)
        e_lo = timed_exec(compiled, u0, v0, targ, np.int32(n_lo))
        e_hi = timed_exec(compiled, u0, v0, targ, np.int32(NSTEP))
        ms = (e_hi - e_lo) / (NSTEP - n_lo) * 1e3
        emit({
            "section": "probe", "tile_x": pm.layout.tile_x,
            "compile_s": round(t_compile, 3),
            "exec1_n1_s": round(e1, 3), "exec2_n1_s": round(e2, 3),
            "exec_lo_s": round(e_lo, 3), "exec_hi_s": round(e_hi, 3),
            "n_lo": n_lo, "n_hi": NSTEP,
            "ms_per_step_two_point": round(ms, 4),
            "build_s": round(time.perf_counter() - t0, 1),
        })

    for integ, name in (("rk4", "app-rk4"), ("leapfrog", "app-lf")):
        if not want(name):
            continue
        t0 = time.perf_counter()
        cold = app_run(mkcfg(integ))
        cold_wall = time.perf_counter() - t0
        warm = app_run(mkcfg(integ))
        emit({
            "section": name,
            "metric": f"planar3d app E2E ({integ.upper()}, GDoF*steps/s)",
            "cells": list(mkcfg(integ).domain.ncells), "degree": 4,
            "dtype": "f32",
            **{k: warm[k] for k in ("ndofs", "nsteps", "solve_seconds",
                                    "gdof_steps_per_s", "u_norm",
                                    "solver_path", "compile_seconds")},
            "cold_solve_seconds": round(cold["solve_seconds"], 3),
            "cold_compile_seconds": round(cold["compile_seconds"] or 0, 3),
            "cold_wall_seconds": round(cold_wall, 3),
            "warm_vs_cold_u_norm_rel":
                abs(warm["u_norm"] - cold["u_norm"])
                / max(abs(cold["u_norm"]), 1e-30),
            "timing": "warm app run (AOT compile excluded, sync'd)",
        })

    print("# r5e app batch done", file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()
