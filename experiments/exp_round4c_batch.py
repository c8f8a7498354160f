"""Round-4c TPU batch (ONE client, CLAUDE.md discipline):

1. planar3d_app E2E on the production grid (the default 64x32x32 p=4
   HIFU case — the reference's headline driver and metric,
   demo/cpu_planar3d/main.cpp:85-93) with the round-4 padded production
   path: cold run (compile included, logged) then warm run (persistent
   compile cache hit) whose solve time is the record. Both integrators:
   RK4 (reference parity) and leapfrog (production option).
2. general-mesh leapfrog + RK4 solve records at 64^3 (17.0M dofs) —
   production-scale imported-mesh rates (the 32^3 records' scale story).
3. structured leapfrog step-kernel records, two-point RTT-free: the
   single-step kernel (lf, chip-validated at 4.90 in round 4c) and the
   temporal-blocked 2-step kernel (lf2, ops/pallas_lf2step.py) — lf2
   runs LAST because it has never executed on real Mosaic and a hanging
   mis-compile must not block the other records.

Appends clean entries to BENCH_SUITE.json; full log to
experiments/logs/r4c_batch.json.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_inproc(mod: str, *args: str) -> dict:
    import contextlib
    import importlib
    import io

    m = importlib.import_module(f"wave_fenics_tpu.benchmarks.{mod}")
    old = sys.argv
    sys.argv = [mod] + list(args)
    buf = io.StringIO()
    try:
        with contextlib.redirect_stdout(buf):
            m.main()
        res = json.loads(buf.getvalue().strip().splitlines()[-1])
    except Exception as e:
        res = {"metric": f"{mod} {' '.join(args)}",
               "error": f"{type(e).__name__}: {e}"[:500]}
    finally:
        sys.argv = old
    print(json.dumps(res), flush=True)
    return res


def app_record(integrator: str) -> dict:
    """Cold + warm planar3d_app runs of the default production case.

    The app measures wall-clock around its solve loop (compile included,
    like the reference's Timer("Solve time") on a first run) — the warm
    run goes through the persistent compile cache so its number is the
    steady-state app rate."""
    from wave_fenics_tpu.apps.planar3d_app import run as app_run
    from wave_fenics_tpu.utils.config import SimulationConfig

    cfg = SimulationConfig()
    cfg.time.integrator = integrator
    t0 = time.perf_counter()
    cold = app_run(cfg)
    cold_wall = time.perf_counter() - t0
    warm = app_run(cfg)
    rel = abs(warm["u_norm"] - cold["u_norm"]) / abs(cold["u_norm"])
    res = {
        "metric": f"planar3d app E2E ({integrator.upper()}, "
                  "GDoF*steps/s)",
        "cells": [64, 32, 32], "degree": 4, "dtype": "f32",
        **{k: warm[k] for k in ("ndofs", "nsteps", "steps_per_period",
                                "solve_seconds", "gdof_steps_per_s",
                                "u_norm")},
        "cold_solve_seconds": round(cold["solve_seconds"], 3),
        "cold_wall_seconds": round(cold_wall, 3),
        "warm_vs_cold_u_norm_rel": rel,
        "timing": "warm app run (one dispatch, sync'd)",
    }
    assert rel < 1e-6, f"warm/cold u_norm mismatch: {rel}"
    print(json.dumps(res), flush=True)
    return res


SECTIONS = [
    ("gsolve-leapfrog-64", ("general_solve", "--size", "64", "--degree",
                            "4", "--steps", "200", "--integrator",
                            "leapfrog", "--reps", "2")),
    ("gsolve-rk4-64", ("general_solve", "--size", "64", "--degree", "4",
                       "--steps", "100", "--reps", "2")),
]


def structured_lf_record(solver: str) -> dict:
    """Two-point RTT-free record of the fused leapfrog step kernels on
    the production planar3d grid (64x32x32 p=4, tile 32 — the bench.py
    configuration). rate = ndofs * (n_hi - n_lo) / (t_hi - t_lo): the
    per-dispatch tunnel RTT cancels and canary + timed share one
    dynamic-trip executable (CLAUDE.md timing discipline)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from wave_fenics_tpu.models.linear_wave_padded import PaddedLinearWave
    from wave_fenics_tpu.models.planar3d import planar3d_case
    from wave_fenics_tpu.utils.timing import timeit

    case = planar3d_case(ncells=(64, 32, 32), domain_length=0.1,
                         degree=4, dtype=jnp.float32)
    pm = PaddedLinearWave(case.model, tile_x=32)
    fn = pm.solve_lf_dyn if solver == "lf" else pm.solve_lf2_dyn
    assert (pm._lf_step_fn if solver == "lf" else pm._lf2_step_fn) \
        is not None, f"{solver} kernel unavailable"
    dt_lf = case.dt * 0.71
    run = jax.jit(lambda u, v, n: fn(0.0, dt_lf, n, u, v))
    u0, v0 = pm.zero_state()
    ndofs = case.model.ops.ndofs

    # canary: 2 steps (lf2's single kernel call), then sanity vs zero
    u, v = run(u0, v0, np.int32(2))
    un = float(jnp.max(jnp.abs(u)))
    assert np.isfinite(un), f"{solver} canary produced non-finite state"
    print(f"# {solver} canary ok (|u|_max={un:.3e})", file=sys.stderr,
          flush=True)

    n_lo, n_hi = 400, 1200
    t_hi = timeit(run, u0, v0, np.int32(n_hi), reps=3, warmup=1)
    t_lo = timeit(run, u0, v0, np.int32(n_lo), reps=3, warmup=1)
    ms_step = (t_hi - t_lo) / (n_hi - n_lo) * 1e3
    rate = ndofs * (n_hi - n_lo) / (t_hi - t_lo) / 1e9
    res = {
        "metric": f"planar3d leapfrog GDoF*steps/s (p=4, {ndofs} dofs, "
                  f"1 chip, {solver})",
        "value": round(rate, 4), "unit": "GDoF*steps/s",
        "ms_per_step": round(ms_step, 4), "dt_vs_rk4": 0.71,
        "cells": [64, 32, 32], "degree": 4, "dtype": "f32",
        "tile_x": 32, "timing": "two-point",
        "t_hi_s": round(t_hi, 4), "t_lo_s": round(t_lo, 4),
    }
    print(json.dumps(res), flush=True)
    return res


def lf2_agreement() -> dict:
    """On-chip lf vs lf2 agreement over 200 steps (f32): the 2-step
    kernel must reproduce the single-step kernel's trajectory (tests
    prove == at 1e-12 f64 in interpret mode; this is the real-Mosaic
    check)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from wave_fenics_tpu.models.linear_wave_padded import PaddedLinearWave
    from wave_fenics_tpu.models.planar3d import planar3d_case

    case = planar3d_case(ncells=(64, 32, 32), domain_length=0.1,
                         degree=4, dtype=jnp.float32)
    pm = PaddedLinearWave(case.model, tile_x=32)
    dt_lf = case.dt * 0.71
    u0, v0 = pm.zero_state()
    n = np.int32(200)
    u1, _ = jax.jit(lambda u, v, k: pm.solve_lf_dyn(0.0, dt_lf, k, u, v))(
        u0, v0, n)
    u2, _ = jax.jit(lambda u, v, k: pm.solve_lf2_dyn(0.0, dt_lf, k, u, v))(
        u0, v0, n)
    ref = float(jnp.max(jnp.abs(u1)))
    rel = float(jnp.max(jnp.abs(u1 - u2))) / max(ref, 1e-30)
    res = {"metric": "lf2 vs lf on-chip agreement (200 steps, f32, "
                     "rel max)",
           "value": rel, "unit": "rel", "u_max": ref}
    print(json.dumps(res), flush=True)
    assert rel < 1e-4, f"lf2 diverges from lf on chip: {rel}"
    return res


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="BENCH_SUITE.json")
    ap.add_argument("--only", default=None)
    ap.add_argument("--no-append", action="store_true")
    args = ap.parse_args()

    from wave_fenics_tpu.benchmarks.common import apply_platform

    apply_platform(argparse.Namespace(platform="default", ndev=1))
    import jax

    # persistent compile cache: the app's warm run must not recompile
    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("WAVE_FENICS_JAX_CACHE",
                       os.path.expanduser("~/.wave_fenics_jax_cache")),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp  # canary: fail fast if the tunnel is down

    float(jnp.zeros(()))
    print("# canary ok", file=sys.stderr, flush=True)

    results = []

    def save():
        with open("experiments/logs/r4c_batch.json", "w") as f:
            json.dump(results, f, indent=1)

    for integrator in ("rk4", "leapfrog"):
        name = f"app-{integrator}"
        if args.only and name != args.only:
            continue
        print(f"== {name} ==", file=sys.stderr, flush=True)
        try:
            r = app_record(integrator)
        except Exception as e:
            r = {"metric": name,
                 "error": f"{type(e).__name__}: {e}"[:500]}
            print(json.dumps(r), flush=True)
        r["section"] = name
        results.append(r)
        save()

    for name, cmd in SECTIONS:
        if args.only and name != args.only:
            continue
        print(f"== {name} ==", file=sys.stderr, flush=True)
        r = run_inproc(cmd[0], *cmd[1:])
        r["section"] = name
        results.append(r)
        save()

    # lf2 last: first real-Mosaic execution of pallas_lf2step — a hang
    # here must not cost the records above
    for name, fn in (
        ("lf-step", lambda: structured_lf_record("lf")),
        ("lf2-step", lambda: structured_lf_record("lf2")),
        ("lf2-agreement", lf2_agreement),
    ):
        if args.only and name != args.only:
            continue
        print(f"== {name} ==", file=sys.stderr, flush=True)
        try:
            r = fn()
        except Exception as e:
            r = {"metric": name, "error": f"{type(e).__name__}: {e}"[:500]}
            print(json.dumps(r), flush=True)
        r["section"] = name
        results.append(r)
        save()

    if args.out and not args.no_append:
        doc = {"results": []}
        if os.path.exists(args.out):
            with open(args.out) as f:
                doc = json.load(f)
        doc["results"].extend(r for r in results if "error" not in r)
        with open(args.out, "w") as f:
            json.dump(doc, f, indent=1)
        print("appended records", file=sys.stderr)
    save()


if __name__ == "__main__":
    main()
