"""Round-4e: first successful real-Mosaic run of the 2-step RK4 kernel.

The r4d/r4e attempt at the temporal-blocked RK4 kernel
(ops/pallas_rk42step.py) died in the Mosaic compile: VMEM OOM 129.47 MB
of 128 MB with **90.72 MB of register-allocator spill slots** — the
live-value set of the doubled substep body (experiments/logs/
r4e_rk42.log). The spill is dominated by the rolled stencil tensors the
scheduler keeps live per accumulation chunk, so the lever is the
roll-chunk envelope: cap chunk*nrows at roll_env*(Tx+4p) rows (was
hardwired 9 == the single-step kernel's live-roll budget, which the
2-step body cannot also afford).

This script tries roll_env = 6, then 4, then 3 IN ONE TPU CLIENT
(client establishment costs 5-15 min; a compile OOM raises in-process
and the client survives). First env that compiles gets:
  - canary exec (n=2: one kernel call)
  - on-chip agreement vs the single-step RK4 kernel (50 steps, f32)
  - two-point rate (n=200 / n=1200 of ONE dynamic-trip executable)

Run:  python experiments/exp_round4e_rk42.py
Log:  experiments/logs/r4e_rk42.json (+ stderr notes)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LOG = "experiments/logs/r4e_rk42.json"
ENVS = (6, 4, 3)


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from wave_fenics_tpu.utils.timing import sync

    results: list[dict] = []

    def emit(rec: dict) -> None:
        results.append(rec)
        print(json.dumps(rec), flush=True)
        os.makedirs(os.path.dirname(LOG), exist_ok=True)
        with open(LOG, "w") as f:
            json.dump(results, f, indent=1)

    # lease warmer: trivial non-Pallas dispatch inside THIS client
    x = jnp.full((256, 256), 1.0 / 256.0)
    print(f"# warm ok backend={jax.default_backend()} "
          f"val={float((x @ x).sum()):.3f}", file=sys.stderr, flush=True)

    from wave_fenics_tpu.models.linear_wave_padded import PaddedLinearWave
    from wave_fenics_tpu.utils.config import SimulationConfig

    case = SimulationConfig().build_case()
    dt = case.dt

    def timed_exec(compiled, *cargs):
        t0 = time.perf_counter()
        out = compiled(*cargs)
        sync(*jax.tree.leaves(out))
        return time.perf_counter() - t0

    compiled2 = None
    used_env = None
    pm = None
    for env in ENVS:
        os.environ["WAVE_FENICS_RK42_ROLL_ENV"] = str(env)
        pm = PaddedLinearWave(case.model, tile_x=32)
        assert pm._rk42_step_fn is not None
        u0, v0 = pm.zero_state()
        targ = jnp.asarray(0.0, dtype=pm.base.dtype)
        fn2 = jax.jit(
            lambda uu, vv, tt, n: pm.solve_step2_dyn(tt, dt, n, uu, vv))
        t0 = time.perf_counter()
        try:
            compiled2 = fn2.lower(u0, v0, targ, np.int32(2)).compile()
        except Exception as e:  # Mosaic VMEM OOM surfaces as JaxRuntimeError
            msg = str(e).splitlines()
            head = next((ln for ln in msg if "vmem" in ln.lower()), msg[0])
            emit({"section": "rk42-compile-fail", "roll_env": env,
                  "compile_s": round(time.perf_counter() - t0, 1),
                  "error": head[:300]})
            compiled2 = None
            continue
        emit({"section": "rk42-compile-ok", "roll_env": env,
              "compile_s": round(time.perf_counter() - t0, 1)})
        used_env = env
        break

    if compiled2 is None:
        emit({"section": "rk42-step", "status": "FAILED",
              "note": f"all roll_env candidates {ENVS} OOM'd VMEM"})
        return

    u0, v0 = pm.zero_state()
    targ = jnp.asarray(0.0, dtype=pm.base.dtype)
    e_canary = timed_exec(compiled2, u0, v0, targ, np.int32(2))
    print(f"# rk42 canary ok ({e_canary:.3f}s)", file=sys.stderr, flush=True)

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
        "metric": "rk42 vs rk4-step on-chip agreement (50 steps, f32, "
                  "rel max)",
        "value": float(rel), "u_max": float(umax), "roll_env": used_env,
    })
    if not float(rel) < 1e-4:
        emit({"section": "rk42-step", "status": "FAILED",
              "note": f"rk42 disagrees with step kernel: rel={float(rel)}"})
        return

    n_lo, n_hi = 200, 1200
    e_lo = timed_exec(compiled2, u0, v0, targ, np.int32(n_lo))
    e_hi = timed_exec(compiled2, u0, v0, targ, np.int32(n_hi))
    ms = (e_hi - e_lo) / (n_hi - n_lo) * 1e3
    nd = pm.base.ops.ndofs
    emit({
        "section": "rk42-step",
        "metric": f"planar3d RK4 GDoF*steps/s (p=4, {nd} dofs, 1 chip, "
                  "step2)",
        "value": round(nd / ms / 1e6, 4), "unit": "GDoF*steps/s",
        "ms_per_step": round(ms, 4), "roll_env": used_env,
        "cells": [64, 32, 32], "degree": 4, "dtype": "f32",
        "tile_x": 32, "timing": "two-point",
        "t_hi_s": round(e_hi, 4), "t_lo_s": round(e_lo, 4),
    })

    # reference point: single-step kernel rate in the SAME client/session
    # (session RTT and clock conditions vary; an in-session baseline makes
    # the step2-vs-step ratio trustworthy)
    e1_lo = timed_exec(compiled1, u0, v0, targ, np.int32(n_lo))
    e1_hi = timed_exec(compiled1, u0, v0, targ, np.int32(n_hi))
    ms1 = (e1_hi - e1_lo) / (n_hi - n_lo) * 1e3
    emit({
        "section": "rk4-step-baseline-same-session",
        "value": round(nd / ms1 / 1e6, 4), "unit": "GDoF*steps/s",
        "ms_per_step": round(ms1, 4), "timing": "two-point",
    })
    print("# done", file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()
