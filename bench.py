"""Headline benchmark: planar3d HIFU RK4 throughput on one TPU chip.

Prints ONE JSON line: GDoF*steps/second for the p=4 3D planar wave solve
(the reference's north-star workload, demo/cpu_planar3d). Baseline target
from BASELINE.md: >= 1.0 GDoF*steps/sec/chip at p=4 on TPU v5e, so
vs_baseline = value / 1.0.

Usage: python bench.py [--cells NX NY NZ] [--degree P] [--steps N]
"""

import argparse
import json
import os
import signal

import jax
import jax.numpy as jnp


def _watchdog(seconds: int):
    """Emit an honest failure line instead of hanging forever if the TPU
    tunnel is wedged (observed failure mode of this backend)."""

    def _fire(signum, frame):
        print(
            json.dumps(
                {
                    "metric": "planar3d RK4 GDoF*steps/s (p=4, 1 chip) "
                    "[FAILED: device unresponsive within watchdog]",
                    "value": 0.0,
                    "unit": "GDoF*steps/s",
                    "vs_baseline": 0.0,
                }
            ),
            flush=True,
        )
        os._exit(0)

    signal.signal(signal.SIGALRM, _fire)
    signal.alarm(seconds)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cells", type=int, nargs=3, default=(64, 32, 32))
    ap.add_argument("--degree", type=int, default=4)
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--warmup", type=int, default=2)
    ap.add_argument("--solver", choices=["auto", "fused", "padded", "base"],
                    default="auto")
    ap.add_argument("--watchdog", type=int, default=1500,
                    help="seconds before emitting a failure line (0=off)")
    args = ap.parse_args()
    if args.watchdog:
        _watchdog(args.watchdog)

    from wave_fenics_tpu.models.planar3d import planar3d_case

    case = planar3d_case(
        ncells=tuple(args.cells), domain_length=0.1, degree=args.degree,
        dtype=jnp.float32,
    )
    m = case.model
    ndofs = m.ops.ndofs
    dt = case.dt
    nsteps = args.steps

    # production TPU hot path: padded-layout fused-kernel model
    solver = args.solver
    if solver == "auto":
        # 'padded' is the hardware-validated production path (1.03-1.09
        # GDoF*steps/s measured); 'fused' is opt-in until validated on-chip
        # (a kernel hang would not trigger the compile-error fallback).
        solver = "padded" if jax.default_backend() == "tpu" else "base"
    if solver in ("fused", "padded"):
        from wave_fenics_tpu.models.linear_wave_padded import PaddedLinearWave

        pm = PaddedLinearWave(m, tile_x=16)
        u0, v0 = pm.zero_state()

        if solver == "fused" and pm._stage_fn is not None:
            @jax.jit
            def run(u, v):
                u, v, _ = pm.solve_fused_n(0.0, dt, nsteps, u, v)
                return u, v
        else:
            @jax.jit
            def run(u, v):
                u, v, _ = pm.solve(0.0, nsteps * dt, dt, u, v)
                return u, v
    else:
        u0, v0 = m.zero_state()

        @jax.jit
        def run(u, v):
            u, v, _ = m.solve(0.0, nsteps * dt, dt, u, v)
            return u, v

    from wave_fenics_tpu.utils.timing import timeit

    # transfer-based sync: block_until_ready is unreliable on tunneled
    # backends, so timeit forces a device->host element fetch
    try:
        elapsed = timeit(run, u0, v0, reps=3, warmup=args.warmup)
    except Exception:
        if solver == "fused":
            # fall back to the validated padded-kernel path
            @jax.jit
            def run(u, v):
                u, v, _ = pm.solve(0.0, nsteps * dt, dt, u, v)
                return u, v

            elapsed = timeit(run, u0, v0, reps=3, warmup=args.warmup)
        else:
            raise

    signal.alarm(0)
    gdof_steps = ndofs * nsteps / elapsed / 1e9
    print(
        json.dumps(
            {
                "metric": f"planar3d RK4 GDoF*steps/s (p={args.degree}, "
                f"{ndofs} dofs, 1 chip)",
                "value": round(gdof_steps, 4),
                "unit": "GDoF*steps/s",
                "vs_baseline": round(gdof_steps / 1.0, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
