"""One-client experiment: where do the fused-step kernel's 2.6 ms/step go?

Batches several measurements into a single TPU client (each fresh client
pays minutes of tunnel setup):

1. elementwise-copy bandwidth ceiling on the exact padded [Lx, F] shape
   (the kernel's own DMA view) — the realistic traffic roofline;
2. step kernel at tile_x in {16, 32, 48};
3. fused stage kernel (reference point).

Run: python experiments/exp_step_roofline.py [--cells 64 32 32] [--steps 50]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cells", type=int, nargs=3, default=(64, 32, 32))
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--tiles", type=int, nargs="*", default=[16, 32, 48])
    args = ap.parse_args()

    from wave_fenics_tpu.models.linear_wave_padded import PaddedLinearWave
    from wave_fenics_tpu.models.planar3d import planar3d_case
    from wave_fenics_tpu.utils.timing import timeit

    case = planar3d_case(
        ncells=tuple(args.cells), domain_length=0.1, degree=4,
        dtype=jnp.float32,
    )
    m, dt = case.model, case.dt
    ndofs = m.ops.ndofs
    nsteps = args.steps
    results = []

    def rec(**kw):
        results.append(kw)
        print(json.dumps(kw), flush=True)

    # --- 1. copy-bandwidth ceiling on the padded flat shape -------------
    pm16 = PaddedLinearWave(m, tile_x=16)
    Lx, Ly, Lz = pm16.layout.padded_shape
    F = Ly * Lz
    u0, v0 = pm16.zero_state()
    u2, v2 = u0.reshape(Lx, F), v0.reshape(Lx, F)

    @jax.jit
    def copy_n(u, v):
        def body(_, uv):
            u, v = uv
            return v + 1.0, u + 1.0
        return jax.lax.fori_loop(0, nsteps, body, (u, v))

    t = timeit(copy_n, u2, v2, reps=3, warmup=2)
    nbytes = 2 * Lx * F * 4 * 2  # 2 arrays, r+w
    rec(metric="copy r+w 2 arrays [Lx,F]", shape=[Lx, F],
        ms_per_step=round(t / nsteps * 1e3, 4),
        gbps=round(nbytes * nsteps / t / 1e9, 1))

    # --- 2. step kernel, tile sweep -------------------------------------
    for tx in args.tiles:
        pm = PaddedLinearWave(m, tile_x=tx)
        if pm._step_fn is None:
            rec(metric="step", tile_x=tx, error="step kernel unavailable")
            continue
        u0, v0 = pm.zero_state()

        @jax.jit
        def run(u, v, pm=pm):
            u, v, _ = pm.solve_step_n(0.0, dt, nsteps, u, v)
            return u, v

        t = timeit(run, u0, v0, reps=3, warmup=2)
        rec(metric="step", tile_x=tx, padded=list(pm.layout.padded_shape),
            ms_per_step=round(t / nsteps * 1e3, 4),
            gdof_steps=round(ndofs * nsteps / t / 1e9, 4))

    # --- 3. fused stage kernel ------------------------------------------
    pm = PaddedLinearWave(m, tile_x=16)
    if pm._stage_fn is not None:
        u0, v0 = pm.zero_state()

        @jax.jit
        def runf(u, v):
            u, v, _ = pm.solve_fused_n(0.0, dt, nsteps, u, v)
            return u, v

        t = timeit(runf, u0, v0, reps=3, warmup=2)
        rec(metric="fused-stage", tile_x=16,
            ms_per_step=round(t / nsteps * 1e3, 4),
            gdof_steps=round(ndofs * nsteps / t / 1e9, 4))


if __name__ == "__main__":
    main()
