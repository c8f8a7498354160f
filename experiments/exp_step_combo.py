"""Confirm the production config for the fused step kernel (one client):
tile_x x yz_chunk combinations, plus a correctness check of the winner
against the (16, 1) baseline.

Run: python experiments/exp_step_combo.py
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cells", type=int, nargs=3, default=(64, 32, 32))
    ap.add_argument("--steps", type=int, default=100)
    args = ap.parse_args()

    from wave_fenics_tpu.models.linear_wave_padded import (
        PaddedLinearWave, _x_face_planes)
    from wave_fenics_tpu.models.planar3d import planar3d_case
    from wave_fenics_tpu.ops.pallas_rk4step import (
        build_step_tables, make_rk4_step_raw)
    from wave_fenics_tpu.ops.separable import (
        grid_lines, separable_stiffness_tables)
    from wave_fenics_tpu.utils.timing import timeit

    case = planar3d_case(
        ncells=tuple(args.cells), domain_length=0.1, degree=4,
        dtype=jnp.float32,
    )
    m, dt = case.model, case.dt
    ndofs = m.ops.ndofs
    nsteps = args.steps

    def build(tx):
        pm = PaddedLinearWave(m, tile_x=tx)
        b = pm.base
        lay = pm.layout
        w1, w2, src_x, abc_x = _x_face_planes(pm)
        A, _ = separable_stiffness_tables(b.p, b.mesh.h, b.dtype)
        lines = grid_lines(b.mesh.shape, b.p, b.dtype)
        tables = build_step_tables(
            lay, A, lines, -float(b.c0) ** 2, pm._m_lines,
            w1, w2, src_x, abc_x, dtype=b.dtype,
        )
        return pm, lay, tuple(jnp.asarray(t) for t in tables)

    built = {}
    finals = {}
    # NB: (48, >=6) exceeds VMEM at compile (chunk value-expressions scale
    # with the window rows)
    for tx, chunk in [(48, 1), (48, 3), (32, 9), (32, 6)]:
        if tx not in built:
            built[tx] = build(tx)
        pm, lay, jts = built[tx]
        raw = make_rk4_step_raw(lay, m.c0, m.dtype, yz_chunk=chunk)
        u0, v0 = pm.zero_state()

        @jax.jit
        def run(u, v):
            def body(carry, _):
                u, v = carry
                u, v = raw(u, v, dt, 1.0, 1.0, 1.0, 1.0, *jts)
                return (u, v), None
            (u, v), _ = jax.lax.scan(body, (u, v), None, length=nsteps)
            return u, v

        t = timeit(run, u0, v0, reps=3, warmup=1)
        print(json.dumps({
            "tile_x": tx, "yz_chunk": chunk,
            "ms_per_step": round(t / nsteps * 1e3, 4),
            "gdof_steps": round(ndofs * nsteps / t / 1e9, 4),
        }), flush=True)
        if (tx, chunk) in ((48, 1), (48, 3)):
            pm_ = built[tx][0]
            u1, v1 = run(u0, v0)
            finals[(tx, chunk)] = np.asarray(pm_.to_grid(u1))

    if len(finals) == 2:
        a, b_ = finals[(48, 1)], finals[(48, 3)]
        scale = np.abs(a).max() or 1.0
        print(json.dumps({
            "check": "(48,3) vs (48,1)", "steps": nsteps,
            "max_rel_diff": float(np.abs(a - b_).max() / scale),
        }), flush=True)


if __name__ == "__main__":
    main()
