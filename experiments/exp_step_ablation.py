"""Term-bisection of the fused RK4 step kernel (one TPU client).

The kernel runs ~5x above the 300 GB/s streaming roofline of its padded
shape, so the time is in compute/permutes, not HBM. Variants:

- precision HIGHEST (baseline) / HIGH / DEFAULT for the x-band MXU matmul
- ablate x-term / y+z roll stencils / all stencils (traffic floor)

Also records max |diff| of HIGH vs HIGHEST after `--steps` steps (is the
cheaper matmul precision acceptable?).

Run: python experiments/exp_step_ablation.py [--cells 64 32 32]
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
    ap.add_argument("--tile-x", type=int, default=16)
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
    pm = PaddedLinearWave(m, tile_x=args.tile_x)
    b = pm.base
    lay = pm.layout
    w1, w2, src_x, abc_x = _x_face_planes(pm)
    A, _ = separable_stiffness_tables(b.p, b.mesh.h, b.dtype)
    lines = grid_lines(b.mesh.shape, b.p, b.dtype)
    tables = build_step_tables(
        lay, A, lines, -float(b.c0) ** 2, pm._m_lines,
        w1, w2, src_x, abc_x, dtype=b.dtype,
    )
    jts = tuple(jnp.asarray(t) for t in tables)
    ndofs = m.ops.ndofs
    nsteps = args.steps
    P = jax.lax.Precision

    # NOTE: Mosaic's dot lowering supports only DEFAULT and HIGHEST
    variants = [
        ("highest", dict(precision=P.HIGHEST)),
        ("chunk3", dict(yz_chunk=3)),
        ("chunk6", dict(yz_chunk=6)),
        ("chunk9", dict(yz_chunk=9)),
        ("chunk18", dict(yz_chunk=18)),
        ("no-yz", dict(ablate=frozenset("yz"))),
        ("no-xyz (traffic+axpy floor)", dict(ablate=frozenset("xyz"))),
    ]

    u0, v0 = pm.zero_state()
    finals = {}
    for name, kw in variants:
        raw = make_rk4_step_raw(lay, b.c0, b.dtype, **kw)

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
            "variant": name, "tile_x": args.tile_x,
            "ms_per_step": round(t / nsteps * 1e3, 4),
            "gdof_steps": round(ndofs * nsteps / t / 1e9, 4),
        }), flush=True)
        if name in ("highest", "chunk6"):
            finals[name] = run(u0, v0)

    if "chunk6" in finals:
        uh = np.asarray(finals["highest"][0])
        scale = np.abs(uh).max() or 1.0
        du = np.abs(np.asarray(finals["chunk6"][0]) - uh).max() / scale
        print(json.dumps(
            {"check": "chunk6 vs default-chunk baseline", "steps": nsteps,
             "max_rel_diff": float(du)}
        ), flush=True)


if __name__ == "__main__":
    main()
