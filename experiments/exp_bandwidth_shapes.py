"""Streaming-bandwidth probe across array shapes (one TPU client).

The fused-step kernel is at the elementwise streaming rate of its own
padded [Lx, F] shape (~70-120 GB/s) — far below the ~415 GB/s measured on
power-of-two 2D shapes in round 1. This maps where the cliff is: minor-dim
power-of-two-ness, sublane count, total size, rank.

Run: python experiments/exp_bandwidth_shapes.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from wave_fenics_tpu.utils.timing import timeit

STEPS = 200

SHAPES = [
    (304, 20736),    # step-kernel padded flat shape (144*144)
    (304, 16384),    # power-of-two minor
    (256, 16384),    # both power-of-two
    (304, 18432),    # 144*128
    (304, 20480),    # 160*128 (non-po2, 512-multiple)
    (304, 32768),    # po2 minor at ~1.6x the data
    (2432, 2592),    # same bytes, fatter sublane dim (304*8, 20736/8)
    (38, 165888),    # same bytes, minor dim 8x
    (6303744,),      # 1D flat
    (304, 144, 144), # 3D view
    (4096, 16384),   # big po2 reference point
]


def main():
    for shape in SHAPES:
        n = 1
        for d in shape:
            n *= d
        u = jnp.zeros(shape, jnp.float32)
        v = jnp.zeros(shape, jnp.float32)

        @jax.jit
        def copy_n(u, v):
            def body(_, uv):
                u, v = uv
                return v + 1.0, u + 1.0
            return jax.lax.fori_loop(0, STEPS, body, (u, v))

        t = timeit(copy_n, u, v, reps=3, warmup=2)
        nbytes = 2 * n * 4 * 2  # 2 arrays, r+w
        print(json.dumps({
            "shape": list(shape), "mb_per_array": round(n * 4 / 1e6, 1),
            "us_per_step": round(t / STEPS * 1e6, 1),
            "gbps": round(nbytes * STEPS / t / 1e9, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
