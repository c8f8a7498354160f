"""Is pltpu.roll the step kernel's real floor? (VERDICT r2 weak #2)

The step-kernel bisection (docs/BENCH_NOTES.md) attributes ~47% of the
1.44 ms step to the y/z lane-roll stencils "at their VMEM pass cost".
This microbenchmark separates the ROLL cost from the PASS cost: kernels
that perform n passes over a VMEM-resident [Tx, F] tile where each pass
is (a) roll+FMA, (b) FMA only (no roll), (c) roll only. If slope(a) ==
slope(b), rolls are free and the stencils run at the VMEM-pass bound —
the remaining lever is algorithmic (fewer passes), not a faster roll.

Run: python experiments/exp_roll_speed.py
"""

import argparse
import functools
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from wave_fenics_tpu.utils.timing import timeit


def _kernel(x_ref, c_ref, o_ref, *, n, mode, F):
    acc = x_ref[...] * c_ref[0][None, :]
    t = x_ref[...]
    for k in range(n):
        sh = (k % 9 - 4) % F
        if mode == "roll_fma":
            acc = acc + c_ref[k % 8][None, :] * pltpu.roll(t, sh, 1)
        elif mode == "fma":
            acc = acc + c_ref[k % 8][None, :] * t
        else:  # roll only
            t = pltpu.roll(t, sh, 1)
    if mode == "roll":
        acc = acc + t
    o_ref[...] = acc


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tx", type=int, default=32)
    ap.add_argument("--f", type=int, default=110592)  # production F
    ap.add_argument("--reps", type=int, default=50)
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    Tx, F = args.tx, args.f
    x = jnp.asarray(np.random.default_rng(0).standard_normal((Tx, F)),
                    jnp.float32)
    c = jnp.asarray(np.random.default_rng(1).standard_normal((8, F)),
                    jnp.float32)
    interpret = jax.default_backend() != "tpu"

    results = {}
    for mode in ("roll_fma", "fma", "roll"):
        for n in (2, 8, 18, 36):
            kern = functools.partial(_kernel, n=n, mode=mode, F=F)
            call = pl.pallas_call(
                kern,
                grid=(1,),
                in_specs=[
                    pl.BlockSpec((Tx, F), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((8, F), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((Tx, F), lambda i: (0, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((Tx, F), jnp.float32),
                interpret=interpret,
            )
            reps = args.reps

            @jax.jit
            def run(a, cc):
                return lax.fori_loop(0, reps, lambda i, b: call(b, cc), a)

            t = timeit(run, x, c, reps=3, warmup=1) / reps
            per_pass = t / n * 1e6
            gb = Tx * F * 4 / 2**30
            results[(mode, n)] = t
            print(json.dumps({
                "mode": mode, "n_passes": n, "ms": round(t * 1e3, 4),
                "us_per_pass": round(per_pass, 2),
                "tile_GB_per_s": round(gb / (t / n) if t else 0, 1),
            }), flush=True)

    # slopes between n=8 and n=36
    for mode in ("roll_fma", "fma", "roll"):
        sl = (results[(mode, 36)] - results[(mode, 8)]) / 28 * 1e6
        print(json.dumps({"slope_us_per_pass": round(sl, 2),
                          "mode": mode}), flush=True)


if __name__ == "__main__":
    main()
