"""Chain-primitive micro-benchmark: what does one Mosaic dynamic_gather
(jnp.take_along_axis on a 2D tile) actually cost, and how does it scale?

The fused general kernel's floor is its gather/scatter chain VPU work
(~8.5 us per 128-cell batch, docs/BENCH_NOTES.md round 3); every known
table-level lever is measured-exhausted (numbering, window config,
resident). This experiment characterizes the PRIMITIVE so the remaining
ideas can be ranked by measurement instead of guesses:

- us/op vs tile rows R (8/32/128): if the cost is flat in R, per-op
  issue overhead dominates and batching more rows per op (e.g. applying
  the operator to TWO vectors with shared index tables — the RK4-linear
  pairing) wins ~2x; if it scales ~linearly with R, the chain work is
  throughput-bound and no restructuring helps.
- lane-axis (axis=1) vs sublane-axis (axis=0) gather cost.
- the dual-vector pattern directly: C tables x 2 row-blocks with
  consecutive reuse of each table vs 2 independent passes.
- int8 index tables with in-kernel upcast (the production layout) vs
  raw int32.

Run (ONE TPU client): python experiments/exp_chain_microbench.py
            [--platform cpu] (interpret-mode smoke only)
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_LANES = 128


def make_call(R, C, G, *, axis=1, idx_dtype="int32", dual=False,
              interpret=False):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kern(x_ref, idx_ref, o_ref):
        o_ref[:] = jnp.zeros_like(o_ref)
        for k in range(C):
            idx = idx_ref[k]
            if idx_dtype != "int32":
                idx = idx.astype(jnp.int32)
            if dual:
                # two row-blocks through the SAME index table,
                # back-to-back (the dual-vector apply pattern)
                o_ref[0:R] += jnp.take_along_axis(
                    x_ref[0:R], idx, axis=axis)
                o_ref[R:2 * R] += jnp.take_along_axis(
                    x_ref[R:2 * R], idx, axis=axis)
            else:
                o_ref[:] += jnp.take_along_axis(x_ref[:], idx, axis=axis)

    rows = 2 * R if dual else R
    return pl.pallas_call(
        kern,
        grid=(G,),
        in_specs=[
            pl.BlockSpec((rows, _LANES), lambda g: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, R, _LANES), lambda g: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rows, _LANES), lambda g: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, _LANES), jnp.float32),
        interpret=interpret,
    )


def measure(R, C, G, *, axis=1, idx_dtype="int32", dual=False,
            interpret=False, reps=32):
    import jax.numpy as jnp
    import numpy as np

    from wave_fenics_tpu.benchmarks.common import two_point_time

    rng = np.random.default_rng(0)
    rows = 2 * R if dual else R
    x0 = jnp.asarray(rng.standard_normal((rows, _LANES)), jnp.float32)
    hi = _LANES if axis == 1 else R
    idx = jnp.asarray(
        rng.integers(0, hi, size=(C, R, _LANES)),
        jnp.int8 if idx_dtype == "int8" else jnp.int32,
    )
    if idx_dtype == "int8":
        assert hi <= 128
    call = make_call(R, C, G, axis=axis, idx_dtype=idx_dtype, dual=dual,
                     interpret=interpret)
    eps = jnp.zeros((), jnp.float32)

    def body(i, x):
        return x + eps * call(x, idx)

    t = two_point_time(body, x0, reps)
    nops = G * C * (2 if dual else 1)
    return {
        "R": R, "C": C, "G": G, "axis": axis, "idx": idx_dtype,
        "dual": dual, "us_per_call": round(t * 1e6, 2),
        "ns_per_op": round(t / nops * 1e9, 2),
        "ns_per_row128": round(t / nops / max(R // 8, 1) * 1e9 * 16, 2)
        if not dual else None,
    }


CASES = [
    # (R, C, axis, idx_dtype, dual)
    dict(R=8, C=16, axis=1),
    dict(R=32, C=16, axis=1),
    dict(R=128, C=16, axis=1),
    dict(R=128, C=2, axis=1),        # fixed per-grid-step overhead probe
    dict(R=128, C=16, axis=0),       # sublane-wise
    dict(R=128, C=16, axis=1, idx_dtype="int8"),
    dict(R=128, C=16, axis=1, dual=True),   # dual-vector pattern
    dict(R=64, C=16, axis=1, dual=True),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default="default")
    ap.add_argument("--g", type=int, default=512)
    args = ap.parse_args()
    from wave_fenics_tpu.benchmarks.common import apply_platform

    apply_platform(argparse.Namespace(platform=args.platform, ndev=1))
    import jax

    interpret = jax.default_backend() != "tpu"
    out = []
    for case in CASES:
        r = measure(G=args.g, interpret=interpret,
                    **{k: v for k, v in case.items()})
        out.append(r)
        print(json.dumps(r), flush=True)
    with open("experiments/logs/r4_chain_microbench.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
