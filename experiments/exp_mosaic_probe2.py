"""Probe round 2: alternatives to the (crashing) sublane dynamic_gather.

  1. in-kernel 2D transpose [256,128] -> [128,256]
  2. gather chain as lane-gather -> transpose -> lane-gather
  3. one-hot MXU row-select (iota compare + dot_general)
  4. pltpu.roll with a large lane shift (the roll bench died at n=8)

Run: python experiments/exp_mosaic_probe2.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _probe(name, fn, check=None):
    try:
        out = np.asarray(fn())
        ok = True if check is None else bool(check(out))
        print(json.dumps({"probe": name, "ok": ok,
                          "sum": float(out.sum())}), flush=True)
    except Exception as e:
        print(json.dumps({"probe": name, "ok": False,
                          "error": f"{type(e).__name__}: {e}"[:300]}),
              flush=True)


def main():
    H = 256
    rng = np.random.default_rng(0)
    xn = rng.standard_normal((H, 128)).astype(np.float32)
    x = jnp.asarray(xn)

    def mk(kern, ins, out_shape):
        return pl.pallas_call(
            kern,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)
                      for _ in ins],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=out_shape,
        )(*ins)

    def k_tr(x_ref, o_ref):
        o_ref[...] = x_ref[...].T

    _probe("2D transpose [256,128]->[128,256]",
           lambda: mk(k_tr, [x],
                      jax.ShapeDtypeStruct((128, H), jnp.float32)),
           check=lambda o: np.array_equal(o, xn.T))

    # composed chain: lane-gather, transpose, lane-gather
    lane = rng.integers(0, 128, (H, 128)).astype(np.int8)
    # transposed row table: XE[r, c] = T[row[r, c], c]; here
    # rowT[c, r] = row[r, c]
    rowT = rng.integers(0, H, (128, H)).astype(np.int16)

    def k_chain(x_ref, l_ref, rT_ref, o_ref):
        t = jnp.take_along_axis(
            x_ref[...], l_ref[...].astype(jnp.int32), axis=1
        )  # [H, 128]
        tt = t.T  # [128, H]
        v = jnp.take_along_axis(
            tt, rT_ref[...].astype(jnp.int32), axis=1
        )  # [128, H]: v[c, r] = T[rowT[c, r], c]
        o_ref[...] = v.T  # XE [H, 128]

    def ref_chain():
        t = np.take_along_axis(xn, lane.astype(np.int64), axis=1)
        return np.take_along_axis(
            t, rowT.T.astype(np.int64), axis=0
        )

    _probe("lane-gather -> transpose -> lane-gather chain",
           lambda: mk(k_chain, [x, jnp.asarray(lane), jnp.asarray(rowT)],
                      jax.ShapeDtypeStruct((H, 128), jnp.float32)),
           check=lambda o: np.allclose(o, ref_chain()))

    # one-hot MXU row-select: XE2[r, c] = sum_t OH[r, t] * T[t, c]
    base = rng.integers(0, H, (H,)).astype(np.int32)

    def k_oh(x_ref, b_ref, o_ref):
        ts = jax.lax.broadcasted_iota(jnp.int32, (H, H), 1)
        oh = (ts == b_ref[...].astype(jnp.int32)[:, None]).astype(
            jnp.float32
        )
        o_ref[...] = jax.lax.dot_general(
            oh, x_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )

    _probe("one-hot MXU row-select",
           lambda: mk(k_oh, [x, jnp.asarray(base)],
                      jax.ShapeDtypeStruct((H, 128), jnp.float32)),
           check=lambda o: np.allclose(o, xn[base]))

    # roll with large shift on a wide tile (the roll-bench crasher?)
    F = 110592
    w = jnp.asarray(rng.standard_normal((8, F)).astype(np.float32))

    def k_roll(x_ref, o_ref):
        a = pltpu.roll(x_ref[...], F - 4, 1)
        a = a + pltpu.roll(x_ref[...], 3, 1)
        a = a + pltpu.roll(x_ref[...], F - 16, 1)
        a = a + pltpu.roll(x_ref[...], 128, 1)
        o_ref[...] = a

    _probe("4 rolls incl. large shifts on [8, 110592]",
           lambda: mk(k_roll, [w],
                      jax.ShapeDtypeStruct((8, F), jnp.float32)))


if __name__ == "__main__":
    main()
