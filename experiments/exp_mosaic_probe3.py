"""Probe round 3: pin the dynamic_gather shape limits + the masked
split-gather composition that the redesigned kernel will use.

  1. lane-gather on [256, 128] (256 sublanes, 128 lanes)
  2. lane-gather on [128, 256] (256 lanes)
  3. masked split composition: lane-gather [256,128] -> transpose ->
     2x (slice + clip + lane-gather [128,128] + mask) -> transpose
  4. scatter-shape composition: transpose + [128,128] gathers + concat

Run: python experiments/exp_mosaic_probe3.py
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


def mk(kern, ins, out_shape):
    return pl.pallas_call(
        kern,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM) for _ in ins],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=out_shape,
    )(*ins)


def main():
    H = 256
    rng = np.random.default_rng(0)
    xn = rng.standard_normal((H, 128)).astype(np.float32)
    x = jnp.asarray(xn)

    lane_n = rng.integers(0, 128, (H, 128)).astype(np.int32)

    def k1(x_ref, i_ref, o_ref):
        o_ref[...] = jnp.take_along_axis(x_ref[...], i_ref[...], axis=1)

    _probe("lane-gather on [256, 128]",
           lambda: mk(k1, [x, jnp.asarray(lane_n)],
                      jax.ShapeDtypeStruct((H, 128), jnp.float32)),
           check=lambda o: np.array_equal(
               o, np.take_along_axis(xn, lane_n.astype(np.int64), 1)))

    xw = rng.standard_normal((128, 256)).astype(np.float32)
    iw = rng.integers(0, 256, (128, 256)).astype(np.int32)
    _probe("lane-gather on [128, 256]",
           lambda: mk(k1, [jnp.asarray(xw), jnp.asarray(iw)],
                      jax.ShapeDtypeStruct((128, 256), jnp.float32)),
           check=lambda o: np.array_equal(
               o, np.take_along_axis(xw, iw.astype(np.int64), 1)))

    # full masked split-gather composition (the redesigned row select)
    lane8 = rng.integers(0, 128, (H, 128)).astype(np.int8)
    rowt = rng.integers(0, H, (128, 128)).astype(np.int16)  # [c, r]

    def k_comp(x_ref, l_ref, rt_ref, o_ref):
        t = jnp.take_along_axis(
            x_ref[...], l_ref[...].astype(jnp.int32), axis=1
        )  # [H, 128]
        tt = t.T  # [128, H]
        rt = rt_ref[...].astype(jnp.int32)  # [128, 128]
        acc = jnp.zeros((128, 128), dtype=jnp.float32)
        for h in range(H // 128):
            th = tt[:, h * 128 : (h + 1) * 128]  # [128, 128]
            idx = jnp.clip(rt - h * 128, 0, 127)
            m = (rt >= h * 128) & (rt < (h + 1) * 128)
            acc = acc + jnp.where(
                m, jnp.take_along_axis(th, idx, axis=1), 0.0
            )
        o_ref[...] = acc.T  # [128(r), 128(c)]

    def ref_comp():
        t = np.take_along_axis(xn, lane8.astype(np.int64), 1)
        return np.take_along_axis(t, rowt.T.astype(np.int64), 0)

    _probe("masked split row-select composition",
           lambda: mk(k_comp, [x, jnp.asarray(lane8), jnp.asarray(rowt)],
                      jax.ShapeDtypeStruct((128, 128), jnp.float32)),
           check=lambda o: np.allclose(o, ref_comp()))

    # scatter-shape composition: [128,128] gathers + sublane concat
    ye = rng.standard_normal((128, 128)).astype(np.float32)
    srt = rng.integers(0, 128, (128, H)).astype(np.int8)  # [c, t]
    snl = rng.integers(0, 128, (H, 128)).astype(np.int8)  # [t, l]

    def k_scat(y_ref, rt_ref, nl_ref, o_ref):
        yt = y_ref[...].T  # [128, 128]
        parts = []
        for h in range(H // 128):
            idx = rt_ref[..., h * 128 : (h + 1) * 128].astype(jnp.int32)
            pt = jnp.take_along_axis(yt, idx, axis=1)  # [128, 128]
            parts.append(pt.T)
        p = jnp.concatenate(parts, axis=0)  # [H, 128]
        o_ref[...] = jnp.take_along_axis(
            p, nl_ref[...].astype(jnp.int32), axis=1
        )

    def ref_scat():
        p = np.take_along_axis(ye, srt.T.astype(np.int64), 0)
        return np.take_along_axis(p, snl.astype(np.int64), 1)

    _probe("scatter composition (gathers + concat)",
           lambda: mk(k_scat, [jnp.asarray(ye), jnp.asarray(srt),
                               jnp.asarray(snl)],
                      jax.ShapeDtypeStruct((H, 128), jnp.float32)),
           check=lambda o: np.allclose(o, ref_scat()))


if __name__ == "__main__":
    main()
