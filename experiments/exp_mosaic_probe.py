"""Bisect which Mosaic feature breaks the fused general kernel on chip.

The full kernel (ops/pallas_general.py) died in remote_compile with an
opaque HTTP 500. Probe each ingredient with a minimal kernel, one TPU
client, printing ok/error per feature:

  1. take_along_axis axis=1 (lane dynamic_gather), f32, i32 idx
  2. take_along_axis axis=0 (sublane dynamic_gather)
  3. int8 -> int32 upcast of a VMEM table
  4. int16 -> int32 upcast
  5. jnp.concatenate along sublanes
  6. scalar-prefetch + dynamic-start DMA from ANY + RMW to aliased out
  7. the composed two-step gather chain at [256, 128]

Run: python experiments/exp_mosaic_probe.py
"""

import functools
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _probe(name, fn):
    try:
        out = fn()
        print(json.dumps({"probe": name, "ok": True,
                          "sum": float(np.asarray(out).sum())}),
              flush=True)
    except Exception as e:
        print(json.dumps({"probe": name, "ok": False,
                          "error": f"{type(e).__name__}: {e}"[:600]}),
              flush=True)


def main():
    H = 64
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((H, 128)), jnp.float32)
    idx1 = jnp.asarray(rng.integers(0, 128, (H, 128)), jnp.int32)
    idx0 = jnp.asarray(rng.integers(0, H, (H, 128)), jnp.int32)

    def mk(kern, n_in=2, out_dtype=jnp.float32, shapes=None):
        shapes = shapes or [(H, 128)] * n_in
        return pl.pallas_call(
            kern,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)
                      for _ in range(n_in)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((H, 128), out_dtype),
        )

    def k_lane(x_ref, i_ref, o_ref):
        o_ref[...] = jnp.take_along_axis(x_ref[...], i_ref[...], axis=1)

    _probe("take_along_axis lane (axis=1)",
           lambda: mk(k_lane)(x, idx1))

    def k_sub(x_ref, i_ref, o_ref):
        o_ref[...] = jnp.take_along_axis(x_ref[...], i_ref[...], axis=0)

    _probe("take_along_axis sublane (axis=0)",
           lambda: mk(k_sub)(x, idx0))

    i8 = jnp.asarray(rng.integers(0, 100, (H, 128)), jnp.int8)

    def k_i8(x_ref, i_ref, o_ref):
        o_ref[...] = jnp.take_along_axis(
            x_ref[...], i_ref[...].astype(jnp.int32), axis=1
        )

    _probe("int8 idx upcast + lane gather", lambda: mk(k_i8)(x, i8))

    i16 = jnp.asarray(rng.integers(0, H, (H, 128)), jnp.int16)

    def k_i16(x_ref, i_ref, o_ref):
        o_ref[...] = jnp.take_along_axis(
            x_ref[...], i_ref[...].astype(jnp.int32), axis=0
        )

    _probe("int16 idx upcast + sublane gather", lambda: mk(k_i16)(x, i16))

    half = jnp.asarray(rng.integers(0, H, (H // 2, 128)), jnp.int32)

    def k_cat(x_ref, i_ref, o_ref):
        sent = jnp.full((H - H // 2, 128), H - 1, jnp.int32)
        idx = jnp.concatenate([i_ref[...], sent], axis=0)
        o_ref[...] = jnp.take_along_axis(x_ref[...], idx, axis=0)

    _probe("sublane concat + gather", lambda: mk(k_cat)(x, half))

    # scalar prefetch + dynamic DMA + aliased RMW output
    nrows = 4 * H
    xv = jnp.asarray(rng.standard_normal((nrows, 128)), jnp.float32)
    starts = np.asarray([0, 8, 16], np.int32)

    def k_dma(s_ref, y_ref, xv_ref, o_ref, xw, sem):
        i = pl.program_id(0)
        st = pl.multiple_of(s_ref[i], 8)
        cp = pltpu.make_async_copy(xv_ref.at[pl.ds(st, H)], xw, sem.at[0])
        cp.start()
        cp.wait()
        cp2 = pltpu.make_async_copy(o_ref.at[pl.ds(st, H)], xw, sem.at[1])
        cp2.start()
        cp2.wait()
        cp3 = pltpu.make_async_copy(xw, o_ref.at[pl.ds(st, H)], sem.at[2])
        cp3.start()
        cp3.wait()

    def run_dma():
        gs = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(3,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY),
                      pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
            scratch_shapes=[pltpu.VMEM((H, 128), jnp.float32),
                            pltpu.SemaphoreType.DMA((3,))],
        )
        call = pl.pallas_call(
            k_dma, grid_spec=gs,
            out_shape=jax.ShapeDtypeStruct((nrows, 128), jnp.float32),
            input_output_aliases={1: 0},
        )
        return call(jnp.asarray(starts),
                    jnp.zeros((nrows, 128), jnp.float32), xv)

    _probe("scalar-prefetch dynamic DMA + aliased RMW", run_dma)

    # composed two-step chain at the production tile height
    H2 = 256
    x2 = jnp.asarray(rng.standard_normal((H2, 128)), jnp.float32)
    l8 = jnp.asarray(rng.integers(0, 128, (H2, 128)), jnp.int8)
    r16 = jnp.asarray(rng.integers(0, H2, (64, 128)), jnp.int16)

    def k_chain(x_ref, l_ref, r_ref, o_ref):
        t = jnp.take_along_axis(
            x_ref[...], l_ref[...].astype(jnp.int32), axis=1
        )
        sent = jnp.full((H2 - 64, 128), H2 - 1, jnp.int32)
        row = jnp.concatenate([r_ref[...].astype(jnp.int32), sent],
                              axis=0)
        o_ref[...] = jnp.take_along_axis(t, row, axis=0)

    def run_chain():
        return pl.pallas_call(
            k_chain,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((H2, 128), jnp.float32),
        )(x2, l8, r16)

    _probe("two-step chain at H=256 (i8 lane + i16 row + concat)",
           run_chain)


if __name__ == "__main__":
    main()
