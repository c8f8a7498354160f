"""Round-5 one-client chip batch (VERDICT r4 items 2, 3, 5).

Sections (each try/except-isolated; results stream to
experiments/logs/r5_batch.json as they land):

S1 roofline — settle the 130-vs-300 GB/s contradiction in ONE session:
   (a) XLA elementwise pass over the exact padded [352, 20736] 2-array
       state, (b) a minimal double-buffered Pallas slab-streaming copy
       with the step kernel's exact DMA pattern (manual async slab
       copies, halo-amplified reads) minus all compute — at off0 = 0
       (pure streaming) and off0 = 3p (the step kernel's halo), and
       (c) the production RK4 step kernel. All two-point-timed on one
       dynamic-trip executable each.

S2 one-hot MXU gather micro A/B — can iota-compare + dot_general beat
   the 75 ns/op lane-wise dynamic_gather floor (the fused general
   kernel's chain primitive) at low degree?
   (g) dynamic_gather baseline [128, 128] C=16 (r4b: 75 ns/op),
   (l) row-invariant lane permutation as x @ P (P one-hot from a
       [1, 128] index row), (r) one-hot row-select M @ x (the probe-2
       construct), both MXU contractions of the same op count.

S3 p=2/p=3 production-form pin — affine packed-row geometry ON vs OFF
   (WAVE_FENICS_TPU_NO_AFFINE) for the fused general mass/stiffness at
   32^3 in ONE session, resolving the 0.865-vs-0.713 p=2 record
   conflict (round-3g affine session vs round-4 full-lane session).

Run:   python experiments/exp_round5_batch.py [--smoke]
Log:   experiments/logs/r5_batch.json
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LOG = "experiments/logs/r5_batch.json"
RESULTS: list[dict] = []


def emit(rec: dict) -> None:
    RESULTS.append(rec)
    print(json.dumps(rec), flush=True)
    os.makedirs(os.path.dirname(LOG), exist_ok=True)
    with open(LOG, "w") as f:
        json.dump(RESULTS, f, indent=1)


def section(name):
    def deco(fn):
        @functools.wraps(fn)
        def run(*a, **k):
            t0 = time.perf_counter()
            try:
                fn(*a, **k)
                emit({"section": name, "status": "ok",
                      "elapsed_s": round(time.perf_counter() - t0, 1)})
            except Exception as e:  # noqa: BLE001 — isolate sections
                emit({"section": name, "status": "FAILED",
                      "error": f"{type(e).__name__}: {e}"[:500],
                      "elapsed_s": round(time.perf_counter() - t0, 1)})
        return run
    return deco


# ---------------------------------------------------------------------------
# S1: the streaming roofline triple
# ---------------------------------------------------------------------------

def make_stream_copy(Lx, F, Tx, off0, dtype, interpret):
    """Minimal double-buffered slab-streaming copy: the rk4step kernel's
    DMA pattern (manual async [S0, F] slab copies from ANY-space HBM,
    blocked [Tx, F] writes, pad tiles written without reads) with the
    compute replaced by a single add."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    S0 = Tx + 2 * off0

    def kern(u_hbm, v_hbm, u_out, v_out, slab_u, slab_v, sem_u, sem_v):
        ix = pl.program_id(0)
        n = pl.num_programs(0)
        is_pad = jnp.logical_or(ix == 0, ix == n - 1)

        def dma(hbm, slab, sem, slot, idx):
            start = pl.multiple_of(idx * Tx - off0, 8)
            return pltpu.make_async_copy(
                hbm.at[pl.ds(start, S0)], slab.at[slot], sem.at[slot]
            )

        @pl.when(ix + 1 <= n - 2)
        def _():
            dma(u_hbm, slab_u, sem_u, (ix + 1) % 2, ix + 1).start()
            dma(v_hbm, slab_v, sem_v, (ix + 1) % 2, ix + 1).start()

        @pl.when(is_pad)
        def _():
            u_out[:] = jnp.zeros((Tx, F), dtype=dtype)
            v_out[:] = jnp.zeros((Tx, F), dtype=dtype)

        @pl.when(jnp.logical_not(is_pad))
        def _():
            dma(u_hbm, slab_u, sem_u, ix % 2, ix).wait()
            dma(v_hbm, slab_v, sem_v, ix % 2, ix).wait()
            one = jnp.asarray(1.0, dtype)
            u_out[:] = slab_u[ix % 2, off0:off0 + Tx] + one
            v_out[:] = slab_v[ix % 2, off0:off0 + Tx] + one

    grid_n = Lx // Tx
    tile2 = lambda i: (i, 0)
    vout = pl.BlockSpec((Tx, F), tile2, memory_space=pltpu.VMEM)
    call = pl.pallas_call(
        kern,
        interpret=interpret,
        grid=(grid_n,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=(vout, vout),
        out_shape=tuple(jax.ShapeDtypeStruct((Lx, F), dtype)
                        for _ in range(2)),
        scratch_shapes=[
            pltpu.VMEM((2, S0, F), dtype),
            pltpu.VMEM((2, S0, F), dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024,
        ),
    )
    return call, grid_n


@section("roofline")
def s1_roofline(smoke):
    import jax
    import jax.numpy as jnp

    from wave_fenics_tpu.benchmarks.common import two_point_time
    from wave_fenics_tpu.models.linear_wave_padded import PaddedLinearWave
    from wave_fenics_tpu.models.planar3d import planar3d_case

    interpret = jax.default_backend() != "tpu"
    cells = (16, 4, 4) if smoke else (64, 32, 32)
    reps = 8 if smoke else 1200
    case = planar3d_case(ncells=cells, domain_length=0.1, degree=4,
                         dtype=jnp.float32)
    m, dt = case.model, case.dt
    pm = PaddedLinearWave(m, tile_x=32)
    Lx, Ly, Lz = pm.layout.padded_shape
    F = Ly * Lz
    Tx = pm.layout.tile_x
    u0, v0 = pm.zero_state()
    u2, v2 = u0.reshape(Lx, F), v0.reshape(Lx, F)
    GB = Lx * F * 4 / 1e9  # one full-array pass

    # (a) XLA elementwise pass: 2 arrays, 1 read + 1 write each
    def body_xla(i, uv):
        u, v = uv
        return u + 1.0, v + 1.0

    t = two_point_time(body_xla, (u2, v2), reps)
    emit({"section": "roofline-xla-copy", "shape": [Lx, F],
          "ms_per_iter": round(t * 1e3, 4), "bytes_per_iter_gb": 4 * GB,
          "effective_gbps": round(4 * GB / t, 1), "timing": "two-point"})

    # (b) Pallas slab-streaming copies (the step kernel's DMA skeleton)
    ntiles = Lx // Tx
    for off0 in (0, 24):
        call, grid_n = make_stream_copy(Lx, F, Tx, off0, jnp.float32,
                                        interpret)

        def body_pl(i, uv, call=call):
            return call(uv[0], uv[1])

        t = two_point_time(body_pl, (u2, v2), reps)
        # interior tiles read amplified slabs; pads are write-only
        rd = 2 * (ntiles - 2) * (Tx + 2 * off0) * F * 4 / 1e9
        wr = 2 * Lx * F * 4 / 1e9
        emit({"section": "roofline-pallas-stream", "off0": off0,
              "tile_x": Tx, "shape": [Lx, F],
              "ms_per_iter": round(t * 1e3, 4),
              "bytes_per_iter_gb": round(rd + wr, 4),
              "effective_gbps": round((rd + wr) / t, 1),
              "nominal_gbps_4passes": round(4 * GB / t, 1),
              "timing": "two-point"})

    # (c) the production step kernel in the same session
    if pm._step_fn is None:
        emit({"section": "roofline-step", "error": "step kernel n/a"})
        return
    step = pm._step_fn
    dtf = float(dt)
    _RK_C = (0.0, 0.5, 0.5, 1.0)

    def body_step(i, carry):
        u, v, tt = carry
        gs = [m.g_amplitude(tt + c * dtf) for c in _RK_C]
        u, v = step(u, v, dtf, *gs)
        return (u, v, tt + dtf)

    t = two_point_time(
        body_step, (u0, v0, jnp.asarray(0.0, jnp.float32)), reps)
    # state traffic model: 2 reads x (Tx+2*24)/Tx + 2 writes
    rd = 2 * (ntiles - 2) * (Tx + 48) * F * 4 / 1e9
    wr = 2 * Lx * F * 4 / 1e9
    nd = m.ops.ndofs
    emit({"section": "roofline-step", "tile_x": Tx,
          "ms_per_step": round(t * 1e3, 4),
          "gdof_steps_per_s": round(nd / t / 1e9, 4),
          "state_bytes_per_step_gb": round(rd + wr, 4),
          "effective_gbps": round((rd + wr) / t, 1),
          "timing": "two-point"})


# ---------------------------------------------------------------------------
# S2: one-hot MXU gather A/B vs the dynamic_gather chain primitive
# ---------------------------------------------------------------------------

def make_onehot_call(R, C, G, variant, interpret):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    L = 128
    hp = jax.lax.Precision.HIGHEST

    def kern(x_ref, idx_ref, o_ref):
        o_ref[:] = jnp.zeros_like(o_ref)
        for k in range(C):
            if variant == "gather":
                o_ref[:] += jnp.take_along_axis(
                    x_ref[:], idx_ref[k], axis=1)
            elif variant == "lane-perm":
                # row-invariant lane permutation as one MXU matmul:
                # out[r, l] = sum_c x[r, c] * (c == idx[l])
                lane = jax.lax.broadcasted_iota(jnp.int32, (L, L), 0)
                P = (lane == idx_ref[k]).astype(jnp.float32)
                o_ref[:] += jax.lax.dot_general(
                    x_ref[:], P, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32, precision=hp)
            elif variant == "row-select":
                # one-hot row mixing: out[r2, :] = sum_r1 M[r2, r1] x[r1, :]
                src = jax.lax.broadcasted_iota(jnp.int32, (R, R), 1)
                M = (src == idx_ref[k]).astype(jnp.float32)
                o_ref[:] += jax.lax.dot_general(
                    M, x_ref[:], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32, precision=hp)
            else:
                raise ValueError(variant)

    idx_shape = {
        "gather": (C, R, L),
        "lane-perm": (C, 1, L),
        "row-select": (C, R, 1),
    }[variant]
    return pl.pallas_call(
        kern,
        grid=(G,),
        in_specs=[
            pl.BlockSpec((R, L), lambda g: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(idx_shape, lambda g: (0,) * len(idx_shape),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((R, L), lambda g: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((R, L), jnp.float32),
        interpret=interpret,
    ), idx_shape


@section("onehot-micro")
def s2_onehot(smoke):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from wave_fenics_tpu.benchmarks.common import two_point_time

    interpret = jax.default_backend() != "tpu"
    G = 8 if smoke else 512
    reps = 4 if smoke else 64
    R, C = 128, 16
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.standard_normal((R, 128)), jnp.float32)

    for variant in ("gather", "lane-perm", "row-select"):
        call, idx_shape = make_onehot_call(R, C, G, variant, interpret)
        hi = R if variant == "row-select" else 128
        idx = jnp.asarray(rng.integers(0, hi, size=idx_shape), jnp.int32)
        eps = jnp.zeros((), jnp.float32)

        def body(i, x, call=call, idx=idx):
            return x + eps * call(x, idx)

        t = two_point_time(body, x0, reps)
        emit({"section": "onehot-micro", "variant": variant, "R": R,
              "C": C, "G": G, "us_per_call": round(t * 1e6, 2),
              "ns_per_op": round(t / (G * C) * 1e9, 2),
              "timing": "two-point"})


# ---------------------------------------------------------------------------
# S3: p=2 / p=3 affine-form A/B (one session, production configs)
# ---------------------------------------------------------------------------

@section("p23-affine-ab")
def s3_affine_ab(smoke):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from wave_fenics_tpu.benchmarks.common import two_point_time
    from wave_fenics_tpu.core.dofmap import build_dofmap
    from wave_fenics_tpu.core.mesh import box_mesh
    from wave_fenics_tpu.ops.operators import GeneralOperators

    n = 8 if smoke else 32
    reps = 8 if smoke else 200
    rng = np.random.default_rng(1)
    for p in (2, 3):
        hm = box_mesh((n, n, n), (1.0, 1.0, 1.0)).to_hex_mesh()
        dofs = build_dofmap(hm, p)
        x0 = jnp.asarray(rng.standard_normal(dofs.ndofs), jnp.float32)
        for form in ("affine", "per-node"):
            os.environ.pop("WAVE_FENICS_TPU_NO_AFFINE", None)
            if form == "per-node":
                os.environ["WAVE_FENICS_TPU_NO_AFFINE"] = "1"
            gops = GeneralOperators(hm, dofs, dtype=jnp.float32)
            used_affine = gops._fused_affine is not None
            for opname, f in (
                ("mass", gops.mass),
                ("stiffness", lambda a: gops.stiffness(a, 1500.0)),
            ):
                t = two_point_time(lambda i, a: f(a), x0, reps)
                emit({"section": "p23-affine-ab", "p": p, "form": form,
                      "affine_engaged": used_affine, "op": opname,
                      "size": n, "ndofs": dofs.ndofs,
                      "ms_per_apply": round(t * 1e3, 4),
                      "gdof_per_s": round(dofs.ndofs / t / 1e9, 4),
                      "timing": "two-point"})
    os.environ.pop("WAVE_FENICS_TPU_NO_AFFINE", None)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--smoke", action="store_true",
                    help="tiny shapes, CPU interpret — script validation")
    ap.add_argument("--sections", default="roofline,onehot,p23")
    args = ap.parse_args()
    if args.smoke:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import jax

    x = jax.numpy.full((256, 256), 1.0 / 256.0)
    print(f"# warm ok backend={jax.default_backend()} "
          f"val={float((x @ x).sum()):.3f}", file=sys.stderr, flush=True)

    secs = set(args.sections.split(","))
    if "roofline" in secs:
        s1_roofline(args.smoke)
    if "onehot" in secs:
        s2_onehot(args.smoke)
    if "p23" in secs:
        s3_affine_ab(args.smoke)
    print("# batch done", file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()
