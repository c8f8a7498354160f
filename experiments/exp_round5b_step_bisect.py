"""Round-5b: step-kernel COMPUTE bisection at the production config.

The round-5 roofline (r5_batch.json) showed the step kernel runs at 31%
of its own DMA pattern's demonstrated streaming rate (127 vs 314-407
GB/s): ~0.96 of its 1.40 ms/step is stencil/stage compute that does not
hide under the slab DMA. This batch decomposes that compute at tile 32
(the round-2 bisection ran tile 16 and predates roll_env/yz_chunk):

  - ablate sweep: full / no-x / no-y / no-z / no-yz / no-xyz
    (make_rk4_step_raw(ablate=...)) — per-direction stencil cost; the
    y rolls shift multiples of Lz=144 lanes, the z rolls 1..4 lanes,
    so their pltpu.roll costs may differ wildly.
  - yz_chunk sweep at full physics: 1 / 3 / 9 / 18 — accumulator-churn
    vs live-roll-set trade at the production window heights.
  - tile_x sweep at full physics: 32 / 48 / 64 — the stage-window
    x-overhang is (4*Tx+8p)/(4*Tx) (25% extra stencil rows at Tx=32,
    12.5% at 64) and the slab read amplification (Tx+2*off0)/Tx drops
    from 2.5x to 1.5x; VMEM stays well under budget through Tx=64.

All two-point on dynamic-trip executables, one client. Ablated kernels
are WRONG physics (zero-filled terms) — timing only.

Run:  python experiments/exp_round5b_step_bisect.py [--smoke]
Log:  experiments/logs/r5b_bisect.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LOG = "experiments/logs/r5b_bisect.json"
RESULTS: list[dict] = []


def emit(rec: dict) -> None:
    RESULTS.append(rec)
    print(json.dumps(rec), flush=True)
    os.makedirs(os.path.dirname(LOG), exist_ok=True)
    with open(LOG, "w") as f:
        json.dump(RESULTS, f, indent=1)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--smoke", action="store_true")
    args = ap.parse_args()
    if args.smoke:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import jax
    import jax.numpy as jnp

    from wave_fenics_tpu.benchmarks.common import two_point_time
    from wave_fenics_tpu.models.linear_wave_padded import (PaddedLinearWave,
                                                           _x_face_planes)
    from wave_fenics_tpu.models.planar3d import planar3d_case
    from wave_fenics_tpu.ops.pallas_rk4step import (build_step_tables,
                                                    make_rk4_step_raw)
    from wave_fenics_tpu.ops.separable import (grid_lines,
                                               separable_stiffness_tables)

    x = jnp.full((256, 256), 1.0 / 256.0)
    print(f"# warm ok backend={jax.default_backend()} "
          f"val={float((x @ x).sum()):.3f}", file=sys.stderr, flush=True)

    cells = (16, 4, 4) if args.smoke else (64, 32, 32)
    reps = 8 if args.smoke else 600
    case = planar3d_case(ncells=cells, domain_length=0.1, degree=4,
                         dtype=jnp.float32)
    m, dt = case.model, float(case.dt)
    pm = PaddedLinearWave(m, tile_x=32)
    lay = pm.layout
    b = pm.base
    w1, w2, src_x, abc_x = _x_face_planes(pm)
    A, _ = separable_stiffness_tables(b.p, b.mesh.h, b.dtype)
    lines = grid_lines(b.mesh.shape, b.p, b.dtype)
    tables = tuple(jnp.asarray(t) for t in build_step_tables(
        lay, A, lines, -float(b.c0) ** 2, pm._m_lines,
        w1, w2, src_x, abc_x, dtype=b.dtype,
    ))
    u0, v0 = pm.zero_state()
    nd = m.ops.ndofs

    def run_variant(name, ablate=(), yz_chunk=9):
        t0 = time.perf_counter()
        try:
            step = make_rk4_step_raw(lay, b.c0, dtype=b.dtype,
                                     ablate=frozenset(ablate),
                                     yz_chunk=yz_chunk)

            def body(i, carry):
                u, v = carry
                u, v = step(u, v, dt, 1.0, 1.0, 1.0, 1.0, *tables)
                return (u, v)

            t = two_point_time(body, (u0, v0), reps)
            emit({"section": "step-bisect", "variant": name,
                  "ablate": sorted(ablate), "yz_chunk": yz_chunk,
                  "ms_per_step": round(t * 1e3, 4),
                  "gdof_steps_per_s": round(nd / t / 1e9, 4),
                  "timing": "two-point",
                  "build_s": round(time.perf_counter() - t0, 1)})
        except Exception as e:  # noqa: BLE001
            emit({"section": "step-bisect", "variant": name,
                  "error": f"{type(e).__name__}: {e}"[:300]})

    run_variant("full")
    run_variant("no-x", ablate=("x",))
    run_variant("no-y", ablate=("y",))
    run_variant("no-z", ablate=("z",))
    run_variant("no-yz", ablate=("y", "z"))
    run_variant("no-xyz", ablate=("x", "y", "z"))
    for c in (1, 3, 18):
        run_variant(f"chunk{c}", yz_chunk=c)

    # tile_x sweep at full physics (independent layouts + tables)
    for tx in (48, 64):
        t0 = time.perf_counter()
        try:
            pm_t = PaddedLinearWave(m, tile_x=tx)
            lay_t = pm_t.layout
            w1t, w2t, sxt, axt = _x_face_planes(pm_t)
            tab_t = tuple(jnp.asarray(t) for t in build_step_tables(
                lay_t, A, lines, -float(b.c0) ** 2, pm_t._m_lines,
                w1t, w2t, sxt, axt, dtype=b.dtype,
            ))
            step_t = make_rk4_step_raw(lay_t, b.c0, dtype=b.dtype)

            def body_t(i, carry):
                u, v = carry
                u, v = step_t(u, v, dt, 1.0, 1.0, 1.0, 1.0, *tab_t)
                return (u, v)

            u0t, v0t = pm_t.zero_state()
            t = two_point_time(body_t, (u0t, v0t), reps)
            emit({"section": "step-tile", "tile_x": tx,
                  "padded_x": lay_t.padded_shape[0],
                  "ms_per_step": round(t * 1e3, 4),
                  "gdof_steps_per_s": round(nd / t / 1e9, 4),
                  "timing": "two-point",
                  "build_s": round(time.perf_counter() - t0, 1)})
        except Exception as e:  # noqa: BLE001
            emit({"section": "step-tile", "tile_x": tx,
                  "error": f"{type(e).__name__}: {e}"[:300]})

    # p=1 form A/B (the affine default flip extrapolated p=1 from the
    # p=2/3 data; round 4's 0.292/0.217 record was the affine form)
    try:
        import numpy as np

        from wave_fenics_tpu.core.dofmap import build_dofmap
        from wave_fenics_tpu.core.mesh import box_mesh
        from wave_fenics_tpu.ops.operators import GeneralOperators

        n = 8 if args.smoke else 32
        reps1 = 8 if args.smoke else 200
        hm = box_mesh((n, n, n), (1.0, 1.0, 1.0)).to_hex_mesh()
        dofs = build_dofmap(hm, 1)
        rng = np.random.default_rng(1)
        x0 = jnp.asarray(rng.standard_normal(dofs.ndofs), jnp.float32)
        for form in ("affine", "per-node"):
            os.environ.pop("WAVE_FENICS_TPU_AFFINE", None)
            os.environ.pop("WAVE_FENICS_TPU_NO_AFFINE", None)
            if form == "affine":
                os.environ["WAVE_FENICS_TPU_AFFINE"] = "1"
            gops = GeneralOperators(hm, dofs, dtype=jnp.float32)
            for opname, f in (
                ("mass", gops.mass),
                ("stiffness", lambda a: gops.stiffness(a, 1500.0)),
            ):
                t = two_point_time(lambda i, a: f(a), x0, reps1)
                emit({"section": "p1-affine-ab", "p": 1, "form": form,
                      "affine_engaged": gops._fused_affine is not None,
                      "op": opname, "size": n, "ndofs": dofs.ndofs,
                      "ms_per_apply": round(t * 1e3, 4),
                      "gdof_per_s": round(dofs.ndofs / t / 1e9, 4),
                      "timing": "two-point"})
        os.environ.pop("WAVE_FENICS_TPU_AFFINE", None)
    except Exception as e:  # noqa: BLE001
        emit({"section": "p1-affine-ab", "status": "FAILED",
              "error": f"{type(e).__name__}: {e}"[:300]})
    print("# bisect done", file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()
