"""Round-5f: lean step kernel at tile 96 (the cost model's last tile).

The r5e roll-row cost model (docs/BENCH_NOTES.md) says stencil work per
step is n_interior_tiles x (4*Tx + 8p) rows: t48 = 6x224 = 1344 rows,
t64 = 5x288 = 1440 (WORSE — interior row padding grows 288->320),
t96 = 3x416 = 1248 (-7.1% vs t48, interior rows back to 288). t96 is
the only tile above 48 the model favors; it has only ever been blocked
by the remote-compile-helper HTTP 500 flake (r5b/r5c, non-deterministic
infra), never refuted. VMEM estimate at t96 is ~112 MB of the 128 MB
budget — a Mosaic OOM is a legitimate outcome and gets recorded.

Sections (one client, production case (64,32,32) p=4 f32, two-point):
  - ab:    lean t48 (same-session baseline) / lean t64 / lean t96
  - agree: 40 driven solve_step_n steps, t96 grid vs t48 grid

Run:  python experiments/exp_round5f_t96.py [--smoke]
Log:  experiments/logs/r5f_t96.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LOG = "experiments/logs/r5f_t96.json"
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
    from wave_fenics_tpu.models.linear_wave_padded import PaddedLinearWave
    from wave_fenics_tpu.models.planar3d import planar3d_case

    x = jnp.full((256, 256), 1.0 / 256.0)
    print(f"# warm ok backend={jax.default_backend()} "
          f"val={float((x @ x).sum()):.3f}", file=sys.stderr, flush=True)

    cells = (16, 4, 4) if args.smoke else (64, 32, 32)
    reps = 8 if args.smoke else 600
    tiles = (16, 24) if args.smoke else (48, 64, 96)
    case = planar3d_case(ncells=cells, domain_length=0.1, degree=4,
                         dtype=jnp.float32)
    m, dt = case.model, float(case.dt)
    nd = m.ops.ndofs

    pms: dict = {}

    def pm_for(tx):
        if tx not in pms:
            pms[tx] = PaddedLinearWave(m, tile_x=tx)
        return pms[tx]

    def time_step(tx):
        t0 = time.perf_counter()
        try:
            pm = pm_for(tx)
            if pm._step_fn is None:
                emit({"section": "ab", "tile_x": tx,
                      "error": "step kernel unavailable at this tile"})
                return

            def body(i, carry):
                u, v = carry
                return pm._step_fn(u, v, dt, 1.0, 0.7, 0.4, 0.1)

            t = two_point_time(body, pm.zero_state(), reps)
            emit({"section": "ab", "tile_x": tx, "lean": True,
                  "ms_per_step": round(t * 1e3, 4),
                  "gdof_steps_per_s": round(nd / t / 1e9, 4),
                  "padded_Lx": pm.layout.padded_shape[0],
                  "timing": "two-point",
                  "build_s": round(time.perf_counter() - t0, 1)})
        except Exception as e:  # noqa: BLE001
            emit({"section": "ab", "tile_x": tx,
                  "error": f"{type(e).__name__}: {e}"[:400],
                  "build_s": round(time.perf_counter() - t0, 1)})

    for tx in tiles:
        time_step(tx)

    # cross-tile agreement on the driven solve (largest tile that timed
    # vs the smallest)
    try:
        t0 = time.perf_counter()
        ok_tiles = [r["tile_x"] for r in RESULTS
                    if r["section"] == "ab" and "ms_per_step" in r]
        ta, tb = ok_tiles[0], ok_tiles[-1]
        if ta == tb:
            raise RuntimeError("fewer than two tiles timed")
        pa, pb = pm_for(ta), pm_for(tb)
        ua, va, _ = pa.solve_step_n(0.0, dt, 40)
        ub, vb, _ = pb.solve_step_n(0.0, dt, 40)
        ga, gva = pa.to_grid(ua), pa.to_grid(va)
        gb, gvb = pb.to_grid(ub), pb.to_grid(vb)
        s = float(jnp.maximum(jnp.max(jnp.abs(gva)), 1e-30))
        du = float(jnp.max(jnp.abs(ga - gb))) / s
        dv = float(jnp.max(jnp.abs(gva - gvb))) / s
        emit({"section": "agree", "tiles": [ta, tb], "steps": 40,
              "rel_du": du, "rel_dv": dv, "ok": bool(max(du, dv) < 5e-6),
              "build_s": round(time.perf_counter() - t0, 1)})
    except Exception as e:  # noqa: BLE001
        emit({"section": "agree",
              "error": f"{type(e).__name__}: {e}"[:400]})
    print("# t96 batch done", file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()
