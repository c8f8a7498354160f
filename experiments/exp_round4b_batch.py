"""Round-4b TPU batch (ONE client, CLAUDE.md discipline):

1. chain-primitive micro-bench (experiments/exp_chain_microbench.py
   cases) — ranks the remaining general-kernel levers by measurement.
2. RTT-free two-point CG re-records (VERDICT r3 item 3): bp1 p=1..5 at
   the round-2 sizes + general-mesh CG — the old entries carried the
   session RTT in every solve (bp1 p=1: 87.9 ms recorded, ~4.9 ms real).
3. scatter_bench --mode local + tsmm re-records (same artifact).
4. leapfrog general_solve records (the 1-apply/step production
   integrator) at 16^3/32^3, plus the RK4 32^3 control.
5. on-chip leapfrog-vs-RK4 agreement check (f32, small general mesh).

Appends clean entries to BENCH_SUITE.json; full log to
experiments/logs/r4b_batch.json.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_inproc(mod: str, *args: str) -> dict:
    import contextlib
    import importlib
    import io

    m = importlib.import_module(f"wave_fenics_tpu.benchmarks.{mod}")
    old = sys.argv
    sys.argv = [mod] + list(args)
    buf = io.StringIO()
    try:
        with contextlib.redirect_stdout(buf):
            m.main()
        res = json.loads(buf.getvalue().strip().splitlines()[-1])
    except Exception as e:
        res = {"metric": f"{mod} {' '.join(args)}",
               "error": f"{type(e).__name__}: {e}"[:500]}
    finally:
        sys.argv = old
    print(json.dumps(res), flush=True)
    return res


def leapfrog_vs_rk4_check() -> dict:
    """f32 on-chip agreement: leapfrog at dt/2 vs RK4 at dt on a small
    perturbed general mesh after ~160 RK4 steps of physics."""
    import jax.numpy as jnp
    import numpy as np

    from wave_fenics_tpu.benchmarks.general_solve import (min_edge,
                                                          perturbed_box)
    from wave_fenics_tpu.models.general_wave import GeneralLinearWave

    hm, tags = perturbed_box((8, 4, 4), h=0.002, amp_rel=0.05, seed=1)
    md = GeneralLinearWave(mesh=hm, p=4, facet_tags=tags,
                           dtype=jnp.float32)
    dt = 0.5 * min_edge(hm) / (md.c0 * 16)
    n = 160
    u_r, _ = md.solve_n(0.0, dt, n, integrator="rk4")
    u_l, _ = md.solve_n(0.0, dt / 2, 2 * n, integrator="leapfrog")
    scale = float(np.abs(np.asarray(u_r)).max())
    rel = float(np.abs(np.asarray(u_l) - np.asarray(u_r)).max() / scale)
    res = {"metric": "leapfrog vs RK4 agreement (general mesh, f32)",
           "steps_rk4": n, "rel_max_diff": rel, "ok": rel < 0.02}
    print(json.dumps(res), flush=True)
    return res


OPS_SECTIONS = [
    ("cg-bp1-p1-s64", ("cg_bench", "--op", "bp1", "--size", "64",
                       "--degree", "1", "--reps", "16")),
    ("cg-bp1-p2-s64", ("cg_bench", "--op", "bp1", "--size", "64",
                       "--degree", "2", "--reps", "8")),
    ("cg-bp1-p3-s64", ("cg_bench", "--op", "bp1", "--size", "64",
                       "--degree", "3", "--reps", "8")),
    ("cg-bp1-p4-s64", ("cg_bench", "--op", "bp1", "--size", "64",
                       "--degree", "4", "--reps", "8")),
    ("cg-bp1-p5-s64", ("cg_bench", "--op", "bp1", "--size", "64",
                       "--degree", "5", "--reps", "8")),
    ("cg-bp1-p1-s128", ("cg_bench", "--op", "bp1", "--size", "128",
                        "--degree", "1", "--reps", "8")),
    ("cg-general-p4-s16", ("cg_bench", "--op", "general", "--size", "16",
                           "--degree", "4", "--reps", "8", "--precond")),
    ("cg-general-p4-s32", ("cg_bench", "--op", "general", "--size", "32",
                           "--degree", "4", "--reps", "8", "--precond")),
    ("scatter-local", ("scatter_bench", "--mode", "local", "--size",
                       "32", "--degree", "4", "--check")),
    ("tsmm", ("tsmm", "--ncells", "100000", "--degree", "4")),
    ("gsolve-leapfrog-16", ("general_solve", "--size", "16", "--degree",
                            "4", "--steps", "400", "--integrator",
                            "leapfrog")),
    ("gsolve-leapfrog-32", ("general_solve", "--size", "32", "--degree",
                            "4", "--steps", "400", "--integrator",
                            "leapfrog")),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="BENCH_SUITE.json")
    ap.add_argument("--skip", type=int, default=0)
    ap.add_argument("--only", default=None)
    ap.add_argument("--no-append", action="store_true")
    args = ap.parse_args()

    from wave_fenics_tpu.benchmarks.common import apply_platform

    apply_platform(argparse.Namespace(platform="default", ndev=1))
    import jax.numpy as jnp  # canary: fail fast if the tunnel is down

    float(jnp.zeros(()))
    print("# canary ok", file=sys.stderr, flush=True)

    results = []

    def save():
        with open("experiments/logs/r4b_batch.json", "w") as f:
            json.dump(results, f, indent=1)

    if args.skip == 0 and args.only in (None, "microbench"):
        print("== microbench ==", file=sys.stderr, flush=True)
        from experiments.exp_chain_microbench import CASES, measure

        for case in CASES:
            try:
                r = measure(G=512, interpret=False, **case)
            except Exception as e:
                r = {"case": str(case),
                     "error": f"{type(e).__name__}: {e}"[:300]}
            r["section"] = "microbench"
            results.append(r)
            print(json.dumps(r), flush=True)
            save()

    for i, (name, cmd) in enumerate(OPS_SECTIONS, start=1):
        if i < args.skip or (args.only and name != args.only):
            continue
        print(f"== {name} ==", file=sys.stderr, flush=True)
        r = run_inproc(cmd[0], *cmd[1:])
        r["section"] = name
        results.append(r)
        save()

    if args.only in (None, "lfcheck"):
        print("== lfcheck ==", file=sys.stderr, flush=True)
        r = leapfrog_vs_rk4_check()
        r["section"] = "lfcheck"
        results.append(r)
        save()

    if args.out and not args.no_append:
        doc = {"results": []}
        if os.path.exists(args.out):
            with open(args.out) as f:
                doc = json.load(f)
        doc["results"].extend(
            r for r in results
            if "error" not in r
            and r.get("section") not in ("microbench", "lfcheck")
        )
        with open(args.out, "w") as f:
            json.dump(doc, f, indent=1)
        print("appended records", file=sys.stderr)
    save()


if __name__ == "__main__":
    main()
