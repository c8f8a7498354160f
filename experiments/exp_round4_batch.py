"""Round-4 TPU batch: full-lane packing records + window-config and MXU
precision A/Bs for the fused general kernel. ONE client (CLAUDE.md
discipline); appends clean entries to BENCH_SUITE.json.

Sections:
1. p=4 stiffness/mass config A/B: H256E4 (round-3 production) vs H128E4
   (fast-path single-tile windows; the numbering study's op-count pick —
   but its +60% batch count also adds fixed per-batch MXU work, so only
   the chip can rank them).
2. p=4 stiffness MXU-precision A/B: HIGHEST (6 bf16 passes) vs HIGH
   (bf16_3x), both f64-checked — the general kernel is VPU/MXU-bound,
   so HIGHEST's extra passes are not free here (unlike the HBM-bound
   structured kernels).
3. Full-lane packing records (VERDICT r3 item 1): p=1/2/3 mass +
   stiffness at 32^3 with --check (targets: p=3 >= 0.6, p=1 >= 0.2
   GDoF/s); p=1 also at 64^3 (the round-3g record size).
4. general_solve at 32^3 (VERDICT item 2 metric) under the winning
   config.

Run: python experiments/exp_round4_batch.py [--skip N] [--only SEC]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_inproc(mod: str, *args: str, env: dict | None = None) -> dict:
    import contextlib
    import importlib
    import io

    saved = {}
    for k, v in (env or {}).items():
        saved[k] = os.environ.get(k)
        os.environ[k] = v
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
        for k, v in saved.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v
    if env:
        res["env"] = dict(env)
    print(json.dumps(res), flush=True)
    return res


OPS = "operators_bench"
SECTIONS = [
    # -- section 1: p=4 window-config A/B ------------------------------
    ("p4-stiff-h256e4", (OPS, "--op", "stiffness-general", "--size", "32",
                         "--degree", "4", "--reps", "50", "--check"),
     {"WAVE_FENICS_GENERAL_HE": "256,4"}),
    ("p4-stiff-h128e4", (OPS, "--op", "stiffness-general", "--size", "32",
                         "--degree", "4", "--reps", "50", "--check"),
     {"WAVE_FENICS_GENERAL_HE": "128,4"}),
    ("p4-mass-h256e4", (OPS, "--op", "mass-general", "--size", "32",
                        "--degree", "4", "--reps", "50", "--check"),
     {"WAVE_FENICS_GENERAL_HE": "256,4"}),
    ("p4-mass-h128e4", (OPS, "--op", "mass-general", "--size", "32",
                        "--degree", "4", "--reps", "50", "--check"),
     {"WAVE_FENICS_GENERAL_HE": "128,4"}),
    # -- section 2: MXU precision A/B (accuracy-gated) -----------------
    ("p4-stiff-mxu-high", (OPS, "--op", "stiffness-general", "--size",
                           "32", "--degree", "4", "--reps", "50",
                           "--check"),
     {"WAVE_FENICS_GENERAL_HE": "256,4", "WAVE_FENICS_TPU_MXU": "high"}),
    # -- section 3: full-lane packing records --------------------------
    ("p3-mass", (OPS, "--op", "mass-general", "--size", "32",
                 "--degree", "3", "--reps", "50", "--check"), None),
    ("p3-stiff", (OPS, "--op", "stiffness-general", "--size", "32",
                  "--degree", "3", "--reps", "50", "--check"), None),
    ("p2-mass", (OPS, "--op", "mass-general", "--size", "32",
                 "--degree", "2", "--reps", "50", "--check"), None),
    ("p2-stiff", (OPS, "--op", "stiffness-general", "--size", "32",
                  "--degree", "2", "--reps", "50", "--check"), None),
    ("p1-mass", (OPS, "--op", "mass-general", "--size", "32",
                 "--degree", "1", "--reps", "100", "--check"), None),
    ("p1-stiff", (OPS, "--op", "stiffness-general", "--size", "32",
                  "--degree", "1", "--reps", "100", "--check"), None),
    ("p1-mass-64", (OPS, "--op", "mass-general", "--size", "64",
                    "--degree", "1", "--reps", "50", "--check"), None),
    ("p1-stiff-64", (OPS, "--op", "stiffness-general", "--size", "64",
                     "--degree", "1", "--reps", "50", "--check"), None),
    # -- section 4: unstructured solve rate ----------------------------
    ("gsolve-h256e4", ("general_solve", "--size", "32", "--degree", "4",
                       "--steps", "400"),
     {"WAVE_FENICS_GENERAL_HE": "256,4"}),
    ("gsolve-h128e4", ("general_solve", "--size", "32", "--degree", "4",
                       "--steps", "400"),
     {"WAVE_FENICS_GENERAL_HE": "128,4"}),
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
    for i, (name, cmd, env) in enumerate(SECTIONS):
        if i < args.skip or (args.only and name != args.only):
            continue
        print(f"== {name} ==", file=sys.stderr, flush=True)
        r = run_inproc(cmd[0], *cmd[1:], env=env)
        r["section"] = name
        results.append(r)

    if args.out and results and not args.no_append:
        doc = {"results": []}
        if os.path.exists(args.out):
            with open(args.out) as f:
                doc = json.load(f)
        doc["results"].extend(
            r for r in results
            if "error" not in r and "mxu" not in r.get("section", "")
            and "h128" not in r.get("section", "")
        )
        with open(args.out, "w") as f:
            json.dump(doc, f, indent=1)
        print("appended records", file=sys.stderr)
    with open("experiments/logs/r4_batch.json", "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
