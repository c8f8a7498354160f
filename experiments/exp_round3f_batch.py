"""Round-3f TPU batch: split-row gauss records + the unblocked 64^3 records.

ONE client (CLAUDE.md discipline), appends to BENCH_SUITE.json:

1. p=5 / p=6 Gauss-rule (non-collocated) fused general mass & stiffness
   with the on-chip f64 --check — the split-row interpolation-q-tile
   path added in round 3e (sizes match the collocated p=5/6 records).
2. 64^3 p=4 fused general mass/stiffness (16.6M dofs) — previously died
   in the remote compiler on the scalar-prefetch SMEM blowup
   ([nbatch, E] minor-dim padding -> 1 MB at nbatch=2048); re-run with
   the E-major layout fix.

Run: python experiments/exp_round3f_batch.py [--skip N] [--only SEC]
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


SECTIONS = [
    ("gauss-p5-mass", ("operators_bench", "--op", "mass",
                       "--size", "16", "--degree", "5", "--reps", "50",
                       "--check")),
    ("gauss-p5-stiff", ("operators_bench", "--op", "stiffness-gauss",
                        "--size", "16", "--degree", "5", "--reps", "50",
                        "--check")),
    ("gauss-p6-mass", ("operators_bench", "--op", "mass",
                       "--size", "12", "--degree", "6", "--reps", "50",
                       "--check")),
    ("gauss-p6-stiff", ("operators_bench", "--op", "stiffness-gauss",
                        "--size", "12", "--degree", "6", "--reps", "50",
                        "--check")),
    ("gen64-mass", ("operators_bench", "--op", "mass-general",
                    "--size", "64", "--degree", "4", "--reps", "50")),
    ("gen64-stiff", ("operators_bench", "--op", "stiffness-general",
                     "--size", "64", "--degree", "4", "--reps", "50")),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="BENCH_SUITE.json")
    ap.add_argument("--skip", type=int, default=0,
                    help="skip the first N sections (resume)")
    ap.add_argument("--only", default=None,
                    help="run only the named section")
    args = ap.parse_args()

    from wave_fenics_tpu.benchmarks.common import apply_platform

    apply_platform(argparse.Namespace(platform="default", ndev=1))
    import jax.numpy as jnp  # canary: fail fast if the tunnel is down

    print(f"# canary: {float(jnp.arange(4.0).sum())}", flush=True)

    results_new = []
    for i, (name, cmd) in enumerate(SECTIONS):
        if i < args.skip or (args.only and name != args.only):
            continue
        print(f"# section {name}", flush=True)
        r = run_inproc(cmd[0], *cmd[1:])
        if "error" not in r:
            results_new.append(r)

    if results_new:
        doc = json.load(open(args.out))
        doc["results"].extend(results_new)
        with open(args.out, "w") as f:
            json.dump(doc, f, indent=1)
    print(json.dumps({"appended": len(results_new)}), flush=True)


if __name__ == "__main__":
    main()
