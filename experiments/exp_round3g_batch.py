"""Round-3g TPU batch: rank-1 affine geometry for packed rows (cpr > 1).

The affine geo form previously required cpr == 1, so p=1/p=2 collocated
general operators streamed full per-node factors (p=2 stiffness: 162
floats/cell of geo DMA; now 6). ONE client (CLAUDE.md discipline),
appends to BENCH_SUITE.json:

1. p=2 (cpr=4) general mass & stiffness at 65^3 dofs — re-record over
   the round-3d per-node-geo entries (mass 0.6426 / stiff 0.5455).
2. p=1 (cpr=15) general mass & stiffness at 65^3 dofs — first records.
3. p=3 (cpr=1) sanity re-record — affine was already active there; the
   packed-layout change must not move it.

All with the on-chip f64 --check.

Run: python experiments/exp_round3g_batch.py [--skip N] [--only SEC]
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
    ("p2-mass", ("operators_bench", "--op", "mass-general",
                 "--size", "32", "--degree", "2", "--reps", "50",
                 "--check")),
    ("p2-stiff", ("operators_bench", "--op", "stiffness-general",
                  "--size", "32", "--degree", "2", "--reps", "50",
                  "--check")),
    ("p1-mass", ("operators_bench", "--op", "mass-general",
                 "--size", "64", "--degree", "1", "--reps", "50",
                 "--check")),
    ("p1-stiff", ("operators_bench", "--op", "stiffness-general",
                  "--size", "64", "--degree", "1", "--reps", "50",
                  "--check")),
    ("p3-mass", ("operators_bench", "--op", "mass-general",
                 "--size", "32", "--degree", "3", "--reps", "50",
                 "--check")),
    ("p3-stiff", ("operators_bench", "--op", "stiffness-general",
                  "--size", "32", "--degree", "3", "--reps", "50",
                  "--check")),
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

    float(jnp.zeros(()))
    results = []
    for i, (name, cmd) in enumerate(SECTIONS):
        if i < args.skip or (args.only and name != args.only):
            continue
        print(f"== {name} ==", file=sys.stderr, flush=True)
        results.append(run_inproc(cmd[0], *cmd[1:]))

    if args.out and results:
        doc = {"results": []}
        if os.path.exists(args.out):
            with open(args.out) as f:
                doc = json.load(f)
        doc["results"].extend(r for r in results if "error" not in r)
        with open(args.out, "w") as f:
            json.dump(doc, f, indent=1)
        print(f"appended {len(results)} entries to {args.out}",
              file=sys.stderr)


if __name__ == "__main__":
    main()
