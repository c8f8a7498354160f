"""At-scale (64^3 cells, 16.6M dofs) fused general-operator records.

Round 3 verified the 64^3 imported-mesh setup end-to-end host-side
(0 spill, tables cached) but never recorded the on-chip rate; this
batch runs mass-general + stiffness-general at 64^3 in ONE TPU client
(CLAUDE.md discipline) and appends the records to BENCH_SUITE.json.

Run: python experiments/exp_general_64.py [--reps 50] [--size 64]
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="BENCH_SUITE.json")
    ap.add_argument("--size", default="64")
    ap.add_argument("--reps", default="50")
    args = ap.parse_args()

    from wave_fenics_tpu.benchmarks.common import apply_platform

    apply_platform(argparse.Namespace(platform="default", ndev=1))
    import jax.numpy as jnp  # canary: fail fast if the tunnel is down

    print(f"# canary: {float(jnp.arange(4.0).sum())}", flush=True)

    results_new = []
    for op in ("mass-general", "stiffness-general"):
        r = run_inproc("operators_bench", "--op", op, "--size", args.size,
                       "--degree", "4", "--reps", args.reps)
        if "error" not in r:
            results_new.append(r)

    if results_new:
        doc = json.load(open(args.out))
        doc["results"].extend(results_new)
        with open(args.out, "w") as f:
            json.dump(doc, f, indent=1)
    print(json.dumps({"appended": len(results_new)}))


if __name__ == "__main__":
    main()
