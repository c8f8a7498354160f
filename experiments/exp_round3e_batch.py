"""Round-3e TPU batch: at-scale + degree-sweep general records, CG-general.

ONE client (CLAUDE.md discipline), appends to BENCH_SUITE.json:

1. 64^3 p=4 fused general mass/stiffness (16.6M dofs) — the staged
   at-scale record exp_general_64 never got to run on chip.
2. p=2 / p=3 fused general records at 32^3 (completes the unstructured
   degree sweep 2..6; p=2 carries the on-chip f64 --check).
3. cg_bench --op general: CG over the explicit-dofmap Gauss mass — the
   operator the reference's gpu_cg actually benches
   (demo/gpu_cg/main.cpp:104-109).
4. general_solve at 32^3 (at-scale unstructured RK4 solve rate).

Run: python experiments/exp_round3e_batch.py [--skip N] [--only SEC]
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
    ("gen64-mass", ("operators_bench", "--op", "mass-general",
                    "--size", "64", "--degree", "4", "--reps", "50")),
    ("gen64-stiff", ("operators_bench", "--op", "stiffness-general",
                     "--size", "64", "--degree", "4", "--reps", "50")),
    ("gen32-p2-mass", ("operators_bench", "--op", "mass-general",
                       "--size", "32", "--degree", "2", "--reps", "200",
                       "--check")),
    ("gen32-p2-stiff", ("operators_bench", "--op", "stiffness-general",
                        "--size", "32", "--degree", "2", "--reps", "200",
                        "--check")),
    ("gen32-p3-mass", ("operators_bench", "--op", "mass-general",
                       "--size", "32", "--degree", "3", "--reps", "100")),
    ("gen32-p3-stiff", ("operators_bench", "--op", "stiffness-general",
                        "--size", "32", "--degree", "3", "--reps", "100")),
    ("cg-general-16", ("cg_bench", "--op", "general", "--size", "16",
                       "--degree", "4", "--precond")),
    ("cg-general-32", ("cg_bench", "--op", "general", "--size", "32",
                       "--degree", "4", "--precond")),
    ("gensolve-32", ("general_solve", "--size", "32", "--degree", "4",
                     "--steps", "200")),
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
