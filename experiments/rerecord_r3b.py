"""Re-record the BENCH_SUITE entries lost to the round-3 tunnel-relay
outage, plus the new fused Gauss-mass records, then merge into
BENCH_SUITE.json in place.

What gets (re)measured (cf. the honest failure notes committed with
c26084a — the relay died mid-record):

1. gauss mass 16^3 --check  -> replaces the "mass matvec" 0.029 entry
   (that number was the XLA-indexed record; the op now dispatches to
   the fused windowed kernel's mass_gauss mode on TPU)
2. gauss mass 32^3          -> appended (at-scale record)
3. affine mass-general 32^3 -> replaces the errored operators_bench
   line (windowed program died in the remote compiler 3x; --resident
   escape hatch retried automatically)
4. bench.py x3 (padded/fused/step, 50 steps) -> replace the three
   FAILED planar3d headline entries

TPU-client discipline (CLAUDE.md): phase 1-3 share THIS process's
single client; phase 4 runs bench.py subprocesses one at a time, each
orchestrating its own single worker, only after phase 1-3's client work
is done. No other TPU job may run concurrently.

Run: python experiments/rerecord_r3b.py [--skip-ops] [--skip-bench]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPS = "200"


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


def run_bench(solver: str) -> dict | None:
    # default 1200-step windows: the measured rate converges with window
    # length (1.58 at 50 steps vs ~2.94 at 1200 for the step solver) and
    # device time is trivial next to client establishment, so short
    # windows would just record a dishonest low number.
    cmd = [sys.executable, "bench.py", "--cells", "64", "32", "32",
           "--solver", solver]
    try:
        out = subprocess.run(cmd, capture_output=True, text=True,
                             timeout=3000, check=True)
        res = json.loads(out.stdout.strip().splitlines()[-1])
    except Exception as e:
        print(f"# bench.py --solver {solver} failed: {e}", flush=True)
        return None
    print(json.dumps(res), flush=True)
    return res


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="BENCH_SUITE.json")
    ap.add_argument("--skip-ops", action="store_true")
    ap.add_argument("--skip-bench", action="store_true")
    args = ap.parse_args()

    doc = json.load(open(args.out))
    results: list = doc["results"]

    if not args.skip_ops:
        # persistent compile cache on, default (TPU) platform
        from wave_fenics_tpu.benchmarks.common import apply_platform

        apply_platform(argparse.Namespace(platform="default", ndev=1))

        import jax.numpy as jnp  # canary: fail fast if the tunnel is down

        print(f"# canary: {float(jnp.arange(4.0).sum())}", flush=True)

        m16 = run_inproc("operators_bench", "--op", "mass", "--size", "16",
                         "--degree", "4", "--reps", REPS, "--check")
        sg16 = run_inproc("operators_bench", "--op", "stiffness-gauss",
                          "--size", "16", "--degree", "4", "--reps", REPS,
                          "--check")
        m32 = run_inproc("operators_bench", "--op", "mass", "--size", "32",
                         "--degree", "4", "--reps", REPS)
        # p=5/6 split-row (rpc=2/3) fused records (new this session)
        sg5 = run_inproc("operators_bench", "--op", "stiffness-general",
                         "--size", "16", "--degree", "5", "--reps", REPS,
                         "--check")
        mg5 = run_inproc("operators_bench", "--op", "mass-general",
                         "--size", "16", "--degree", "5", "--reps", REPS,
                         "--check")
        sg6 = run_inproc("operators_bench", "--op", "stiffness-general",
                         "--size", "12", "--degree", "6", "--reps", REPS,
                         "--check")
        mg6 = run_inproc("operators_bench", "--op", "mass-general",
                         "--size", "12", "--degree", "6", "--reps", REPS,
                         "--check")
        # unstructured RK4 solve rate (imported-mesh flagship analogue)
        gsv = run_inproc("general_solve", "--size", "16", "--degree",
                         "4", "--steps", "200")
        mg32 = run_inproc("operators_bench", "--op", "mass-general",
                          "--size", "32", "--degree", "4", "--reps", REPS)
        if "error" in mg32:
            print("# mass-general windowed rejected; retrying --resident",
                  flush=True)
            mg32 = run_inproc("operators_bench", "--op", "mass-general",
                              "--size", "32", "--degree", "4", "--reps",
                              REPS, "--resident")

        if "error" not in m16:
            idx = [i for i, r in enumerate(results)
                   if r.get("metric") == "mass matvec"]
            if idx:
                results[idx[0]] = m16
            else:
                results.append(m16)
        if "error" not in sg16:
            results.append(sg16)
        if "error" not in m32:
            results.append(m32)
        for r5 in (sg5, mg5, sg6, mg6, gsv):
            if "error" not in r5:
                results.append(r5)
        if "error" not in mg32:
            idx = [i for i, r in enumerate(results)
                   if r.get("metric", "").startswith(
                       "operators_bench --op mass-general --size 32")]
            if idx:
                results[idx[0]] = mg32
            else:
                results.append(mg32)
        with open(args.out, "w") as f:
            json.dump({"results": results}, f, indent=1)

    if not args.skip_bench:
        failed_idx = [i for i, r in enumerate(results)
                      if "FAILED" in r.get("metric", "")]
        for solver in ("padded", "fused", "step"):
            res = run_bench(solver)
            if res is None:
                continue
            if failed_idx:
                results[failed_idx.pop(0)] = res
            else:
                results.append(res)
            with open(args.out, "w") as f:
                json.dump({"results": results}, f, indent=1)

    nerr = sum(1 for r in results if "error" in r or "FAILED" in
               r.get("metric", ""))
    print(json.dumps({"suite": args.out, "n": len(results),
                      "errors_or_failed": nerr}))


if __name__ == "__main__":
    main()
