"""Run the full benchmark suite and write one JSON document.

Covers the reference's complete metric surface (SURVEY.md §6) in one go:
tsmm GFLOPs, operator matvec DOF/s for p in a sweep, CG Dofs*iter/s, local
gather/scatter, and the headline planar3d RK throughput.

Run: python -m wave_fenics_tpu.benchmarks.suite [--out BENCH_SUITE.json]
     [--quick]
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys

_IN_PROCESS = False


def _run_inproc(out_path: str, acc: list, mod: str, *args: str):
    """Run one benchmark entry in THIS process (one TPU client for the
    whole suite — client establishment through the tunnel costs 5-15
    minutes per process, which at ~26 entries dominates everything).
    bench.py entries still go through their own orchestrated worker."""
    import contextlib
    import importlib
    import io

    alist = [a for a in args]
    # strip any platform override; in-process entries inherit the
    # already-initialized client/backend of the suite process
    if "--platform" in alist:
        i = alist.index("--platform")
        del alist[i : i + 2]
    m = importlib.import_module(f"wave_fenics_tpu.benchmarks.{mod}")
    old_argv = sys.argv
    sys.argv = [mod] + alist
    buf = io.StringIO()
    try:
        with contextlib.redirect_stdout(buf):
            m.main()
        res = json.loads(buf.getvalue().strip().splitlines()[-1])
    except Exception as e:  # record failures instead of dying
        res = {"metric": f"{mod} {' '.join(alist)}",
               "error": f"{type(e).__name__}: {e}"[:500]}
    finally:
        sys.argv = old_argv
    acc.append(res)
    with open(out_path, "w") as f:
        json.dump({"results": acc}, f, indent=1)
    print(json.dumps(res), flush=True)
    return res


def _run(out_path: str, acc: list, mod: str, *args: str) -> dict | None:
    # in-process mode: entries share this process's client. bench.py
    # (which orchestrates its own workers) and the virtual-mesh halo
    # entry (needs its own device-count config) stay subprocesses.
    if (_IN_PROCESS and mod != "bench.py"
            and not (mod == "scatter_bench" and "halo" in args)):
        return _run_inproc(out_path, acc, mod, *args)
    if mod == "bench.py":
        # drop the suite's no-override platform sentinel ("--platform
        # default" is not a backend name). bench.py budgets: 900 s warm
        # (client lease) + 900 s canary + timed; with the committed
        # bench_cache the canary+timed are fast, so 2100 s covers the
        # lease-pathology worst case without killing a healthy run.
        alist = list(args)
        if "--platform" in alist:
            i = alist.index("--platform")
            if alist[i + 1 : i + 2] == ["default"]:
                del alist[i : i + 2]
        cmd = [sys.executable, "bench.py", *alist]
        timeout = 2100
    else:
        cmd = [sys.executable, "-m", f"wave_fenics_tpu.benchmarks.{mod}", *args]
        timeout = 900
    try:
        out = subprocess.run(
            cmd, capture_output=True, text=True, timeout=timeout, check=True
        ).stdout.strip().splitlines()
        res = json.loads(out[-1])
    except subprocess.CalledProcessError as e:
        res = {"metric": f"{mod} {' '.join(args)}",
               "error": (e.stderr or "")[-500:]}
    except Exception as e:  # record failures instead of dying
        res = {"metric": f"{mod} {' '.join(args)}", "error": str(e)[:500]}
    acc.append(res)
    # write incrementally so an outer timeout still leaves results behind
    with open(out_path, "w") as f:
        json.dump({"results": acc}, f, indent=1)
    print(json.dumps(res), flush=True)
    return res


def main():
    global _IN_PROCESS
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="BENCH_SUITE.json")
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--degrees", type=int, nargs="*", default=[2, 3, 4, 5, 6])
    ap.add_argument("--platform", choices=["default", "cpu"], default="default")
    ap.add_argument("--in-process", action="store_true",
                    help="run TPU entries inside this process (ONE client "
                         "for the whole suite; each subprocess client "
                         "pays 5-15 min of tunnel lease establishment)")
    args = ap.parse_args()
    if args.in_process:
        _IN_PROCESS = True
        from .common import apply_platform

        apply_platform(args)  # enable the persistent compile cache

    size = "16" if args.quick else "32"
    # reps amortize the ~30 ms tunnel dispatch RTT across the fori_loop:
    # at reps=20 every ms_per_apply figure carries +1.5 ms of RTT
    reps = "10" if args.quick else "200"
    results: list = []
    plat = ("--platform", args.platform)
    run = lambda *a: _run(args.out, results, *a, *plat)

    run("tsmm", "--ncells", "20000" if args.quick else "100000", "--reps", reps)
    # ~constant dof count across degrees (s*p ~ 128 -> ~2.2M dofs), like the
    # reference's fixed-cell-count campaign; at a fixed small size the low
    # degrees are per-apply-overhead-bound instead
    stiff_size = {1: 128, 2: 64, 3: 42, 4: 32, 5: 26, 6: 21}
    for p in args.degrees:
        s = str(stiff_size.get(p, size)) if not args.quick else size
        run("operators_bench", "--op", "stiffness", "--size", s,
            "--degree", str(p), "--reps", reps)
    run("operators_bench", "--op", "spectral", "--size", size,
        "--degree", "4", "--reps", reps, "--check")
    run("operators_bench", "--op", "spectral-roundtrip", "--size", size,
        "--degree", "4", "--reps", reps, "--check")
    run("operators_bench", "--op", "mass-fused", "--size", size,
        "--degree", "4", "--reps", reps, "--check")
    # CEED BP1: fused consistent-mass matvec + CG record, p = 1..5
    # (reference campaign: demo/gpu_cg/submit.sh:4-15, bp1.ufl:20-21)
    cg_size = "16" if args.quick else "64"
    for p in (1, 2, 3, 4, 5):
        # (--check omitted here: the NumPy f64 oracle at 64^3 cells is
        # minutes-slow; correctness is covered by tests/test_operators.py)
        run("operators_bench", "--op", "bp1-mass", "--size", cg_size,
            "--degree", str(p), "--reps", reps)
        run("cg_bench", "--size", cg_size, "--degree", str(p))
    if not args.quick:
        # p=1 at the 64^3 mesh is bound by the platform's fixed ~30-45 us
        # per-grid-step cost (275k dofs over ~7 grid steps); a 128^3 mesh
        # amortizes it the way the reference scales s per degree
        # (demo/gpu_cg/submit.sh:4-15 picks s per job)
        run("operators_bench", "--op", "bp1-mass", "--size", "128",
            "--degree", "1", "--reps", reps)
        run("cg_bench", "--size", "128", "--degree", "1")
    # distributed CG record (8-device virtual mesh): iteration count must
    # match single-device exactly (cg_bench asserts and records parity —
    # demo/gpu_cg/CUDA/cg.hpp:37-121 + submit-multinode.sh analogue);
    # the RATE on a virtual CPU mesh is a correctness record, real
    # multi-chip perf waits on pod hardware
    # f64 + rtol=1e-3 puts the threshold crossing in the stable regime
    # where exact parity is well-posed (docs/BENCH_NOTES.md round 4: CG
    # amplifies summation-order roundoff past the residual plateau; at
    # f32/tight rtol the count legitimately flips by +-1)
    _run(args.out, results, "cg_bench", "--size",
         "16" if args.quick else "32", "--degree", "4", "--ndev", "8",
         "--dtype", "f64", "--rtol", "1e-3", "--platform", "cpu")
    # distributed CG on the EXPLICIT-dofmap partition (the true gpu_cg
    # configuration: neighbor exchange per iteration, cg.hpp:37-121)
    _run(args.out, results, "cg_bench", "--op", "general", "--size",
         "8" if args.quick else "16", "--degree", "4", "--ndev", "8",
         "--dtype", "f64", "--rtol", "1e-8", "--kmax", "80",
         "--platform", "cpu")
    run("scatter_bench", "--mode", "local", "--size", size, "--check")
    # multi-device halo exchange record (ndev=8 virtual CPU mesh here;
    # measures the fixed-shape exchange program the real slice would run
    # over ICI — fwd/rev split like gpu_scatter_mpi/main.cpp:105-160)
    _run(args.out, results, "scatter_bench", "--mode", "halo", "--size",
         "16" if args.quick else "32", "--ndev", "8", "--platform", "cpu")
    # unstructured counterpart: RCB-partition interface assembly, both
    # fixed-shape collectives (all_gather fan-in vs edge-colored
    # neighbor ppermute rounds)
    for exch in ("allgather", "ppermute"):
        _run(args.out, results, "scatter_bench", "--mode", "general-halo",
             "--size", "8" if args.quick else "16", "--degree", "4",
             "--ndev", "8", "--exchange", exch, "--platform", "cpu")
    # explicit-dofmap (unstructured-mesh) operator path at p=4. 'mass' is
    # the non-collocated Gauss B^T diag B pipeline — fused windowed
    # kernel on TPU since round 3 (was the 0.03 GDoF/s XLA-indexed hole)
    gsize = "8" if args.quick else "16"
    run("operators_bench", "--op", "mass", "--size", gsize, "--degree", "4",
        "--reps", reps, "--check")
    run("operators_bench", "--op", "stiffness-gauss", "--size", gsize,
        "--degree", "4", "--reps", reps, "--check")
    # fused windowed kernel (round 3) + pinned XLA indexed baseline
    run("operators_bench", "--op", "stiffness-general", "--size", gsize,
        "--degree", "4", "--reps", reps, "--check")
    run("operators_bench", "--op", "mass-general", "--size", gsize,
        "--degree", "4", "--reps", reps, "--check")
    run("operators_bench", "--op", "stiffness-general-xla", "--size", gsize,
        "--degree", "4", "--reps", "10")
    # CG over the explicit-dofmap consistent mass — the operator the
    # reference's gpu_cg actually benches (MassOperator gather->kernel->
    # scatter, demo/gpu_cg/main.cpp:104-109) as opposed to the separable
    # bp1 records above
    run("cg_bench", "--op", "general", "--size", gsize, "--degree", "4",
        "--precond")
    # p=5 split-row (rpc=2) fused records — beyond the reference, whose
    # unstructured mass caps at p=3 (common/cuda/mass.hpp:80-93)
    if not args.quick:
        run("operators_bench", "--op", "stiffness-general", "--size",
            gsize, "--degree", "5", "--reps", reps, "--check")
        run("operators_bench", "--op", "mass-general", "--size", gsize,
            "--degree", "5", "--reps", reps, "--check")
        # unstructured-mesh RK4 solve rate — the imported-mesh analogue
        # of the reference's flagship solve-time metric
        # (demo/cpu_planar3d/main.cpp:85-93)
        run("general_solve", "--size", "16", "--degree", "4",
            "--steps", "200")
        # leapfrog: the 1-apply/step production integrator
        # (solvers/leapfrog.py; RK4 stays the parity metric)
        run("general_solve", "--size", "16", "--degree", "4",
            "--steps", "200", "--integrator", "leapfrog")
    if not args.quick:
        # at-scale fused general records (multi-extent windows + int8
        # rows + gather-overflow slots). No --check here: the f64
        # oracle is emulated-slow on TPU at >1M dofs; correctness is
        # pinned at 16^3 above and by the fused==indexed f32 check in
        # experiments/exp_general_scale.py (1.9e-7 at 32^3)
        for gs in ("24", "32"):
            run("operators_bench", "--op", "stiffness-general",
                "--size", gs, "--degree", "4", "--reps", reps)
            run("operators_bench", "--op", "mass-general",
                "--size", gs, "--degree", "4", "--reps", reps)
        run("operators_bench", "--op", "mass", "--size", "32",
            "--degree", "4", "--reps", reps)
    if args.platform != "cpu":
        # headline solves (real chip only): validated padded path and the
        # fused-stage candidate
        # 50 steps: at 20 the ~30ms tunnel dispatch RTT costs ~33% of the
        # measured rate (measured: step 0.88 at 20 steps vs 1.58 at 50)
        hc = ("--cells", "32", "16", "16") if args.quick else (
            "--cells", "64", "32", "32")
        run("bench.py", *hc, "--steps", "50", "--solver", "padded")
        run("bench.py", *hc, "--steps", "50", "--solver", "fused")
        run("bench.py", *hc, "--steps", "50", "--solver", "step")

    summary = {"suite": args.out, "n": len(results),
               "errors": sum(1 for r in results if r and "error" in r)}
    # surface the headline's distance to the measured platform streaming
    # ceiling (VERDICT r4 item 7): session variance and perf regressions
    # show up here at a glance
    for r in reversed(results):
        if r and "pct_of_measured_ceiling" in r and "value" in r:
            summary["headline_gdof_steps_per_s"] = r["value"]
            summary["headline_pct_of_measured_ceiling"] = (
                r["pct_of_measured_ceiling"])
            break
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
