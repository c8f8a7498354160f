"""Headline benchmark: planar3d HIFU RK4 throughput on one TPU chip.

Prints ONE JSON line: GDoF*steps/second for the p=4 3D planar wave solve
(the reference's north-star workload, demo/cpu_planar3d — solve-time metric
of demo/cpu_planar3d/main.cpp:85-93). Baseline target from BASELINE.md:
>= 1.0 GDoF*steps/sec/chip at p=4 on TPU v5e, so vs_baseline = value / 1.0.

Structure: the top-level invocation is a pure orchestrator that never
initializes a jax backend. For each candidate solver it launches a
subprocess canary (build model, run ONE step, sync) under a tight timeout —
a Mosaic mis-compile that *hangs* (observed TPU failure mode that raises
nothing) costs minutes, not the full watchdog. The first solver whose
canary passes runs the timed benchmark, again in a subprocess.

Usage: python bench.py [--cells NX NY NZ] [--degree P] [--steps N]
                       [--solver auto|fused|padded|base]
"""

import argparse
import json
import os
import signal
import subprocess
import sys


def _parser():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cells", type=int, nargs=3, default=(64, 32, 32))
    ap.add_argument("--degree", type=int, default=4)
    # 1200: measured GDoF*steps/s converges with window length (RTT and
    # per-dispatch overheads wash out, clocks settle): 1.58 at 50 steps,
    # 2.01 at 100, 2.39 at 300, 2.62 at 600, 2.69 at 1200 — the real app
    # runs ~4000 steps/period, so long windows are the honest steady state
    ap.add_argument("--steps", type=int, default=1200)
    ap.add_argument("--warmup", type=int, default=2)
    ap.add_argument("--solver",
                    choices=["auto", "step", "fused", "padded", "base"],
                    default="auto")
    ap.add_argument("--tile-x", type=int, default=32,
                    help="padded-layout x tile (multiple of 8 and p; larger "
                         "tiles cut the step kernel's halo read "
                         "amplification; 32 measured 6.9%% over 16 at "
                         "steady state, 48 is at the VMEM edge)")
    ap.add_argument("--platform", default=None,
                    help="force a jax platform (e.g. cpu) via config update "
                         "(the env var route hangs in this image)")
    ap.add_argument("--canary-timeout", type=int, default=660,
                    help="seconds for a candidate's canary phase (must "
                         "cover a cold compile PLUS tunnel lease recovery, "
                         "which alone can take ~5-9 minutes)")
    ap.add_argument("--watchdog", type=int, default=1380,
                    help="overall seconds before emitting a failure line "
                         "(0=off)")
    ap.add_argument("--worker", choices=["canary", "timed", "both"],
                    default=None, help=argparse.SUPPRESS)
    return ap


def _fail_line(degree, why):
    print(
        json.dumps(
            {
                "metric": f"planar3d RK4 GDoF*steps/s (p={degree}, 1 chip) "
                f"[FAILED: {why}]",
                "value": 0.0,
                "unit": "GDoF*steps/s",
                "vs_baseline": 0.0,
            }
        ),
        flush=True,
    )


# ---------------------------------------------------------------------------
# Worker side (runs in a subprocess; owns the single TPU client)
# ---------------------------------------------------------------------------

def _build(args, solver):
    import jax
    import jax.numpy as jnp

    from wave_fenics_tpu.models.planar3d import planar3d_case

    case = planar3d_case(
        ncells=tuple(args.cells), domain_length=0.1, degree=args.degree,
        dtype=jnp.float32,
    )
    m = case.model
    dt = case.dt

    if solver in ("step", "fused", "padded"):
        from wave_fenics_tpu.models.linear_wave_padded import PaddedLinearWave

        pm = PaddedLinearWave(m, tile_x=args.tile_x)
        if solver == "fused" and pm._stage_fn is None:
            raise RuntimeError("fused stage kernel unavailable for this case")
        if solver == "step" and pm._step_fn is None:
            raise RuntimeError("fused step kernel unavailable for this case")
        u0, v0 = pm.zero_state()

        def make_run(nsteps):
            if solver == "step":
                @jax.jit
                def run(u, v):
                    u, v, _ = pm.solve_step_n(0.0, dt, nsteps, u, v)
                    return u, v
            elif solver == "fused":
                @jax.jit
                def run(u, v):
                    u, v, _ = pm.solve_fused_n(0.0, dt, nsteps, u, v)
                    return u, v
            else:
                @jax.jit
                def run(u, v):
                    u, v = pm.solve_n(0.0, dt, nsteps, u, v)
                    return u, v
            return run
    else:
        u0, v0 = m.zero_state()

        def make_run(nsteps):
            @jax.jit
            def run(u, v):
                u, v, _ = m.solve(0.0, nsteps * dt, dt, u, v)
                return u, v
            return run

    return m.ops.ndofs, u0, v0, make_run


def _worker(args):
    import jax

    # "default" (the suite's no-override sentinel) must NOT reach
    # jax_platforms: it is not a backend name and kills the worker
    if args.platform and args.platform != "default":
        jax.config.update("jax_platforms", args.platform)
    try:  # persistent compile cache: canary + timed share one compile
        jax.config.update(
            "jax_compilation_cache_dir",
            os.path.expanduser("~/.wave_fenics_jax_cache"),
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    solver = args.solver
    if solver == "auto":  # workers get a concrete solver from the parent,
        solver = "base"   # but keep direct --worker invocations runnable
    backend = jax.default_backend()
    if solver in ("step", "fused", "padded") and backend == "cpu":
        # interpret-mode Pallas on the full grid takes hours, not seconds
        print(f"CANARY_SKIP backend={backend}", flush=True)
        return

    from wave_fenics_tpu.utils.timing import timeit

    ndofs, u0, v0, make_run = _build(args, solver)
    if args.worker in ("canary", "both"):
        run = make_run(1)
        elapsed = timeit(run, u0, v0, reps=1, warmup=1)
        print(f"CANARY_OK backend={backend} step_s={elapsed:.4f}", flush=True)
        if args.worker == "canary":
            return

    run = make_run(args.steps)
    # transfer-based sync: block_until_ready is unreliable on tunneled
    # backends, so timeit forces a device->host element fetch
    elapsed = timeit(run, u0, v0, reps=3, warmup=args.warmup)
    gdof_steps = ndofs * args.steps / elapsed / 1e9
    print(
        json.dumps(
            {
                "metric": f"planar3d RK4 GDoF*steps/s (p={args.degree}, "
                f"{ndofs} dofs, 1 chip, {solver})",
                "value": round(gdof_steps, 4),
                "unit": "GDoF*steps/s",
                "vs_baseline": round(gdof_steps / 1.0, 4),
            }
        ),
        flush=True,
    )


# ---------------------------------------------------------------------------
# Orchestrator side (no jax backend init — the worker owns the TPU client)
# ---------------------------------------------------------------------------

def _run_candidate(args, solver, canary_timeout, timed_timeout):
    """One worker process runs canary THEN timed (mode 'both') — a single
    TPU client for both phases (client setup through the tunnel can take
    minutes, so two processes per measurement doubles the exposure).

    The orchestrator streams the worker's stdout: the CANARY_OK line must
    arrive within ``canary_timeout``; the JSON result then gets a fresh
    ``timed_timeout``. Returns (json_line, None) or (None, reason).
    """
    import select
    import tempfile
    import time

    cmd = [
        sys.executable, os.path.abspath(__file__),
        "--worker", "both", "--solver", solver,
        "--cells", *map(str, args.cells),
        "--degree", str(args.degree), "--steps", str(args.steps),
        "--warmup", str(args.warmup), "--tile-x", str(args.tile_x),
    ]
    if args.platform:
        cmd += ["--platform", args.platform]
    # Own the whole worker process tree. An orphaned worker holds the
    # single TPU client and silently queues every later run behind it
    # (observed: a 0.07s canary taking 9 minutes of pure wait) — so the
    # worker gets its own session, timeout/termination kills the group,
    # and PDEATHSIG reaps the worker even when the orchestrator itself
    # is SIGKILLed (e.g. an outer subprocess timeout). stderr goes to a
    # spool file so a chatty compile can never fill a pipe and deadlock.
    errf = tempfile.TemporaryFile(mode="w+")
    # binary pipe + os.read: non-blocking *text* I/O is unsupported in
    # CPython (a read can raise on a multibyte sequence split at the
    # would-block boundary), so decode manually with errors='replace'
    proc = subprocess.Popen(
        cmd, stdout=subprocess.PIPE, stderr=errf,
        start_new_session=True, preexec_fn=_die_with_parent,
    )
    _ACTIVE_WORKERS.add(proc)
    got_canary = False
    json_line = None
    deadline = time.monotonic() + canary_timeout
    try:
        fd = proc.stdout.fileno()
        os.set_blocking(fd, False)
        buf = ""
        while True:
            if time.monotonic() > deadline:
                _kill_group(proc)
                proc.wait()
                return None, (
                    "canary timeout" if not got_canary else "timed timeout"
                )
            r, _, _ = select.select([proc.stdout], [], [], 1.0)
            chunk = None
            if r:
                raw = os.read(fd, 65536)
                chunk = raw.decode("utf-8", errors="replace") if raw else None
            if chunk:
                buf += chunk
                while "\n" in buf:
                    line, buf = buf.split("\n", 1)
                    if "CANARY_OK" in line and not got_canary:
                        got_canary = True
                        print(f"# canary ok: {solver}",
                              file=sys.stderr, flush=True)
                        deadline = time.monotonic() + timed_timeout
                    elif line.startswith("{"):
                        json_line = line
            elif proc.poll() is not None:
                break
        if json_line is not None and proc.returncode == 0:
            return json_line, None
        errf.seek(0)
        tail = errf.read().strip().splitlines()[-1:]
        return None, (tail or [f"worker exit {proc.returncode}, no result"])
    finally:
        _ACTIVE_WORKERS.discard(proc)
        errf.close()


_ACTIVE_WORKERS: set = set()


def _die_with_parent():
    """In the worker: ask Linux to SIGKILL us if the orchestrator dies."""
    try:
        import ctypes

        PR_SET_PDEATHSIG = 1
        ctypes.CDLL("libc.so.6").prctl(PR_SET_PDEATHSIG, signal.SIGKILL)
    except Exception:
        pass


def _kill_group(proc):
    try:
        os.killpg(proc.pid, signal.SIGKILL)
    except (ProcessLookupError, PermissionError):
        pass


def _reap_and_exit(signum, frame):
    for proc in list(_ACTIVE_WORKERS):
        _kill_group(proc)
    os._exit(128 + signum)


def main():
    args = _parser().parse_args()
    if args.worker:
        _worker(args)
        return

    # if the orchestrator itself is killed (driver watchdog, outer
    # `timeout`), take the worker process group down with us
    signal.signal(signal.SIGTERM, _reap_and_exit)
    signal.signal(signal.SIGINT, _reap_and_exit)

    if args.watchdog:
        def _fire(signum, frame):
            _fail_line(args.degree, "watchdog expired")
            for proc in list(_ACTIVE_WORKERS):
                _kill_group(proc)
            os._exit(0)

        signal.signal(signal.SIGALRM, _fire)
        signal.alarm(args.watchdog)

    # auto order: fastest hardware-validated solver first (step 1.62,
    # fused 1.42, padded 1.09 GDoF*steps/s on v5e). A canary that *hangs*
    # gets its subprocess killed mid-dispatch, which can wedge the chip
    # lease for a long time on this backend — so an unvalidated kernel
    # must never run before a known-good one.
    candidates = (
        ["step", "fused", "padded", "base"] if args.solver == "auto"
        else [args.solver]
    )

    timed_timeout = max(args.canary_timeout * 2, 600)
    for solver in candidates:
        out, err = _run_candidate(
            args, solver, args.canary_timeout, timed_timeout
        )
        if out is not None:
            signal.alarm(0)
            print(out, flush=True)
            return
        print(f"# candidate {solver} failed: {err}",
              file=sys.stderr, flush=True)
    _fail_line(args.degree, "no solver produced a result "
                            "(device unresponsive or kernels broken)")


if __name__ == "__main__":
    main()
