"""The planar3d HIFU application driver.

Equivalent of demo/cpu_planar3d/main.cpp:14-98, with the production
features the reference lacks: chunked jitted stepping with progress lines,
periodic checkpoint/resume, optional multi-chip execution, and a final
report (steps/period, dofs, solve time — matching the reference's stdout).

Run:
  python -m wave_fenics_tpu.apps.planar3d_app --cells 64 32 32 [--ndev N]
         [--config cfg.json] [--checkpoint-dir ckpt] [--dtype f32]
  python -m wave_fenics_tpu.apps.planar3d_app --mesh m.xdmf \
         [--meshtags tags.xdmf]   # imported-mesh mode (main.cpp:39-45):
         # explicit-dofmap GeneralLinearWave, fused windowed operators
         # on TPU, RCB-sharded when --ndev > 1
"""

from __future__ import annotations

import argparse
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..solvers.rk4 import rk4_solve_n
from ..utils.checkpoint import CheckpointManager
from ..utils.config import SimulationConfig
from ..utils.logging import device_info, get_logger, progress
from ..utils.timing import Timer, sync

log = get_logger("planar3d")


def run(cfg: SimulationConfig) -> dict:
    case = cfg.build_case()
    m = case.model
    dt = case.dt
    nstep = case.nsteps
    integrator = getattr(cfg.time, "integrator", "rk4")
    if integrator == "leapfrog":
        # leapfrog's imaginary-axis stability interval is 2 vs RK4's
        # 2.83; the case's CFL dt targets RK4
        dt *= 0.71
        nstep = int(np.ceil(nstep / 0.71))
        log.info("integrator: leapfrog (1 stiffness apply/step, dt*0.71)")
    tm = Timer()

    log.info("devices:\n%s", device_info())
    log.info("Number of steps per period: %d", case.steps_per_period)
    log.info("dt = %.8e", dt)
    log.info("Number of steps: %d", nstep)
    log.info("Degrees of freedom: %d", m.ops.ndofs)

    from ..models.general_wave import GeneralLinearWave

    is_general = isinstance(m, GeneralLinearWave)
    ndev = cfg.run.ndev
    sharded = ndev > 1
    pm = None
    if sharded and is_general:
        # imported mesh: RCB partition + fused local applies
        from ..parallel.sharded_general import ShardedGeneralWave

        sw = ShardedGeneralWave(m, ndev)
        u, v = sw.zero_state()
    elif sharded:
        from ..parallel.partition import decompose3d
        from ..parallel.sharded_padded import ShardedPaddedWave

        sw = ShardedPaddedWave(m, decompose3d(ndev))
        # pick the state layout for the fastest applicable mode: the
        # value-halo fused STEP kernels (one exchange + one kernel per
        # step) over the per-stage halo-add path
        if integrator == "leapfrog":
            if sw._lf_tables is None:
                raise ValueError(
                    "distributed leapfrog needs the value-halo step "
                    "path (flat layout, x-face tags, >= 2 cells/block "
                    "on axes split >= 3 ways)"
                )
            u, v = sw.zero_state_lf()
        elif sw._step_tables is not None:
            u, v = sw.zero_state_step()
        else:
            u, v = sw.zero_state()
    elif not is_general and (
        jax.default_backend() == "tpu"
        or getattr(cfg.run, "force_padded", False)
    ):
        # single-device structured on TPU: the padded production solvers
        # (the fused STEP kernels when applicable — solve_step_n/
        # solve_lf_n fall back per-config), NOT the reference-semantics
        # base model (which at p=4 is ~8x slower than the step kernel).
        # CPU runs keep the XLA path: interpret-mode Pallas on a
        # production grid takes hours.
        from ..models.linear_wave_padded import PaddedLinearWave

        # tile 48 at p=4 for ALL step kernels: RK4 r5c chip A/B 1.309 vs
        # 1.400 ms/step at 32; leapfrog r5d chip A/B lf 0.8073 vs 0.8242,
        # lf2 0.5593 vs 0.5949 (experiments/logs/r5d_lf48.json)
        tx = 48 if m.p == 4 else 16
        pm = PaddedLinearWave(m, tile_x=tx)
        u, v = pm.zero_state()
    else:
        u, v = m.zero_state()

    cm = (
        CheckpointManager(cfg.run.checkpoint_dir, cfg.run.checkpoint_every_steps)
        if cfg.run.checkpoint_dir
        else None
    )
    t = case.t0
    step0 = 0
    if cm is not None:
        snap = cm.restore()
        if snap is not None:
            step0, u_np, v_np, t, _ = snap
            u = jnp.asarray(u_np, dtype=m.dtype)
            v = jnp.asarray(v_np, dtype=m.dtype)
            if pm is not None and u.shape != pm.layout.padded_shape:
                # checkpoint from a pre-padded-app version (grid layout)
                u, v = pm.from_grid(u), pm.from_grid(v)
            log.info("resumed from step %d (t=%.6e)", step0, t)

    chunk = cfg.run.checkpoint_every_steps if cm else max(nstep, 1)
    chunk = min(chunk, max(nstep - step0, 1))

    compile_s = warmup_s = None
    if sharded:
        if is_general:
            solver_path = f"sharded general ({integrator}, RCB, ndev=%d)" % ndev
            solve_chunk = lambda u, v, t0_, n: sw.solve_n(
                t0_, dt, n, u, v, integrator=integrator)
        elif integrator == "leapfrog":
            solver_path = "sharded value-halo leapfrog STEP kernel"
            solve_chunk = lambda u, v, t0_, n: sw.solve_lf_n(t0_, dt, n,
                                                             u, v)
        elif sw._step_tables is not None:
            solver_path = "sharded value-halo RK4 STEP kernel"
            solve_chunk = lambda u, v, t0_, n: sw.solve_step_n(
                t0_, dt, n, u, v)
        else:
            solver_path = "sharded per-stage halo-add RK4"
            solve_chunk = lambda u, v, t0_, n: sw.solve_n(t0_, dt, n,
                                                          u, v)
    elif is_general:
        # fused-operator tables must be runtime args, not HLO
        # literals (utils/closure.py); one compiled solver per
        # chunk length
        from ..utils.closure import hoisted_jit

        if integrator == "leapfrog":
            from ..solvers.leapfrog import leapfrog_solve_n

            damp = jnp.asarray(m.damping)
            solver_path = "general fused leapfrog (hoisted tables)"
            step_n = lambda uu, vv, tt, n: leapfrog_solve_n(
                m.force, damp, uu, vv, tt, dt, n
            )
        else:
            solver_path = "general fused RK4 (hoisted tables)"
            step_n = lambda uu, vv, tt, n: rk4_solve_n(
                m.f0, m.f1, uu, vv, tt, dt, n
            )
        _solvers: dict = {}

        def solve_chunk(u, v, t0_, n):
            if n not in _solvers:
                _solvers[n] = hoisted_jit(
                    lambda uu, vv, tt: step_n(uu, vv, tt, n),
                    u, v, jnp.asarray(t0_),
                )
            uo, vo = _solvers[n](u, v, jnp.asarray(t0_))
            return uo, vo, None

        # AOT + warmup discipline (same as the single-device branch
        # below): build and warm-call the predictable chunk-length
        # solvers BEFORE the solve timer — a lazy in-timer compile
        # costs ~2 min through the tunnel and the first execution can
        # carry ~19 s of deferred program load (docs/BENCH_NOTES.md
        # rounds 4d and 5e). The chunk schedule is chunk-sized pieces
        # plus one remainder, so both lengths are known up front.
        if nstep > step0:
            tc0 = time.perf_counter()
            lengths = {min(chunk, nstep - step0)}
            rem = (nstep - step0) % chunk
            if rem:
                lengths.add(rem)
            for n in sorted(lengths):
                _solvers[n] = hoisted_jit(
                    lambda uu, vv, tt, _n=n: step_n(uu, vv, tt, _n),
                    u, v, jnp.asarray(t),
                )
            compile_s = time.perf_counter() - tc0
            log.info("compile: %.3f s (AOT trace, excluded from solve "
                     "time)", compile_s)
            tw0 = time.perf_counter()
            for n in sorted(lengths):
                _w = _solvers[n](u, v, jnp.asarray(t))
                sync(*jax.tree.leaves(_w))
            del _w
            warmup_s = time.perf_counter() - tw0
            log.info("warmup: %.3f s (compile + first-execution "
                     "program load, excluded from solve time)", warmup_s)
    else:
        # single-device: every path integrates under a TRACED step count
        # (fori_loop) so one executable serves all chunk lengths, and the
        # compile is AOT'd BEFORE the solve timer (the round-4c app E2E
        # anomaly: per-run recompiles of a static-length scan were read
        # as 55x solver slowdown — compile and execution are now split).
        from ..solvers.leapfrog import leapfrog_solve_dyn
        from ..solvers.rk4 import rk4_solve_dyn

        # candidate solver paths, fastest-first; the AOT compile below
        # tries them in order so a kernel that fails to compile on this
        # backend (e.g. a Mosaic VMEM OOM) degrades to the next proven
        # path instead of killing the run
        candidates: list = []  # (solver_path, body_fn, tail_fn)
        if pm is not None:
            # padded production solvers: fused STEP kernels when the
            # config allows (x-face tags, flat layout), with built-in
            # per-config fallbacks
            if integrator == "leapfrog":
                if pm._lf2_step_fn is not None:
                    # fastest path: TWO steps per kernel call / HBM pass
                    # (0.587 vs 0.81 ms/step measured); odd chunk tails
                    # run one single-step kernel call
                    candidates.append((
                        "temporal-blocked 2-step leapfrog kernel "
                        "(pallas_lf2step)",
                        lambda uu, vv, tt, n: pm.solve_lf2_dyn(
                            tt, dt, n, uu, vv),
                        lambda uu, vv, tt, n: pm.solve_lf_dyn(
                            tt, dt, n, uu, vv),
                    ))
                if pm._lf_step_fn is not None:
                    candidates.append((
                        "fused leapfrog STEP kernel (pallas_lfstep)",
                        lambda uu, vv, tt, n: pm.solve_lf_dyn(
                            tt, dt, n, uu, vv),
                        None,
                    ))
                candidates.append((
                    "padded XLA leapfrog",
                    lambda uu, vv, tt, n: leapfrog_solve_dyn(
                        pm.force, pm.damping, uu, vv, tt, dt, n),
                    None,
                ))
            else:
                if pm._rk42_step_fn is not None and (
                    os.environ.get("WAVE_FENICS_APP_RK42") == "1"
                ):
                    # 2-step temporal-blocked RK4: opt-in, CLOSED as a
                    # production path (r5 chip record: roll_env=6 still
                    # OOMs VMEM 129.46/128 MB after a 1553 s compile —
                    # experiments/logs/r4e_rk42.json — and the r5
                    # roofline shows the pass is compute-bound, which
                    # voids its traffic-saving premise; see
                    # docs/BENCH_NOTES.md round 5). A failed compile
                    # degrades to the proven step kernel via the
                    # candidate chain.
                    candidates.append((
                        "temporal-blocked 2-step RK4 kernel "
                        "(pallas_rk42step)",
                        lambda uu, vv, tt, n: pm.solve_step2_dyn(
                            tt, dt, n, uu, vv),
                        lambda uu, vv, tt, n: pm.solve_step_dyn(
                            tt, dt, n, uu, vv),
                    ))
                if pm._step_fn is not None:
                    candidates.append((
                        "fused RK4 STEP kernel (pallas_rk4step)",
                        lambda uu, vv, tt, n: pm.solve_step_dyn(
                            tt, dt, n, uu, vv),
                        None,
                    ))
                if pm._stage_fn is not None:
                    candidates.append((
                        "fused RK4 stage kernels (pallas_wave)",
                        lambda uu, vv, tt, n: pm.solve_fused_dyn(
                            tt, dt, n, uu, vv),
                        None,
                    ))
                candidates.append((
                    "padded XLA RK4",
                    lambda uu, vv, tt, n: rk4_solve_dyn(
                        pm.f0, pm.f1, uu, vv, tt, dt, n),
                    None,
                ))
        elif integrator == "leapfrog":
            damp = jnp.asarray(m.damping)
            # F is a pure function of (t, u), so per-chunk re-derivation
            # of the carried force is exact — chunking/resume-safe
            candidates.append((
                "base XLA leapfrog",
                lambda uu, vv, tt, n: leapfrog_solve_dyn(
                    m.force, damp, uu, vv, tt, dt, n),
                None,
            ))
        else:
            candidates.append((
                "base XLA RK4",
                lambda uu, vv, tt, n: rk4_solve_dyn(
                    m.f0, m.f1, uu, vv, tt, dt, n),
                None,
            ))

        _targ = lambda x: jnp.asarray(x, dtype=m.dtype)
        tc0 = time.perf_counter()
        compiled = tail_fn = None
        for i, (solver_path, body_fn, tfn) in enumerate(candidates):
            try:
                compiled = (
                    jax.jit(body_fn)
                    .lower(u, v, _targ(t), np.int32(1))
                    .compile()
                )
                tail_fn = tfn
                break
            except Exception as e:
                if i + 1 == len(candidates):
                    raise
                log.warning(
                    "solver path '%s' failed to compile (%s: %.200s); "
                    "falling back", solver_path, type(e).__name__, e)
        # odd chunk lengths route through the tail executable; compile
        # it BEFORE the solve timer too (a lazy in-timer compile costs
        # ~2 min through the tunnel and would corrupt solve_seconds)
        rem = max(nstep - step0, 0) % chunk
        tail_compiled = None
        if tail_fn is not None and (chunk % 2 or rem % 2):
            tail_compiled = (
                jax.jit(tail_fn)
                .lower(u, v, _targ(t), np.int32(1))
                .compile()
            )
        compile_s = time.perf_counter() - tc0
        log.info("compile: %.3f s (AOT, excluded from solve time)",
                 compile_s)

        # Warm-call every compiled executable ONCE before the solve
        # timer (outputs discarded — the solve still starts from the
        # true initial state). On the tunneled backend the FIRST
        # execution of the first Pallas program in a process pays a
        # large deferred program-load cost (r5e probe: 18.70 s vs
        # 0.05 s for the identical second n=1 call,
        # experiments/logs/r5e_app.json); without this, that cost
        # lands inside solve_seconds (measured: 17.66 s for a 2.3 s
        # solve). bench.py's canary has always absorbed it; the app
        # now does the same.
        tw0 = time.perf_counter()
        _w = compiled(u, v, _targ(t), np.int32(2))
        sync(*jax.tree.leaves(_w))
        if tail_compiled is not None:
            _w = tail_compiled(u, v, _targ(t), np.int32(1))
            sync(*jax.tree.leaves(_w))
        del _w
        warmup_s = time.perf_counter() - tw0
        log.info("warmup: %.3f s (first-execution program load, "
                 "excluded from solve time)", warmup_s)

        if tail_fn is None:
            solve_chunk = lambda u, v, t0_, n: (
                *compiled(u, v, _targ(t0_), np.int32(n)), None)
        else:
            _tail: list = [tail_compiled]

            def solve_chunk(u, v, t0_, n):
                n2 = n - (n % 2)
                if n2:
                    u, v = compiled(u, v, _targ(t0_), np.int32(n2))
                if n % 2:
                    if _tail[0] is None:
                        # safety net only — the AOT block above compiles
                        # the tail for every odd-chunk schedule it can
                        # predict
                        _tail[0] = (
                            jax.jit(tail_fn)
                            .lower(u, v, _targ(t0_), np.int32(1))
                            .compile()
                        )
                    u, v = _tail[0](
                        u, v, _targ(t0_ + n2 * dt), np.int32(1))
                return u, v, None
    log.info("solver path: %s", solver_path)

    step = step0
    with tm("solve", u):
        while step < nstep:
            n = min(chunk, nstep - step)
            u, v, _ = solve_chunk(u, v, t, n)
            step += n
            t = t + n * dt
            sync(u)
            progress(step, nstep, t, every=1)
            if cm is not None and step < nstep:
                cm.save(step, np.asarray(u), np.asarray(v), t)

    solve_s = tm._acc["solve"]
    log.info("Solve time: %.3f s", solve_s)
    out_path = getattr(cfg.run, "output_path", None)
    if out_path:
        if sharded:
            log.info("output: skipped for sharded runs (save a "
                     "checkpoint and post-process instead)")
        elif is_general:
            from ..core.io import write_xdmf_unstructured

            write_xdmf_unstructured(
                out_path, m.dofs,
                {"u": np.asarray(u), "v": np.asarray(v)}, time=t,
            )
            log.info("wrote %s", out_path)
        else:
            from ..core.dofmap import StructuredDofGrid
            from ..core.io import write_xdmf_rectilinear

            ug = pm.to_grid(u) if pm is not None else u
            vg = pm.to_grid(v) if pm is not None else v
            dg = StructuredDofGrid(m.mesh, m.p)
            write_xdmf_rectilinear(
                out_path, tuple(dg.axis_coords(d) for d in range(3)),
                {"u": np.asarray(ug), "v": np.asarray(vg)}, time=t,
            )
            log.info("wrote %s", out_path)
    return {
        "ndofs": int(m.ops.ndofs),
        "nsteps": nstep,
        "steps_per_period": case.steps_per_period,
        "solve_seconds": solve_s,
        "gdof_steps_per_s": m.ops.ndofs * (nstep - step0) / solve_s / 1e9,
        "u_norm": float(jnp.linalg.norm(u.astype(jnp.float32))),
        "solver_path": solver_path,
        "compile_seconds": compile_s,
        "warmup_seconds": warmup_s,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", type=str, default=None)
    ap.add_argument("--mesh", type=str, default=None,
                    help="XDMF mesh file (imported-mesh mode — the "
                         "reference's cpu_planar3d workflow)")
    ap.add_argument("--meshtags", type=str, default=None,
                    help="XDMF facet meshtags (tag 1 source, 2 absorbing)")
    ap.add_argument("--cells", type=int, nargs=3, default=None)
    ap.add_argument("--degree", type=int, default=None)
    ap.add_argument("--ndev", type=int, default=None)
    ap.add_argument("--dtype", choices=["f32", "bf16", "f64"], default=None)
    ap.add_argument("--checkpoint-dir", type=str, default=None)
    ap.add_argument("--output", type=str, default=None,
                    help="write final u/v as XDMF (ParaView-readable)")
    ap.add_argument("--platform", choices=["default", "cpu"],
                    default="default",
                    help="cpu: run on the host (virtual devices when "
                         "--ndev > 1), like the benchmark CLIs")
    ap.add_argument("--integrator", choices=["rk4", "leapfrog"],
                    default=None,
                    help="leapfrog: 1 stiffness apply/step (2nd order, "
                         "dt auto-scaled; single-device)")
    ap.add_argument("--force-padded", action="store_true",
                    help="use the padded production solvers even on CPU "
                         "(interpret-mode Pallas — tiny grids only)")
    args = ap.parse_args()
    if args.platform == "cpu":
        from ..benchmarks.common import apply_platform

        apply_platform(
            type("A", (), {"platform": "cpu", "ndev": args.ndev or 1})()
        )

    cfg = (
        SimulationConfig.from_json(open(args.config).read())
        if args.config
        else SimulationConfig()
    )
    if args.mesh:
        cfg.domain.mesh_path = args.mesh
    if args.meshtags:
        cfg.domain.meshtags_path = args.meshtags
    if args.cells:
        cfg.domain.ncells = tuple(args.cells)
    if args.degree:
        cfg.domain.degree = args.degree
    if args.ndev:
        cfg.run.ndev = args.ndev
    if args.dtype:
        cfg.run.dtype = args.dtype
    if args.checkpoint_dir:
        cfg.run.checkpoint_dir = args.checkpoint_dir
    if args.output:
        cfg.run.output_path = args.output
    if args.integrator:
        cfg.time.integrator = args.integrator
    if args.force_padded:
        cfg.run.force_padded = True

    out = run(cfg)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
