"""Smoke tests for the driver bench worker and the planar3d app timers.

Covers the round-5e behaviors: bench.py's two-point timed phase (trips
N and N/4 of one dynamic-trip executable, differenced) and the app's
first-execution warmup step (the ~19 s deferred program load on the
tunneled backend must land in ``warmup_seconds``, never in
``solve_seconds`` — docs/BENCH_NOTES.md round 5e). Tiny CPU cases; the
numbers themselves are hardware records outside pytest.
"""

import importlib.util
import json
import os

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_bench():
    spec = importlib.util.spec_from_file_location(
        "bench_script", os.path.join(_ROOT, "bench.py"))
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)
    return bench


def test_bench_worker_two_point(capsys):
    bench = _load_bench()
    args = bench._parser().parse_args(
        ["--cells", "4", "2", "2", "--degree", "2", "--steps", "8",
         "--solver", "base", "--worker", "timed"])
    bench._worker(args)
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["unit"] == "GDoF*steps/s"
    assert out["value"] > 0
    # two-point: hi window 8, lo window 8//4 = 2
    assert out["timing"] == "two-point (8-2 steps)"


def test_bench_worker_two_point_degenerate(capsys):
    # steps <= 4 collapses to a single-point window (n_lo = 0), no crash
    bench = _load_bench()
    args = bench._parser().parse_args(
        ["--cells", "4", "2", "2", "--degree", "2", "--steps", "2",
         "--solver", "base", "--worker", "timed"])
    bench._worker(args)
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["value"] > 0
    assert out["timing"] == "two-point (2-0 steps)"


def test_app_reports_warmup_and_solve_split():
    from wave_fenics_tpu.apps.planar3d_app import run as app_run
    from wave_fenics_tpu.utils.config import SimulationConfig

    cfg = SimulationConfig()
    cfg.domain.ncells = (8, 2, 2)
    out = app_run(cfg)
    # the AOT-compile/warm-call/solve split must be reported: a lazy
    # in-timer compile or first-execution load would corrupt
    # solve_seconds on the real backend (bench-notes round 4d / 5e)
    assert out["compile_seconds"] is not None
    assert out["warmup_seconds"] is not None and out["warmup_seconds"] >= 0
    assert out["solve_seconds"] > 0
    assert out["nsteps"] > 0 and out["u_norm"] > 0
