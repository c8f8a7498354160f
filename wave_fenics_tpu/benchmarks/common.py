"""Shared benchmark harness: CLI flags + result table.

Replaces the reference's per-demo boost::program_options parsing and result
table printer (``read_inputs`` / ``output_table``, demo/gpu_cg/utils.hpp:12-87)
with one argparse/JSON helper. Flag names are kept compatible where the
reference had them (--size/--degree/--s/--p/--check).
"""

from __future__ import annotations

import argparse
import json


def make_parser(**defaults) -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=defaults.get("size", 32),
                    help="cells per axis of the unit box")
    ap.add_argument("--degree", "--p", type=int, dest="degree",
                    default=defaults.get("degree", 4))
    ap.add_argument("--s", type=int, default=defaults.get("s", None),
                    help="total cells = 2^s (overrides --size; gpu_cg style)")
    ap.add_argument("--reps", type=int, default=defaults.get("reps", 100))
    ap.add_argument("--check", action="store_true",
                    help="verify against the f64 oracle path")
    ap.add_argument("--dtype", choices=["f32", "bf16", "f64"], default="f32")
    ap.add_argument("--platform", choices=["default", "cpu"], default="default",
                    help="force a jax platform (config-based; the "
                         "JAX_PLATFORMS env var hangs under this image's "
                         "preloaded-jax sitecustomize)")
    return ap


def apply_platform(args) -> None:
    """Apply --platform before the first jax operation, and enable the
    persistent compilation cache (each benchmark entry runs in a fresh
    subprocess; without the cache every entry pays the full 20-60s tunnel
    compile on every suite run)."""
    import os

    import jax

    if getattr(args, "platform", "default") == "cpu":
        jax.config.update("jax_platforms", "cpu")
        ndev = int(getattr(args, "ndev", 1) or 1)
        if ndev > 1:  # virtual device mesh for sharded benchmarks
            jax.config.update("jax_num_cpu_devices", ndev)
    cache = os.environ.get(
        "WAVE_FENICS_TPU_CACHE", os.path.expanduser("~/.wave_fenics_jax_cache")
    )
    if cache != "0":
        try:
            jax.config.update("jax_compilation_cache_dir", cache)
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        except Exception:
            pass


def resolve_dtype(name: str):
    import jax
    import jax.numpy as jnp

    if name == "f64" and not jax.config.read("jax_enable_x64"):
        # without x64, jnp silently downcasts f64 VALUES to f32 while
        # Pallas scratch refs keep true f64 — a guaranteed kernel dtype
        # mismatch. f64 requested means x64 semantics.
        jax.config.update("jax_enable_x64", True)
    return {"f32": jnp.float32, "bf16": jnp.bfloat16, "f64": jnp.float64}[name]


def cells_from_args(args) -> tuple[int, int, int]:
    """E = 2^s cells decomposed near-cubically (mesh.hpp:37-48 analogue),
    or size^3."""
    if args.s is not None:
        from ..parallel.partition import decompose3d

        return decompose3d(2**args.s)
    return (args.size, args.size, args.size)


def compile_with_retry(fn, *args, tries: int = 3):
    """Run ``fn(*args)`` once (forcing compilation), retrying on the
    tunnel's flaky remote_compile HTTP 500s (docs/BENCH_NOTES.md round 3:
    kernels that compile fine moments later intermittently get
    'tpu_compile_helper subprocess exit code 1')."""
    import sys

    import jax

    for t in range(tries):
        try:
            return jax.block_until_ready(fn(*args))
        except Exception as e:  # noqa: BLE001 — backend-specific classes
            msg = str(e)
            if ("remote_compile" not in msg and "compile_helper" not in msg
                    ) or t == tries - 1:
                raise
            print(f"# remote_compile flake, retry {t + 1}",
                  file=sys.stderr, flush=True)


def two_point_time(body, x0, reps: int, *, timeit_reps: int = 3,
                   warmup: int = 1) -> float:
    """RTT-free seconds per application of ``body`` (a carry -> carry
    map): builds ONE dynamic-trip-count executable
    ``fori_loop(0, n, body, x0)``, times it at ``reps`` and ``reps//4``
    trips, and divides the difference by the trip-count difference —
    the per-measurement fixed cost (tunnel RTT + dispatch + the sync
    transfer) cancels exactly, and one executable means the canary and
    the timed window share a compilation (docs/BENCH_NOTES.md round 3g:
    at reps=50 the old single-point loops inflated every ms_per_apply
    by RTT/reps, up to 2.7x at low degree).

    ``body`` takes (i, carry) like a fori_loop body and must CHAIN the
    carry (a loop-invariant body would be hoisted by XLA)."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    from ..utils.closure import hoisted_jit
    from ..utils.timing import timeit

    run = hoisted_jit(
        lambda x, n: lax.fori_loop(0, n, body, x),
        x0, jnp.asarray(reps, jnp.int32),
    )
    compile_with_retry(run, x0, jnp.asarray(reps, jnp.int32))
    if reps >= 8:
        r_lo = reps // 4
        t_hi = timeit(run, x0, jnp.asarray(reps, jnp.int32),
                      reps=timeit_reps, warmup=warmup)
        t_lo = timeit(run, x0, jnp.asarray(r_lo, jnp.int32),
                      reps=timeit_reps, warmup=warmup)
        return max(t_hi - t_lo, 1e-9) / (reps - r_lo)
    return timeit(run, x0, jnp.asarray(reps, jnp.int32),
                  reps=timeit_reps, warmup=warmup) / reps


# Measured platform streaming ceiling (GB/s): the minimal double-buffered
# Pallas slab-streaming copy of the padded production state (off0=0,
# tile 32 — the step kernel's DMA skeleton minus all compute, bytes
# actually moved / time), two-point timed on the real chip round 5
# (experiments/logs/r5_batch.json 'roofline-pallas-stream'; the
# halo-amplified off0=3p variant reads 406.8 — docs/BENCH_NOTES.md
# round 5). Session-to-session variance on this tunnel is a few
# percent, so the pct fields are indicative, not exact.
MEASURED_STREAM_CEILING_GBPS: float | None = 314.1


def streaming_fields(nbytes_per_apply: float, t_seconds: float) -> dict:
    """effective_gbps (+ pct of the measured platform ceiling when it is
    recorded) for a streaming record — nbytes is the NOMINAL state
    traffic model of the op (a lower bound on real traffic), so pct is a
    lower bound on how close the kernel runs to the platform wall."""
    gbps = nbytes_per_apply / t_seconds / 1e9
    out = {"effective_gbps": round(gbps, 1)}
    if MEASURED_STREAM_CEILING_GBPS:
        out["pct_of_measured_ceiling"] = round(
            100.0 * gbps / MEASURED_STREAM_CEILING_GBPS, 1
        )
    return out


def report(**kv) -> None:
    """One JSON line, reference-table fields included
    (utils.hpp:48-87 analogue)."""
    print(json.dumps(kv))
