"""Timing/synchronization utilities.

The dolfinx ``common::Timer`` / ``MPI_Wtime`` analogue (SURVEY.md §5), with
one TPU-specific twist: on remote/experimental PJRT backends (axon tunnel)
``jax.block_until_ready`` can return before execution finishes, so honest
wall-clock timing must force a device->host transfer. ``sync`` does that.
"""

from __future__ import annotations

import time
from collections import defaultdict
from contextlib import contextmanager

import jax
import numpy as np

__all__ = ["sync", "Timer", "timeit"]


def sync(*arrays) -> None:
    """Barrier that provably waits for device work: transfers one element of
    each array to the host (block_until_ready is unreliable on tunneled
    backends)."""
    for a in arrays:
        if isinstance(a, jax.Array):
            np.asarray(jax.device_get(a.ravel()[:1]))


class Timer:
    """Named accumulating timers with a printable table
    (dolfinx ``list_timings`` analogue)."""

    def __init__(self):
        self._acc: dict[str, float] = defaultdict(float)
        self._n: dict[str, int] = defaultdict(int)

    @contextmanager
    def __call__(self, name: str, *sync_arrays):
        t0 = time.perf_counter()
        yield
        sync(*sync_arrays)
        self._acc[name] += time.perf_counter() - t0
        self._n[name] += 1

    def table(self) -> str:
        lines = [f"{'timer':<40} {'calls':>6} {'total s':>10} {'mean ms':>10}"]
        for k in sorted(self._acc):
            n, tot = self._n[k], self._acc[k]
            lines.append(f"{k:<40} {n:>6} {tot:>10.4f} {tot / n * 1e3:>10.3f}")
        return "\n".join(lines)


def timeit(fn, *args, reps: int = 5, warmup: int = 2) -> float:
    """Median wall-clock seconds of ``fn(*args)`` with transfer-based sync."""
    for _ in range(warmup):
        out = fn(*args)
        sync(*jax.tree.leaves(out))
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        sync(*jax.tree.leaves(out))
        times.append(time.perf_counter() - t0)
    return float(np.median(times))
