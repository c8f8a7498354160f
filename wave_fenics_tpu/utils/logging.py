"""Structured logging: the loguru/LOG(INFO) analogue (SURVEY.md §5).

The reference names per-rank threads ("MPI: <rank>") and prints rank-0
progress lines every 50 steps (LinearGLL.hpp:272-278). Here:

- process-wise logger tagged with the jax process index
- ``progress`` helper matching the reference's step-counter cadence
- device info dump (the output_device_info analogue,
  common/cuda/utils.hpp:40-56)
"""

from __future__ import annotations

import logging
import sys

import jax

__all__ = ["get_logger", "progress", "device_info"]

_FMT = "[%(asctime)s %(name)s p%(process_idx)s] %(levelname)s %(message)s"


class _ProcFilter(logging.Filter):
    def filter(self, record):
        try:
            record.process_idx = jax.process_index()
        except Exception:
            record.process_idx = 0
        return True


def get_logger(name: str = "wave_fenics_tpu") -> logging.Logger:
    log = logging.getLogger(name)
    if not log.handlers:
        h = logging.StreamHandler(sys.stderr)
        h.setFormatter(logging.Formatter(_FMT, datefmt="%H:%M:%S"))
        h.addFilter(_ProcFilter())
        log.addHandler(h)
        log.setLevel(logging.INFO)
    return log


def progress(step: int, nstep: int, t: float, every: int = 50) -> None:
    """Rank-0 progress line every ``every`` steps (LinearGLL.hpp:272-278)."""
    if step % every == 0 and jax.process_index() == 0:
        get_logger().info("t: %.6e,\t Steps: %d/%d", t, step, nstep)


def device_info() -> str:
    """One-line-per-device summary (output_device_info analogue)."""
    lines = []
    for d in jax.devices():
        stats = {}
        try:
            stats = d.memory_stats() or {}
        except Exception:
            pass
        mem = stats.get("bytes_limit", 0) / 2**30
        lines.append(
            f"{d.id}: {d.device_kind} platform={d.platform} "
            f"process={d.process_index} mem={mem:.1f}GiB"
        )
    return "\n".join(lines)
