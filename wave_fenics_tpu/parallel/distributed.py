"""Multi-process / multi-host initialization helpers.

The reference binds one MPI rank per GPU via node-local communicator splits
(demo/gpu_cg/main.cpp:31-50, common/cuda/utils.hpp:22-38). The TPU-native
equivalent: one Python process per host, ``jax.distributed.initialize``
(reads the TPU pod environment), with GSPMD handling cross-host collectives
over DCN and in-slice ones over ICI — there is no per-chip binding code.
"""

from __future__ import annotations

import jax

__all__ = ["initialize", "global_device_mesh", "process_summary"]


def initialize(**kwargs) -> None:
    """Initialize multi-process JAX (no-op on single process).

    On TPU pods the coordinator address/process count come from the
    environment; kwargs pass through to jax.distributed.initialize.
    """
    try:
        jax.distributed.initialize(**kwargs)
    except (RuntimeError, ValueError):
        # already initialized, or single-process run
        pass


def global_device_mesh(parts: tuple[int, int, int] | None = None):
    """A 3D mesh over ALL devices (all processes).

    With parts=None, factors the global device count near-cubically
    (the decompose3d policy, demo/gpu_cg/mesh.hpp:37-48).
    """
    from .partition import decompose3d, make_device_mesh

    n = len(jax.devices())
    if parts is None:
        parts = decompose3d(n)
    return make_device_mesh(parts)


def process_summary() -> str:
    """Rank/size/devices line (the reference's startup prints)."""
    return (
        f"process {jax.process_index()}/{jax.process_count()}, "
        f"local devices: {len(jax.local_devices())}, "
        f"global devices: {len(jax.devices())}"
    )
