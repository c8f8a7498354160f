"""Fused consistent-mass (CEED BP1) kernel: one HBM pass per matvec.

The BP1 operator (reference forms demo/gpu_cg/bp1.ufl:20-21; CUDA kernel
semantics common/cuda/mass_kernel.cu:4-46) is the consistent mass matrix
with Gauss quadrature of degree p+2. On a uniform axis-aligned box it is an
EXACT Kronecker product of three assembled 1D mass matrices,

    M = Mx (x) My (x) Mz,    M_d = overlap-add of  h_d * B^T diag(w_q) B,

so the matvec is three sequential banded 1D contractions — and because the
Kronecker factors act on different axes, they can be applied in any order
inside a single Pallas pass over x-tiles:

    1. x-contraction as a [Tx, span] x [span, F] band matmul on the MXU
       (the halo'd input slab provides the +-p x-taps),
    2. y-contraction as lane rolls by (p-k)*Lz on the flattened (y,z) plane,
    3. z-contraction as lane rolls by (p-k).

This reads and writes each dof exactly once per apply — versus ~8 HBM
round-trips for the XLA separable path — and is the matvec inside the
distributed CG / BP1 benchmark (demo/gpu_cg/CUDA/cg.hpp:37-121).

Layout contract: same PaddedLayout as ops.pallas_wave (flat variant,
z_align=16): zero padding of >= p on every axis keeps every roll's
wraparound on zero-coefficient outputs, and the zero-padding invariant makes
CG's axpy/dot work directly on padded vectors.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_stiffness import banded_1d_coeffs
from .pallas_wave import PaddedLayout

__all__ = ["build_mass_tables", "make_mass_apply", "mass_fused"]


def _kernel_mass(
    xp_ref, wxt_ref, cvy_ref, cvz_ref, out_ref, slab, acc_ref, sem,
    *, p, Tx, Ly, Lz, dtype, ablate=(),
):
    ix = pl.program_id(0)
    n = pl.num_programs(0)
    span = Tx + 16
    K = 2 * p + 1
    F = Ly * Lz
    is_pad = jnp.logical_or(ix == 0, ix == n - 1)
    f32 = jnp.float32 if dtype != jnp.float64 else jnp.float64

    def dma(slot, idx):
        start = pl.multiple_of(idx * Tx - 8, 8)
        return pltpu.make_async_copy(
            xp_ref.at[pl.ds(start, span)], slab.at[slot], sem.at[slot]
        )

    @pl.when(ix + 1 <= n - 2)
    def _():
        dma((ix + 1) % 2, ix + 1).start()

    @pl.when(is_pad)
    def _():
        out_ref[:] = jnp.zeros((Tx, F), dtype=dtype)

    @pl.when(jnp.logical_not(is_pad))
    def _():
        dma(ix % 2, ix).wait()
        U = slab[ix % 2]  # [span, F]

        # 1. x-contraction: banded Mx rows for this tile, on the MXU.
        # precision=HIGHEST: the default f32 MXU path accumulates in bf16
        # passes (~5e-3 rel error measured on v5e), which would dominate the
        # CG residual floor; full-f32 costs little (the band matmul is a
        # small fraction of this kernel's time).
        if "xmm" in ablate:
            t1 = U[8 : 8 + Tx]
        else:
            t1 = jnp.einsum(
                "os,sf->of", wxt_ref[0], U, preferred_element_type=f32,
                precision=jax.lax.Precision.HIGHEST,
            ).astype(dtype)

        # 2. y-contraction: rolls by (p - k) * Lz on the flattened plane
        acc_ref[:] = cvy_ref[p][None, :] * t1
        for k in range(K):
            if k == p or "rolls" in ablate:
                continue
            acc_ref[:] += cvy_ref[k][None, :] * pltpu.roll(
                t1, ((p - k) * Lz) % F, 1
            )

        # 3. z-contraction: rolls by (p - k)
        out_ref[:] = cvz_ref[p][None, :] * acc_ref[:]
        for k in range(K):
            if k == p or "rolls" in ablate:
                continue
            out_ref[:] += cvz_ref[k][None, :] * pltpu.roll(
                acc_ref[:], (p - k) % F, 1
            )


def _padded_cv(layout: PaddedLayout, Ad: np.ndarray, n: int, axis: int):
    """Banded coefficient vectors [K, L_axis] of the assembled 1D operator,
    embedded into the padded axis extent (zeros elsewhere)."""
    p = layout.p
    K = 2 * p + 1
    body = banded_1d_coeffs(Ad, n, p)
    return np.stack([layout.padded_line(body[k], axis) for k in range(K)])


def build_mass_tables(
    layout: PaddedLayout, M1: list[np.ndarray], dtype=jnp.float32
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(WXT, CVY, CVZ) static tables for the fused mass kernel.

    ``M1``: per-axis 1D cell mass blocks (ops.separable.separable_mass_tables).
    """
    Nx, Ny, Nz = layout.shape
    p = layout.p
    Tx = layout.tile_x
    Lx, Ly, Lz = layout.padded_shape
    K = 2 * p + 1
    span = Tx + 16
    npdt = np.dtype(dtype)

    cvx = _padded_cv(layout, np.asarray(M1[0], np.float64), Nx, 0)  # [K, Lx]
    cvy = _padded_cv(layout, np.asarray(M1[1], np.float64), Ny, 1)
    cvz = _padded_cv(layout, np.asarray(M1[2], np.float64), Nz, 2)

    ntiles = Lx // Tx
    WXT = np.zeros((ntiles, Tx, span))
    off = 8 - p  # slab row of the k=0 tap for output row o
    for t in range(1, ntiles - 1):
        for o in range(Tx):
            g = t * Tx + o
            for k in range(K):
                WXT[t, o, o + off + k] = cvx[k, g]

    F = Ly * Lz
    CVY = np.repeat(cvy, Lz, axis=1)  # [K, F]
    CVZ = np.tile(cvz, (1, Ly))  # [K, F]
    return WXT.astype(npdt), CVY.astype(npdt), CVZ.astype(npdt)


def make_mass_apply(
    layout: PaddedLayout, M1: list[np.ndarray], dtype=jnp.float32,
    ablate: tuple = (),
):
    """Fused-kernel callable ``apply(xp3d) -> yp3d`` on padded arrays.

    ``ablate``: profiling hook — drop kernel stages ("xmm", "rolls") to
    bisect where the time goes (experiments/exp_bp1_lowp.py)."""
    p = layout.p
    Tx = layout.tile_x
    Lx, Ly, Lz = layout.padded_shape
    K = 2 * p + 1
    span = Tx + 16
    F = Ly * Lz
    if F % 128 != 0:
        raise ValueError(f"Ly*Lz = {F} must be a multiple of 128")
    if Tx % 8 != 0:
        raise ValueError(f"tile_x = {Tx} must be a multiple of 8 (2D DMA)")
    if p > 8:
        raise ValueError("fused mass kernel supports p <= 8")

    WXT, CVY, CVZ = (
        jnp.asarray(t) for t in build_mass_tables(layout, M1, dtype)
    )
    kern = functools.partial(
        _kernel_mass, p=p, Tx=Tx, Ly=Ly, Lz=Lz, dtype=dtype,
        ablate=tuple(ablate),
    )
    grid_n = Lx // Tx
    interpret = jax.default_backend() != "tpu"

    def apply(xp):
        x2 = xp.reshape(Lx, F)
        out = pl.pallas_call(
            kern,
            interpret=interpret,
            grid=(grid_n,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec((1, Tx, span), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((K, F), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((K, F), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((Tx, F), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((Lx, F), dtype),
            scratch_shapes=[
                pltpu.VMEM((2, span, F), dtype),
                pltpu.VMEM((Tx, F), dtype),
                pltpu.SemaphoreType.DMA((2,)),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=110 * 1024 * 1024,
            ),
        )(x2, WXT, CVY, CVZ)
        return out.reshape(Lx, Ly, Lz)

    return apply


_FUSED_CACHE: dict = {}
_FUSED_CACHE_MAX = 16  # each entry pins device tables; evict oldest (FIFO)


def mass_fused(
    x: jax.Array, M1: list[np.ndarray], p: int, tile_x: int = 16
) -> jax.Array:
    """Convenience single-apply on an unpadded grid (pads + unpads).

    The built apply (Python-loop band tables + pallas_call closure) is
    cached per (shape, p, tile, dtype, table fingerprint) so eager
    per-iteration callers don't pay host-side reconstruction per matvec;
    bounded so long-lived processes sweeping shapes/coefficients don't
    accumulate pinned device tables without limit.
    """
    key = (
        tuple(x.shape), p, tile_x, jnp.dtype(x.dtype).name,
        tuple(np.asarray(m).tobytes() for m in M1),
    )
    hit = _FUSED_CACHE.pop(key, None)
    if hit is None:
        layout = PaddedLayout(tuple(x.shape), p, tile_x=tile_x, z_align=16)
        hit = (layout, make_mass_apply(layout, M1, x.dtype))
    _FUSED_CACHE[key] = hit  # re-insert: dict order == recency (LRU)
    while len(_FUSED_CACHE) > _FUSED_CACHE_MAX:
        _FUSED_CACHE.pop(next(iter(_FUSED_CACHE)))
    layout, apply = hit
    return layout.unpad(apply(layout.pad(x)))
