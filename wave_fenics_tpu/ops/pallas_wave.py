"""Padded-state fused wave kernel: stiffness/m in one pass, zero repacking.

Profiling the fused stencil kernel (ops.pallas_stiffness) shows its cost is
almost entirely data movement: the per-apply jnp.pad (~80MB) and the padded
DMA slabs. This module removes both:

- **Persistent padded layout** (``PaddedLayout``): solver state lives in an
  aligned padded array; the interior sits at offset (Tx, p, p) — a FULL
  x-tile of zero padding on each x side, so every tile's halo window
  [i*Tx - p, i*Tx + Tx + p) is in-bounds with a tile-independent shift,
  and the two all-pad edge tiles just write zeros. y/z are rounded to the
  (8, 128) DMA tiling and their stencil taps use cyclic rolls (wraparound
  only ever lands on zero-coefficient pad outputs).
- **inv_m folded in**: the lumped mass is separable on uniform boxes
  (m = mx (x) my (x) mz), so 1/m folds into the static line scalings and the
  kernel directly returns the stiffness part of dv/dt = -c0^2 (K u)/m
  (the reference's per-stage divide, LinearGLL.hpp:182-191, now free).

Boundary (source/ABC) terms act on single grid planes and are applied as
cheap XLA plane updates by models.linear_wave_padded.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_stiffness import banded_1d_coeffs

__all__ = ["PaddedLayout", "make_padded_stiffness"]


def _r8(n):
    return -(-n // 8) * 8


def _r128(n):
    return -(-n // 128) * 128


@dataclass(frozen=True)
class PaddedLayout:
    """Aligned padded storage for a dof grid [Nx, Ny, Nz].

    Interior at offset (tile_x, halo, halo); padded dims:
    x = (ceil(Nx/tile_x) + 2) * tile_x, y = r8(Ny + 2*halo), and z rounded
    to ``z_align`` (128 for the 3D-slab kernel; 16 for the flattened-(y,z)
    kernel, whose DMA sees a 2D [x, Ly*Lz] view with Ly*Lz a multiple of
    128 — much less z-padding waste).

    ``halo`` defaults to p (single-device: zero padding the stencils fall
    off). Distributed value-halo layouts use halo = 3p so a whole fused
    RK4 step can run on neighbor VALUES exchanged once per step
    (parallel.sharded_padded step mode). The padding beyond valid halo
    data must stay zero — operators preserve this invariant.
    """

    shape: tuple[int, int, int]
    p: int
    tile_x: int = 16
    z_align: int = 128
    halo: int | None = None

    @property
    def h(self) -> int:
        return self.p if self.halo is None else self.halo

    @property
    def ntx(self) -> int:
        return -(-self.shape[0] // self.tile_x)

    @property
    def x0(self) -> int:
        return self.tile_x

    @property
    def padded_shape(self) -> tuple[int, int, int]:
        Nx, Ny, Nz = self.shape
        za = self.z_align
        h = self.h
        return (
            (self.ntx + 2) * self.tile_x,
            _r8(Ny + 2 * h),
            -(-(Nz + 2 * h) // za) * za,
        )

    @property
    def interior(self) -> tuple[slice, slice, slice]:
        Nx, Ny, Nz = self.shape
        h = self.h
        return (
            slice(self.x0, self.x0 + Nx),
            slice(h, h + Ny),
            slice(h, h + Nz),
        )

    def pad(self, x: jax.Array) -> jax.Array:
        Nx, Ny, Nz = self.shape
        Lx, Ly, Lz = self.padded_shape
        h = self.h
        return jnp.pad(
            x,
            (
                (self.x0, Lx - Nx - self.x0),
                (h, Ly - Ny - h),
                (h, Lz - Nz - h),
            ),
        )

    def unpad(self, xp: jax.Array) -> jax.Array:
        return xp[self.interior]

    def padded_line(self, vals: np.ndarray, axis: int) -> np.ndarray:
        """Embed a length-N axis line into the padded axis extent."""
        L = self.padded_shape[axis]
        off = self.x0 if axis == 0 else self.h
        out = np.zeros(L, dtype=np.asarray(vals).dtype)
        out[off : off + len(vals)] = vals
        return out


def _kernel(
    xp_ref, lyz_ref, lxz_ref, lxy_ref, cvx_ref, cvy_ref, cvz_ref,
    out_ref, slab, acc_ref, sem, *, p, Tx, Ly, Lz, dtype, yz_matmul=False,
):
    ix = pl.program_id(0)
    n = pl.num_programs(0)
    span = Tx + 2 * p
    K = 2 * p + 1
    is_pad = jnp.logical_or(ix == 0, ix == n - 1)

    def dma(slot, idx):
        # window [idx*Tx - p, idx*Tx + Tx + p): in-bounds for 1 <= idx <= n-2
        return pltpu.make_async_copy(
            xp_ref.at[pl.ds(idx * Tx - p, span)], slab.at[slot], sem.at[slot]
        )

    # Double-buffered prefetch over the interior tiles 1..n-2 (tile 0 is
    # all-pad, so its iteration serves as the warmup prefetch for tile 1).
    @pl.when(ix + 1 <= n - 2)
    def _():
        dma((ix + 1) % 2, ix + 1).start()

    @pl.when(is_pad)
    def _():
        out_ref[:] = jnp.zeros((Tx, Ly, Lz), dtype=dtype)

    @pl.when(jnp.logical_not(is_pad))
    def _():
        dma(ix % 2, ix).wait()
        U = slab[ix % 2]  # rows [ix*Tx - p, ix*Tx + Tx + p)

        # x-term: out row l (array row ix*Tx + l) reads U[l + k], k in [0,2p]
        acc_ref[:] = cvx_ref[0] * U[0:Tx]
        for k in range(1, K):
            acc_ref[:] += cvx_ref[k] * U[k : k + Tx]
        out_ref[:] = acc_ref[:] * lyz_ref[:]

        Uc = U[p : p + Tx]
        f32 = jnp.float32 if dtype != jnp.float64 else jnp.float64
        if yz_matmul:
            # y/z-terms as dense band-matrix contractions on the MXU
            # (cvy/cvz refs hold [Ly, Ly] / [Lz, Lz] band matrices here)
            ty = jnp.einsum(
                "xzy,yo->xzo", jnp.swapaxes(Uc, 1, 2), cvy_ref[:],
                preferred_element_type=f32,
                precision=jax.lax.Precision.HIGHEST,
            ).astype(dtype)
            out_ref[:] += jnp.swapaxes(ty, 1, 2) * lxz_ref[:]
            tz = jnp.einsum(
                "xyz,zo->xyo", Uc, cvz_ref[:], preferred_element_type=f32,
                precision=jax.lax.Precision.HIGHEST
            ).astype(dtype)
            out_ref[:] += tz * lxy_ref[:]
        else:
            # y/z-terms: cyclic rolls by (p - k); wraparound only reaches
            # zero-coefficient pad outputs (Ly >= Ny + 2p, Lz >= Nz + 2p)
            acc_ref[:] = cvy_ref[p] * Uc
            for k in range(K):
                if k == p:
                    continue
                acc_ref[:] += cvy_ref[k] * pltpu.roll(Uc, (p - k) % Ly, 1)
            out_ref[:] += acc_ref[:] * lxz_ref[:]

            acc_ref[:] = cvz_ref[p] * Uc
            for k in range(K):
                if k == p:
                    continue
                acc_ref[:] += cvz_ref[k] * pltpu.roll(Uc, (p - k) % Lz, 2)
            out_ref[:] += acc_ref[:] * lxy_ref[:]


def build_tables(
    layout: PaddedLayout,
    A: list[np.ndarray],
    lines: list[np.ndarray],
    coeff: float,
    inv_m_lines: list[np.ndarray] | None = None,
    dtype=jnp.float32,
    yz_matmul: bool = False,
) -> tuple[np.ndarray, ...]:
    """Static kernel tables (LYZ, LXZ, LXY, CVX, CVY, CVZ) as NumPy arrays.

    ``lines``: dimensionless GLL weight lines (ops.separable.grid_lines) for
    the (sub)domain this kernel instance covers. ``inv_m_lines``: separable
    lumped-mass factors; for a distributed subdomain, pass the GLOBAL mass
    line slices (the division is linear, so it commutes with the halo-add of
    partial sums). Face self-term corrections are applied at both ends of
    every axis — for an interior subdomain boundary this yields exactly the
    single-sided cell taps whose cross-device sum (via halo-add) equals the
    full stencil.
    """
    Nx, Ny, Nz = layout.shape
    p = layout.p
    Lx, Ly, Lz = layout.padded_shape
    K = 2 * p + 1
    npdt = np.dtype(dtype)

    Lxl, Lyl, Lzl = lines
    if inv_m_lines is None:
        ix_, iy_, iz_ = np.ones(Nx), np.ones(Ny), np.ones(Nz)
    else:
        mx, my, mz = inv_m_lines
        ix_, iy_, iz_ = 1.0 / mx, 1.0 / my, 1.0 / mz
    sLx, sLy, sLz = Lxl * ix_, Lyl * iy_, Lzl * iz_

    pl_ = layout.padded_line
    lyz = np.outer(pl_(sLy, 1), pl_(sLz, 2))
    lxz = np.einsum("x,z->xz", pl_(sLx, 0), pl_(sLz, 2))
    lxy = np.einsum("x,y->xy", pl_(sLx, 0), pl_(sLy, 1))

    def padded_cv(Ad, n, axis, own_inv):
        body = banded_1d_coeffs(Ad, n, p, scale=coeff) * own_inv[None, :]
        return np.stack([pl_(body[k], axis) for k in range(K)])

    cvx = padded_cv(A[0], Nx, 0, ix_)
    cvy = padded_cv(A[1], Ny, 1, iy_)
    cvz = padded_cv(A[2], Nz, 2, iz_)

    CVX = cvx.reshape(K, Lx, 1, 1).astype(npdt)
    if yz_matmul:
        def band(cv, L):
            B = np.zeros((L, L))
            for o in range(L):
                for k in range(K):
                    r = o + k - p
                    if 0 <= r < L:
                        B[r, o] = cv[k, o]
            return B

        CVY = band(cvy, Ly).astype(npdt)
        CVZ = band(cvz, Lz).astype(npdt)
    else:
        CVY = cvy.reshape(K, 1, Ly, 1).astype(npdt)
        CVZ = cvz.reshape(K, 1, 1, Lz).astype(npdt)
    LYZ = lyz[None].astype(npdt)
    LXZ = lxz[:, None, :].astype(npdt)
    LXY = lxy[:, :, None].astype(npdt)
    return LYZ, LXZ, LXY, CVX, CVY, CVZ


def make_apply(layout: PaddedLayout, dtype=jnp.float32, yz_matmul: bool = False):
    """The raw padded-kernel callable:
    ``apply(xp, LYZ, LXZ, LXY, CVX, CVY, CVZ) -> yp``.

    Tables come in as runtime operands so distributed callers can feed
    per-device tables through shard_map.
    """
    p = layout.p
    Tx = layout.tile_x
    Lx, Ly, Lz = layout.padded_shape
    K = 2 * p + 1
    if yz_matmul:
        cvy_spec = pl.BlockSpec((Ly, Ly), lambda i: (0, 0),
                                memory_space=pltpu.VMEM)
        cvz_spec = pl.BlockSpec((Lz, Lz), lambda i: (0, 0),
                                memory_space=pltpu.VMEM)
    else:
        cvy_spec = pl.BlockSpec((K, 1, Ly, 1), lambda i: (0, 0, 0, 0),
                                memory_space=pltpu.VMEM)
        cvz_spec = pl.BlockSpec((K, 1, 1, Lz), lambda i: (0, 0, 0, 0),
                                memory_space=pltpu.VMEM)

    kern = functools.partial(
        _kernel, p=p, Tx=Tx, Ly=Ly, Lz=Lz, dtype=dtype, yz_matmul=yz_matmul
    )
    grid_n = Lx // Tx
    interpret = jax.default_backend() != "tpu"  # CPU testing path

    def apply(xp, LYZ, LXZ, LXY, CVX, CVY, CVZ):
        return pl.pallas_call(
            kern,
            interpret=interpret,
            grid=(grid_n,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec((1, Ly, Lz), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((Tx, 1, Lz), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((Tx, Ly, 1), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((K, Tx, 1, 1), lambda i: (0, i, 0, 0),
                             memory_space=pltpu.VMEM),
                cvy_spec,
                cvz_spec,
            ],
            out_specs=pl.BlockSpec(
                (Tx, Ly, Lz), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((Lx, Ly, Lz), dtype),
            scratch_shapes=[
                pltpu.VMEM((2, Tx + 2 * p, Ly, Lz), dtype),
                pltpu.VMEM((Tx, Ly, Lz), dtype),
                pltpu.SemaphoreType.DMA((2,)),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=110 * 1024 * 1024,
            ),
        )(xp, LYZ, LXZ, LXY, CVX, CVY, CVZ)

    return apply


# ---------------------------------------------------------------------------
# Flattened-(y,z) kernel: less z-padding (z_align=16), x-term on the MXU
# ---------------------------------------------------------------------------


def _kernel_flat(
    xp_ref, wxt_ref, cvy_ref, cvz_ref, fx_ref, gz_ref, gy_ref, sx_ref,
    out_ref, slab, acc_ref, sem, *, p, Tx, Ly, Lz, dtype,
):
    """2D view [x, Ly*Lz]: DMA legality comes from Ly*Lz % 128 == 0, so z
    only needs 16-alignment (vs 128 for 3D slabs) — ~1.8x less DMA/write
    traffic at Nz ~ 129.

    - x-term: one [Tx+2p, Tx]^T x [Tx+2p, F] MXU matmul (band matrix with
      coefficients, face corrections, own-axis 1/m folded per tile)
    - y/z-terms: lane rolls by (p-k)*Lz / (p-k) on the flattened plane;
      wraparound lands only on zero-coefficient pad rows/columns
    """
    ix = pl.program_id(0)
    n = pl.num_programs(0)
    # 2D DMA offsets must be 8-aligned in the sublane dim: use an 8-deep
    # halo window (>= p for p <= 8) so starts are multiples of 8.
    span = Tx + 16
    K = 2 * p + 1
    F = Ly * Lz
    is_pad = jnp.logical_or(ix == 0, ix == n - 1)
    f32 = jnp.float32 if dtype != jnp.float64 else jnp.float64

    def dma(slot, idx):
        start = pl.multiple_of(idx * Tx - 8, 8)  # Tx % 8 == 0 by contract
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

        # x-term (MXU): out = W @ U, W the per-tile [Tx, span] band matrix
        tx = jnp.einsum(
            "os,sf->of", wxt_ref[0], U, preferred_element_type=f32,
            precision=jax.lax.Precision.HIGHEST
        ).astype(dtype)
        out_ref[:] = tx * fx_ref[:]

        Uc = U[8 : 8 + Tx]
        # y-term: rolls by (p - k) * Lz
        acc_ref[:] = cvy_ref[p][None, :] * Uc
        for k in range(K):
            if k == p:
                continue
            acc_ref[:] += cvy_ref[k][None, :] * pltpu.roll(
                Uc, ((p - k) * Lz) % F, 1
            )
        out_ref[:] += acc_ref[:] * (sx_ref[:] * gz_ref[:])

        # z-term: rolls by (p - k)
        acc_ref[:] = cvz_ref[p][None, :] * Uc
        for k in range(K):
            if k == p:
                continue
            acc_ref[:] += cvz_ref[k][None, :] * pltpu.roll(Uc, (p - k) % F, 1)
        out_ref[:] += acc_ref[:] * (sx_ref[:] * gy_ref[:])


def axis_cv_tables(
    layout: PaddedLayout,
    A: list[np.ndarray],
    lines: list[np.ndarray],
    coeff: float,
    inv_m_lines: list[np.ndarray] | None = None,
) -> tuple[np.ndarray, ...]:
    """Raw per-axis stencil/line tables shared by the flat-layout kernels:
    (cvx, cvy, cvz, sLx, sLy, sLz) — banded coefficient vectors [K, L_d]
    (face corrections + own-axis 1/m folded in) and the scaled lumped lines
    embedded in the padded extents."""
    Nx, Ny, Nz = layout.shape
    p = layout.p
    K = 2 * p + 1

    Lxl, Lyl, Lzl = lines
    if inv_m_lines is None:
        ix_, iy_, iz_ = np.ones(Nx), np.ones(Ny), np.ones(Nz)
    else:
        mx, my, mz = inv_m_lines
        ix_, iy_, iz_ = 1.0 / mx, 1.0 / my, 1.0 / mz
    sLx, sLy, sLz = Lxl * ix_, Lyl * iy_, Lzl * iz_

    pl_ = layout.padded_line

    def padded_cv(Ad, n, axis, own_inv):
        body = banded_1d_coeffs(Ad, n, p, scale=coeff) * own_inv[None, :]
        return np.stack([pl_(body[k], axis) for k in range(K)])

    cvx = padded_cv(A[0], Nx, 0, ix_)  # [K, Lx]
    cvy = padded_cv(A[1], Ny, 1, iy_)  # [K, Ly]
    cvz = padded_cv(A[2], Nz, 2, iz_)  # [K, Lz]
    return cvx, cvy, cvz, pl_(sLx, 0), pl_(sLy, 1), pl_(sLz, 2)


def build_tables_flat(
    layout: PaddedLayout,
    A: list[np.ndarray],
    lines: list[np.ndarray],
    coeff: float,
    inv_m_lines: list[np.ndarray] | None = None,
    dtype=jnp.float32,
) -> tuple[np.ndarray, ...]:
    """(WXT, CVY, CVZ, FX, GZ, GY, SX) for the flattened kernel."""
    Nx, Ny, Nz = layout.shape
    p = layout.p
    Tx = layout.tile_x
    Lx, Ly, Lz = layout.padded_shape
    K = 2 * p + 1
    span = Tx + 16
    F = Ly * Lz
    npdt = np.dtype(dtype)

    cvx, cvy, cvz, pLx, pLy, pLz = axis_cv_tables(
        layout, A, lines, coeff, inv_m_lines
    )

    ntiles = Lx // Tx
    WXT = np.zeros((ntiles, Tx, span))
    off = 8 - p  # slab row of the k=0 tap for out row o is o + (8 - p)
    for t in range(1, ntiles - 1):
        for o in range(Tx):
            g = t * Tx + o
            for k in range(K):
                WXT[t, o, o + off + k] = cvx[k, g]

    CVY = np.repeat(cvy, Lz, axis=1)  # [K, F], value depends on y = j // Lz
    CVZ = np.tile(cvz, (1, Ly))  # [K, F], value depends on z = j % Lz
    FX = np.outer(pLy, pLz).reshape(1, F)
    GZ = np.tile(pLz, Ly).reshape(1, F)
    GY = np.repeat(pLy, Lz).reshape(1, F)
    SX = pLx.reshape(Lx, 1)
    return (
        WXT.astype(npdt), CVY.astype(npdt), CVZ.astype(npdt),
        FX.astype(npdt), GZ.astype(npdt), GY.astype(npdt), SX.astype(npdt),
    )


def make_apply_flat(layout: PaddedLayout, dtype=jnp.float32):
    """Flattened-kernel callable:
    ``apply(xp3d, WXT, CVY, CVZ, FX, GZ, GY, SX) -> yp3d``."""
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
        raise ValueError("flat kernel supports p <= 8 (8-deep halo window)")

    kern = functools.partial(_kernel_flat, p=p, Tx=Tx, Ly=Ly, Lz=Lz,
                             dtype=dtype)
    grid_n = Lx // Tx
    interpret = jax.default_backend() != "tpu"

    def apply(xp, WXT, CVY, CVZ, FX, GZ, GY, SX):
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
                pl.BlockSpec((1, F), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, F), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, F), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((Tx, 1), lambda i: (i, 0),
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
        )(x2, WXT, CVY, CVZ, FX, GZ, GY, SX)
        return out.reshape(Lx, Ly, Lz)

    return apply


def make_padded_stiffness(
    layout: PaddedLayout,
    A: list[np.ndarray],
    lines: list[np.ndarray],
    coeff: float,
    inv_m_lines: list[np.ndarray] | None = None,
    dtype=jnp.float32,
    yz_matmul: bool = False,
):
    """Single-device convenience: tables closed over as jnp constants."""
    tables = tuple(
        jnp.asarray(t)
        for t in build_tables(
            layout, A, lines, coeff, inv_m_lines, dtype, yz_matmul
        )
    )
    raw = make_apply(layout, dtype, yz_matmul)

    def apply(xp: jax.Array) -> jax.Array:
        return raw(xp, *tables)

    return apply


# ---------------------------------------------------------------------------
# Fully fused RK stage: stiffness/m + stage axpys + x-face boundary planes
# ---------------------------------------------------------------------------


def _kernel_rk_stage(
    u0_hbm, ku_hbm, v0_ref, kv_ref, ua_ref, va_ref, scal_ref,
    wxt_ref, cvy_ref, cvz_ref, fx_ref, gz_ref, gy_ref, sx_ref,
    w1_ref, w2_ref,
    vn_out, kv_out, ua_out, va_out,
    slab_u, slab_k, acc_ref, sem_u, sem_k,
    *, p, Tx, Ly, Lz, dtype, src_tile, src_row, abc_tile, abc_row, c0,
):
    """One classic-RK4 stage, entirely on-chip per tile:

        un   = u0 + ca*ku          (built in VMEM on the halo'd slabs)
        vn   = v0 + ca*kv
        kv'  = -c0^2 (K un)/m  + c0^2 g W1/m  - c0 (W2/m) vn   (x-face planes)
        ua  += cb*vn ;  va += cb*kv'

    scal_ref (SMEM): [ca, cb, g]. Stage outputs: (vn, kv', ua, va); the
    caller chains vn -> ku, kv' -> kv across the 4 stages.
    """
    ix = pl.program_id(0)
    n = pl.num_programs(0)
    span = Tx + 16
    K = 2 * p + 1
    F = Ly * Lz
    is_pad = jnp.logical_or(ix == 0, ix == n - 1)
    f32 = jnp.float32 if dtype != jnp.float64 else jnp.float64
    ca = scal_ref[0, 0]
    cb = scal_ref[0, 1]
    g = scal_ref[0, 2]

    def dma(hbm, slab, sem, slot, idx):
        start = pl.multiple_of(idx * Tx - 8, 8)
        return pltpu.make_async_copy(
            hbm.at[pl.ds(start, span)], slab.at[slot], sem.at[slot]
        )

    @pl.when(ix + 1 <= n - 2)
    def _():
        dma(u0_hbm, slab_u, sem_u, (ix + 1) % 2, ix + 1).start()
        dma(ku_hbm, slab_k, sem_k, (ix + 1) % 2, ix + 1).start()

    vn = v0_ref[:] + ca * kv_ref[:]
    vn_out[:] = vn
    ua_out[:] = ua_ref[:] + cb * vn

    @pl.when(is_pad)
    def _():
        kv_out[:] = jnp.zeros((Tx, F), dtype=dtype)
        va_out[:] = va_ref[:]

    @pl.when(jnp.logical_not(is_pad))
    def _():
        dma(u0_hbm, slab_u, sem_u, ix % 2, ix).wait()
        dma(ku_hbm, slab_k, sem_k, ix % 2, ix).wait()
        U = slab_u[ix % 2] + ca * slab_k[ix % 2]  # un on the halo'd window

        tx = jnp.einsum(
            "os,sf->of", wxt_ref[0], U, preferred_element_type=f32,
            precision=jax.lax.Precision.HIGHEST
        ).astype(dtype)
        kv2 = tx * fx_ref[:]

        Uc = U[8 : 8 + Tx]
        acc_ref[:] = cvy_ref[p][None, :] * Uc
        for k in range(K):
            if k == p:
                continue
            acc_ref[:] += cvy_ref[k][None, :] * pltpu.roll(
                Uc, ((p - k) * Lz) % F, 1
            )
        kv2 = kv2 + acc_ref[:] * (sx_ref[:] * gz_ref[:])

        acc_ref[:] = cvz_ref[p][None, :] * Uc
        for k in range(K):
            if k == p:
                continue
            acc_ref[:] += cvz_ref[k][None, :] * pltpu.roll(Uc, (p - k) % F, 1)
        kv2 = kv2 + acc_ref[:] * (sx_ref[:] * gy_ref[:])

        kv_out[:] = kv2
        # x-face boundary planes (source + ABC), static rows within tiles
        @pl.when(ix == src_tile)
        def _():
            kv_out[src_row, :] += (c0 * c0 * g) * w1_ref[0, :]

        @pl.when(ix == abc_tile)
        def _():
            kv_out[abc_row, :] += (-c0) * w2_ref[0, :] * vn[abc_row, :]

        va_out[:] = va_ref[:] + cb * kv_out[:]


def make_rk_stage(
    layout: PaddedLayout,
    tables: tuple,
    w1_flat: np.ndarray,
    w2_flat: np.ndarray,
    src_x: int,
    abc_x: int,
    c0: float,
    dtype=jnp.float32,
):
    """Build the fused stage callable for x-face source/ABC problems.

    ``tables`` from build_tables_flat; ``w1_flat``/``w2_flat``: [F] lumped
    facet-weight planes premultiplied by 1/m; ``src_x``/``abc_x``: padded
    x-row indices of the source and absorbing faces.
    """
    p = layout.p
    Tx = layout.tile_x
    Lx, Ly, Lz = layout.padded_shape
    K = 2 * p + 1
    span = Tx + 16
    F = Ly * Lz
    npdt = np.dtype(dtype)
    grid_n = Lx // Tx
    interpret = jax.default_backend() != "tpu"

    WXT, CVY, CVZ, FX, GZ, GY, SX = [jnp.asarray(t) for t in tables]
    W1 = jnp.asarray(w1_flat.reshape(1, F).astype(npdt))
    W2 = jnp.asarray(w2_flat.reshape(1, F).astype(npdt))

    kern = functools.partial(
        _kernel_rk_stage, p=p, Tx=Tx, Ly=Ly, Lz=Lz, dtype=dtype,
        src_tile=src_x // Tx, src_row=src_x % Tx,
        abc_tile=abc_x // Tx, abc_row=abc_x % Tx, c0=float(c0),
    )

    tile2 = lambda i: (i, 0)
    full2 = lambda i: (0, 0)
    vspec = pl.BlockSpec((Tx, F), tile2, memory_space=pltpu.VMEM)

    def stage(u0, ku, v0, kv, ua, va, ca, cb, g):
        scal = jnp.stack(
            [jnp.asarray(ca, dtype), jnp.asarray(cb, dtype),
             jnp.asarray(g, dtype)]
        ).reshape(1, 3)
        outs = pl.pallas_call(
            kern,
            interpret=interpret,
            grid=(grid_n,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
                vspec, vspec, vspec, vspec,
                pl.BlockSpec((1, 3), full2, memory_space=pltpu.SMEM),
                pl.BlockSpec((1, Tx, span), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((K, F), full2, memory_space=pltpu.VMEM),
                pl.BlockSpec((K, F), full2, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, F), full2, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, F), full2, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, F), full2, memory_space=pltpu.VMEM),
                pl.BlockSpec((Tx, 1), tile2, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, F), full2, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, F), full2, memory_space=pltpu.VMEM),
            ],
            out_specs=(vspec, vspec, vspec, vspec),
            out_shape=tuple(
                jax.ShapeDtypeStruct((Lx, F), dtype) for _ in range(4)
            ),
            scratch_shapes=[
                pltpu.VMEM((2, span, F), dtype),
                pltpu.VMEM((2, span, F), dtype),
                pltpu.VMEM((Tx, F), dtype),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=110 * 1024 * 1024,
            ),
        )(
            u0.reshape(Lx, F), ku.reshape(Lx, F),
            v0.reshape(Lx, F), kv.reshape(Lx, F),
            ua.reshape(Lx, F), va.reshape(Lx, F),
            scal, WXT, CVY, CVZ, FX, GZ, GY, SX, W1, W2,
        )
        vn, kv2, ua2, va2 = outs
        rs = lambda a: a.reshape(Lx, Ly, Lz)
        return rs(vn), rs(kv2), rs(ua2), rs(va2)

    return stage
