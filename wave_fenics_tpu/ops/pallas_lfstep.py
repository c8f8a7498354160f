"""Fused leapfrog STEP kernel: one HBM pass per leapfrog timestep.

The round-4 leapfrog integrator (solvers/leapfrog.py — 2nd order, ONE
stiffness apply per step, semi-implicit diagonal ABC damping) applied to
the structured padded hot path, with the communication-avoiding fusion
of ops.pallas_rk4step: each x-tile reads (u0, v0) slabs once with a
2p-deep halo, computes the whole step in VMEM, and writes (u1, v1) once.

Scheme per tile (kick-drift-kick, D = c0 * abc * W2, dt2 = dt/2; see
solvers/leapfrog.py for the order/stability proof):

    F0 = A u0 + c0^2 g(t)   * src * W1        (rows [o0-p, o0+Tx+p))
    v+ = (v0 + dt2 F0) / (1 + dt2 D)          (same window)
    u1 = u0 + dt v+                           (same window)
    F1 = A u1 + c0^2 g(t+dt) * src * W1        (rows [o0, o0+Tx))
    v1 = (1 - dt2 D) v+ + dt2 F1

F is NOT carried across steps: recomputing A u0 costs one stencil pass
(~0.17 ms at p=4 4.3M dofs) but saves two state-array HBM passes
(~0.26 ms) and keeps the carry at (u, v) — checkpoint/resume and the
distributed value-halo variant stay two-array. The recomputed F0 is
bitwise the previous step's F1 (same inputs, same program), so the
scheme equals the carried form exactly.

Traffic/step: 2 slab reads at (Tx + 2*off0)/Tx amplification + 2 writes
(~5 state arrays at Tx=32, p=4) vs the RK4 step kernel's ~6 with twice
the stencil work — measured headroom over the RK4 step kernel comes
from both.

A = -c0^2 K/m is the separable stiffness with 1/m folded in; table
semantics follow ops.pallas_rk4step (banded x windows, folded-line y/z
roll stencils, slab-aligned SXS/SRC/ABC row masks, 1/m-premultiplied
facet planes). Reference physics: common/LinearGLL.hpp:141-192; the
integrator replaces its RK4 loop (LinearGLL.hpp:198-287) as an option.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_wave import PaddedLayout, axis_cv_tables

__all__ = [
    "build_lf_tables",
    "build_lf_tables_from_cv",
    "make_lf_step",
    "make_lf_step_raw",
]


def _off0(p: int) -> int:
    """Slab x-halo depth: >= 2p, 8-aligned (2D DMA sublane rule)."""
    return -(-2 * p // 8) * 8


def _kernel_lf_step(
    u0_hbm, v0_hbm, scal_ref,
    wxb_ref, wxc_ref, cvy_ref, cvz_ref,
    fx_ref, sxs_ref, src_ref, abc_ref, w1_ref, w2_ref,
    u1_out, v1_out,
    slab_u, slab_v, acc_ref, sem_u, sem_v,
    *, p, Tx, Ly, Lz, dtype, c0, precision=jax.lax.Precision.HIGHEST,
    yz_chunk=9,
):
    ix = pl.program_id(0)
    n = pl.num_programs(0)
    off0 = _off0(p)
    S0 = Tx + 2 * off0
    K = 2 * p + 1
    F = Ly * Lz
    is_pad = jnp.logical_or(ix == 0, ix == n - 1)
    f32 = jnp.float32 if dtype != jnp.float64 else jnp.float64
    dt = scal_ref[0, 0]
    g0 = scal_ref[0, 1]
    g1 = scal_ref[0, 2]
    dt2 = dt * jnp.asarray(0.5, dtype)
    c0sq = jnp.asarray(c0 * c0, dtype)
    pc0 = jnp.asarray(c0, dtype)
    one = jnp.asarray(1.0, dtype)

    o1, o0 = off0 - p, off0
    n1, n0 = Tx + 2 * p, Tx

    def dma(hbm, slab, sem, slot, idx):
        start = pl.multiple_of(idx * Tx - off0, 8)
        return pltpu.make_async_copy(
            hbm.at[pl.ds(start, S0)], slab.at[slot], sem.at[slot]
        )

    @pl.when(ix + 1 <= n - 2)
    def _():
        dma(u0_hbm, slab_u, sem_u, (ix + 1) % 2, ix + 1).start()
        dma(v0_hbm, slab_v, sem_v, (ix + 1) % 2, ix + 1).start()

    @pl.when(is_pad)
    def _():
        u1_out[:] = jnp.zeros((Tx, F), dtype=dtype)
        v1_out[:] = jnp.zeros((Tx, F), dtype=dtype)

    @pl.when(jnp.logical_not(is_pad))
    def _():
        dma(u0_hbm, slab_u, sem_u, ix % 2, ix).wait()
        dma(v0_hbm, slab_v, sem_v, ix % 2, ix).wait()
        U0 = slab_u[ix % 2]  # [S0, F]
        V0 = slab_v[ix % 2]

        def apply_A(xin, wx_ref, o, nrows):
            """A x on output rows [o, o+nrows); xin = x on [o-p, o+nrows+p).
            Identical structure to ops.pallas_rk4step._kernel_rk4_step's
            apply_A (folded-line y/z roll stencils, shared accumulator)."""
            xc = xin[p : p + nrows]
            sx = sxs_ref[0, o : o + nrows]
            tx = jnp.einsum(
                "os,sf->of", wx_ref[0], xin,
                preferred_element_type=f32, precision=precision,
            ).astype(dtype)
            out = tx * fx_ref[:]
            terms = [(cvy_ref, k, ((p - k) * Lz) % F) for k in range(K)]
            terms += [(cvz_ref, k, (p - k) % F) for k in range(K)]
            first = True
            for i in range(0, len(terms), yz_chunk):
                e = None
                for ref, k, sh in terms[i : i + yz_chunk]:
                    xs = xc if sh == 0 else pltpu.roll(xc, sh, 1)
                    t = ref[k][None, :] * xs
                    e = t if e is None else e + t
                if first:
                    acc_ref[0:nrows] = e
                    first = False
                else:
                    acc_ref[0:nrows] += e
            out += acc_ref[0:nrows] * sx
            return out

        def force(au, gj, o, nrows):
            src = src_ref[0, o : o + nrows]
            return au + (c0sq * gj) * (src * w1_ref[:])

        def damp(o, nrows):
            abc = abc_ref[0, o : o + nrows]
            return pc0 * (abc * w2_ref[:])

        # half-kick (implicit) + drift on the p-deep window
        F0 = force(apply_A(U0[o1 - p : o1 - p + n1 + 2 * p], wxb_ref,
                           o1, n1), g0, o1, n1)
        D1 = damp(o1, n1)
        vplus = (V0[o1 : o1 + n1] + dt2 * F0) / (one + dt2 * D1)
        u1w = U0[o1 : o1 + n1] + dt * vplus

        # second (adjoint/explicit) half-kick on the output rows
        F1 = force(apply_A(u1w, wxc_ref, o0, n0), g1, o0, n0)
        s = o0 - o1
        v1_out[:] = (
            (one - dt2 * damp(o0, n0)) * vplus[s : s + n0] + dt2 * F1
        )
        u1_out[:] = u1w[s : s + n0]


def build_lf_tables(
    layout: PaddedLayout,
    A: list[np.ndarray],
    lines: list[np.ndarray],
    coeff: float,
    inv_m_lines: list[np.ndarray],
    w1_flat: np.ndarray,
    w2_flat: np.ndarray,
    src_x: int,
    abc_x: int,
    dtype=jnp.float32,
) -> tuple[np.ndarray, ...]:
    """Static tables for the fused leapfrog step kernel. Returns
    (WXB, WXC, CVY, CVZ, FX, SXS, SRC, ABC, W1, W2) — the rk4step table
    semantics with the leapfrog's two window shapes and 2p slab halo."""
    cvx, cvy, cvz, pLx, pLy, pLz = axis_cv_tables(
        layout, A, lines, coeff, inv_m_lines
    )
    return build_lf_tables_from_cv(
        layout, cvx, cvy, cvz, pLx, pLy, pLz,
        w1_flat, w2_flat, src_x, abc_x, dtype,
    )


def build_lf_tables_from_cv(
    layout: PaddedLayout,
    cvx: np.ndarray, cvy: np.ndarray, cvz: np.ndarray,
    pLx: np.ndarray, pLy: np.ndarray, pLz: np.ndarray,
    w1_flat: np.ndarray,
    w2_flat: np.ndarray,
    src_x: int,
    abc_x: int,
    dtype=jnp.float32,
) -> tuple[np.ndarray, ...]:
    """Leapfrog step tables from pre-built padded coefficient/line
    vectors (the distributed value-halo entry point, mirroring
    ops.pallas_rk4step.build_step_tables_from_cv)."""
    p = layout.p
    Tx = layout.tile_x
    Lx, Ly, Lz = layout.padded_shape
    K = 2 * p + 1
    off0 = _off0(p)
    S0 = Tx + 2 * off0
    F = Ly * Lz
    npdt = np.dtype(dtype)

    ntiles = Lx // Tx
    o1, o0 = off0 - p, off0
    shapes = [(o1, Tx + 2 * p), (o0, Tx)]
    bands = []
    for o_w, nrows in shapes:
        W = np.zeros((ntiles, nrows, nrows + 2 * p))
        for t in range(1, ntiles - 1):
            base = t * Tx - off0
            for r in range(nrows):
                g = base + o_w + r
                if 0 <= g < Lx:
                    for k in range(K):
                        W[t, r, r + k] = cvx[k, g]
        bands.append(W.astype(npdt))
    WXB, WXC = bands

    gz = np.tile(pLz, Ly).reshape(1, F)
    gy = np.repeat(pLy, Lz).reshape(1, F)
    CVY = (np.repeat(cvy, Lz, axis=1) * gz).astype(npdt)
    CVZ = (np.tile(cvz, (1, Ly)) * gy).astype(npdt)
    FX = np.outer(pLy, pLz).reshape(1, F).astype(npdt)

    SXS = np.zeros((ntiles, S0, 1))
    SRC = np.zeros((ntiles, S0, 1))
    ABC = np.zeros((ntiles, S0, 1))
    for t in range(ntiles):
        base = t * Tx - off0
        for r in range(S0):
            g = base + r
            if 0 <= g < Lx:
                SXS[t, r, 0] = pLx[g]
                SRC[t, r, 0] = 1.0 if g == src_x else 0.0
                ABC[t, r, 0] = 1.0 if g == abc_x else 0.0

    W1 = np.asarray(w1_flat).reshape(1, F).astype(npdt)
    W2 = np.asarray(w2_flat).reshape(1, F).astype(npdt)
    return (WXB, WXC, CVY, CVZ, FX,
            SXS.astype(npdt), SRC.astype(npdt), ABC.astype(npdt), W1, W2)


def make_lf_step_raw(
    layout: PaddedLayout,
    c0: float,
    dtype=jnp.float32,
    precision=jax.lax.Precision.HIGHEST,
    yz_chunk: int = 9,
):
    """Fused leapfrog-step callable with runtime tables (for shard_map
    operands): ``step(u0, v0, dt, g0, g1, *tables) -> (u1, v1)`` where
    g0 = g(t), g1 = g(t + dt)."""
    p = layout.p
    Tx = layout.tile_x
    Lx, Ly, Lz = layout.padded_shape
    K = 2 * p + 1
    off0 = _off0(p)
    S0 = Tx + 2 * off0
    F = Ly * Lz
    if F % 128 != 0:
        raise ValueError(f"Ly*Lz = {F} must be a multiple of 128")
    if Tx % 8 != 0 or Tx < off0:
        raise ValueError(
            f"tile_x = {Tx} must be a multiple of 8 and >= {off0} "
            f"(the 2p-deep slab halo must stay inside the all-pad tiles)"
        )

    n1, n0 = Tx + 2 * p, Tx

    kern = functools.partial(
        _kernel_lf_step, p=p, Tx=Tx, Ly=Ly, Lz=Lz, dtype=dtype,
        c0=float(c0), precision=precision, yz_chunk=yz_chunk,
    )
    grid_n = Lx // Tx
    interpret = jax.default_backend() != "tpu"

    tile2 = lambda i: (i, 0)
    full2 = lambda i: (0, 0)
    fullF = pl.BlockSpec((1, F), full2, memory_space=pltpu.VMEM)
    vout = pl.BlockSpec((Tx, F), tile2, memory_space=pltpu.VMEM)

    def step(u0, v0, dt, g0, g1, *tables):
        (WXB, WXC, CVY, CVZ, FX, SXS, SRC, ABC, W1, W2) = tables
        scal = jnp.stack(
            [jnp.asarray(s, dtype) for s in (dt, g0, g1)]
        ).reshape(1, 3)
        outs = pl.pallas_call(
            kern,
            interpret=interpret,
            grid=(grid_n,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec((1, 3), full2, memory_space=pltpu.SMEM),
                pl.BlockSpec((1, n1, n1 + 2 * p), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, n0, n0 + 2 * p), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((K, F), full2, memory_space=pltpu.VMEM),
                pl.BlockSpec((K, F), full2, memory_space=pltpu.VMEM),
                fullF,
                pl.BlockSpec((1, S0, 1), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, S0, 1), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, S0, 1), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                fullF, fullF,
            ],
            out_specs=(vout, vout),
            out_shape=tuple(
                jax.ShapeDtypeStruct((Lx, F), dtype) for _ in range(2)
            ),
            scratch_shapes=[
                pltpu.VMEM((2, S0, F), dtype),
                pltpu.VMEM((2, S0, F), dtype),
                pltpu.VMEM((n1, F), dtype),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=128 * 1024 * 1024,
            ),
        )(
            u0.reshape(Lx, F), v0.reshape(Lx, F), scal,
            WXB, WXC, CVY, CVZ, FX, SXS, SRC, ABC, W1, W2,
        )
        u1, v1 = outs
        return u1.reshape(Lx, Ly, Lz), v1.reshape(Lx, Ly, Lz)

    return step


def make_lf_step(
    layout: PaddedLayout,
    tables: tuple,
    c0: float,
    dtype=jnp.float32,
):
    """Leapfrog-step callable ``step(u0, v0, dt, g0, g1) -> (u1, v1)``
    with tables closed over (single-device convenience)."""
    raw = make_lf_step_raw(layout, c0, dtype)
    jts = tuple(jnp.asarray(t) for t in tables)

    def step(u0, v0, dt, g0, g1):
        return raw(u0, v0, dt, g0, g1, *jts)

    return step
