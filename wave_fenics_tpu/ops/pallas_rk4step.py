"""Communication-avoiding fused RK4 STEP kernel: 4 stages, one HBM pass.

The per-stage fused kernel (ops.pallas_wave.make_rk_stage) still moves
~10 state arrays of HBM traffic per stage — 40 per step. This kernel runs
the ENTIRE classic RK4 step per x-tile in VMEM: it reads (u0, v0) slabs
once with a 3p-deep x-halo, computes all four stages on progressively
shrinking x-windows (the y/z stencils act within the resident plane, so
only the x-direction needs halo deepening), and writes (u1, v1) once:

    traffic/step:  2 reads x (Tx+2*off0)/Tx amplification + 2 writes
                   ~ 8 arrays at Tx=16, p=4   (vs 40)

This is the overlap/fusion idea of the reference's update_fwd_begin/end
split (demo/gpu_scatter_mpi/VectorUpdater.hpp:106-143) taken to its
TPU-native conclusion: instead of overlapping communication with compute,
recompute the small x-halo region locally and eliminate the intermediate
traffic entirely (communication-avoiding time stepping).

Semantics per stage j (a = [0, 1/2, 1/2, 1], b = [1/6, 1/3, 1/3, 1/6];
LinearGLL.hpp:233-287 Butcher tableau):

    un_j = u0 + dt a_j ku_{j-1}        ku_j = vn_j = v0 + dt a_j kv_{j-1}
    kv_j = A un_j + c0^2 g_j W1 + (-c0) W2 . vn_j     (on the x-face rows)
    u1   = u0 + dt sum_j b_j ku_j      v1 = v0 + dt sum_j b_j kv_j

A = -c0^2 K/m is the separable stiffness with 1/m folded in
(ops.pallas_wave axis tables). Valid-window bookkeeping (slab offsets,
output rows [o0, o0+Tx)):

    u0, v0 needed at halo 3p   -> slab rows [o0-3p, o0+Tx+3p)
    kv0, vn1, un1, un2 at 2p; kv1, kv2, vn2, un3, vn3 at p; kv3 at 0.

All x-windows are static major-dim slices (cheap); wraparound of y/z lane
rolls lands on zero-coefficient pad outputs exactly as in the per-stage
kernel; every intermediate preserves the zero-padding invariant because
states are zero in the pad and A produces zeros there.
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
    "build_step_tables",
    "build_step_tables_from_cv",
    "make_rk4_step",
    "make_rk4_step_raw",
]

_RK_A = (0.0, 0.5, 0.5, 1.0)
_RK_B = (1.0 / 6.0, 1.0 / 3.0, 1.0 / 3.0, 1.0 / 6.0)


def _off0(p: int) -> int:
    """Slab x-halo depth: >= 3p, 8-aligned (2D DMA sublane rule)."""
    return -(-3 * p // 8) * 8


def _kernel_rk4_step(
    u0_hbm, v0_hbm, scal_ref,
    wxa_ref, wxb_ref, wxc_ref, cvy_ref, cvz_ref,
    fx_ref, sxs_ref, src_ref, abc_ref, w1_ref, w2_ref,
    u1_out, v1_out,
    slab_u, slab_v, acc_ref, accu_ref, accv_ref, sem_u, sem_v,
    *, p, Tx, Ly, Lz, dtype, c0, precision=jax.lax.Precision.HIGHEST,
    ablate=frozenset(), yz_chunk=1,
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
    g = (scal_ref[0, 1], scal_ref[0, 2], scal_ref[0, 3], scal_ref[0, 4])
    c0sq = jnp.asarray(c0 * c0, dtype)
    mc0 = jnp.asarray(-c0, dtype)

    # slab offsets of the halo windows (o3 ⊃ o2 ⊃ o1 ⊃ o0)
    o3, o2, o1, o0 = off0 - 3 * p, off0 - 2 * p, off0 - p, off0
    n3, n2, n1, n0 = Tx + 6 * p, Tx + 4 * p, Tx + 2 * p, Tx

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
            """A x on output rows [o, o+nrows): xin = x on [o-p, o+nrows+p).

            y/z stencils: the line factors (gz, gy) are folded into the
            CVY/CVZ tables at build time, so both directions share ONE
            accumulator and the per-term products need no extra line
            multiply. ``yz_chunk`` groups that many roll-terms into a
            single value expression between accumulator-ref updates
            (fewer VMEM round-trips of the accumulator; the stencil is
            VMEM-traffic-bound, measured ~47% of the step)."""
            xc = xin[p : p + nrows]
            sx = sxs_ref[0, o : o + nrows]
            if "x" in ablate:
                out = xc * fx_ref[:]
            else:
                tx = jnp.einsum(
                    "os,sf->of", wx_ref[0], xin,
                    preferred_element_type=f32, precision=precision,
                ).astype(dtype)
                out = tx * fx_ref[:]
            terms = []
            if "y" not in ablate:
                terms += [(cvy_ref, k, ((p - k) * Lz) % F) for k in range(K)]
            if "z" not in ablate:
                terms += [(cvz_ref, k, (p - k) % F) for k in range(K)]
            if terms:
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

        def bc(kv, vn, gj, o, nrows):
            """Source + ABC plane terms masked to their global x-rows."""
            src = src_ref[0, o : o + nrows]
            abc = abc_ref[0, o : o + nrows]
            return kv + (c0sq * gj) * (src * w1_ref[:]) + mc0 * (
                abc * w2_ref[:]
            ) * vn

        # stage 0: kv0 on W2
        kv0 = bc(apply_A(U0[o3 : o3 + n2 + 2 * p], wxa_ref, o2, n2),
                 V0[o2 : o2 + n2], g[0], o2, n2)
        accu_ref[:] = _RK_B[0] * V0[o0 : o0 + n0]
        accv_ref[:] = _RK_B[0] * kv0[o0 - o2 : o0 - o2 + n0]

        # stage 1: un1/vn1 on W2, kv1 on W1
        ca = _RK_A[1] * dt
        un1 = U0[o2 : o2 + n2] + ca * V0[o2 : o2 + n2]
        vn1 = V0[o2 : o2 + n2] + ca * kv0
        kv1 = bc(apply_A(un1, wxb_ref, o1, n1),
                 vn1[o1 - o2 : o1 - o2 + n1], g[1], o1, n1)
        accu_ref[:] += _RK_B[1] * vn1[o0 - o2 : o0 - o2 + n0]
        accv_ref[:] += _RK_B[1] * kv1[o0 - o1 : o0 - o1 + n0]

        # stage 2: un2 on W2 (input to A), vn2 on W1, kv2 on W1
        ca = _RK_A[2] * dt
        un2 = U0[o2 : o2 + n2] + ca * vn1
        vn2 = V0[o1 : o1 + n1] + ca * kv1
        kv2 = bc(apply_A(un2, wxb_ref, o1, n1), vn2, g[2], o1, n1)
        accu_ref[:] += _RK_B[2] * vn2[o0 - o1 : o0 - o1 + n0]
        accv_ref[:] += _RK_B[2] * kv2[o0 - o1 : o0 - o1 + n0]

        # stage 3: un3/vn3 on W1, kv3 on W0
        ca = _RK_A[3] * dt
        un3 = U0[o1 : o1 + n1] + ca * vn2
        vn3 = V0[o1 : o1 + n1] + ca * kv2
        kv3 = bc(apply_A(un3, wxc_ref, o0, n0),
                 vn3[o0 - o1 : o0 - o1 + n0], g[3], o0, n0)
        accu_ref[:] += _RK_B[3] * vn3[o0 - o1 : o0 - o1 + n0]
        accv_ref[:] += _RK_B[3] * kv3

        u1_out[:] = U0[o0 : o0 + n0] + dt * accu_ref[:]
        v1_out[:] = V0[o0 : o0 + n0] + dt * accv_ref[:]


def _kernel_rk4_step_lean(
    u0_hbm, v0_hbm, scal_ref, flags_ref,
    wxa_ref, wxb_ref, wxc_ref, cvy_ref, cvz_ref,
    fx_ref, sxs_ref, src_ref, abc_ref, w1_ref, w2_ref,
    u1_out, v1_out,
    slab_u, slab_v, acc_ref, kv0_ref, kv1_ref, kv2_ref, kv3_ref,
    sem_u, sem_v,
    *, p, Tx, Ly, Lz, dtype, c0, precision=jax.lax.Precision.HIGHEST,
    yz_chunk=9,
):
    """Compute-lean RK4 step: same scheme as :func:`_kernel_rk4_step`
    (classic RK4, LinearGLL.hpp:233-287 Butcher tableau) with the
    elementwise stage arithmetic algebraically collapsed. For the
    linear system u' = v, v' = A u + g(t) S + D v the tableau reduces
    exactly to

        un1 = u0 + dt/2 v0          un2 = un1 + dt^2/4 kv0
        un3 = (u0 + dt v0) + dt^2/2 kv1
        u1  = (u0 + dt v0) + dt^2/6 (kv0 + kv1 + kv2)
        v1  = v0 + dt/6 (kv0 + 2 kv1 + 2 kv2 + kv3)

    so the running b_j-weighted accumulators (8 full-window passes) and
    the vn_j formations disappear; vn_j is only ever needed inside the
    ABC damping term, which — like the source term — is a face-plane
    rank-1 update that is zero on most x-tiles and is applied under
    ``pl.when`` only on tiles whose slab window contains the face row
    (the round-5b bisection showed the step kernel is compute-bound;
    docs/BENCH_NOTES.md). The k=p taps of the y and z stencils share a
    shift of 0 and are merged into one term (coefficient add on [1, F]).
    f32 results differ from the reference kernel at association-order
    ulp level only (tests pin the agreement)."""
    ix = pl.program_id(0)
    n = pl.num_programs(0)
    off0 = _off0(p)
    S0 = Tx + 2 * off0
    K = 2 * p + 1
    F = Ly * Lz
    is_pad = jnp.logical_or(ix == 0, ix == n - 1)
    f32 = jnp.float32 if dtype != jnp.float64 else jnp.float64
    dt = scal_ref[0, 0]
    g = (scal_ref[0, 1], scal_ref[0, 2], scal_ref[0, 3], scal_ref[0, 4])
    c0sq = jnp.asarray(c0 * c0, dtype)
    mc0 = jnp.asarray(-c0, dtype)
    half = jnp.asarray(0.5, dtype)
    dt2 = dt * dt

    o3, o2, o1, o0 = off0 - 3 * p, off0 - 2 * p, off0 - p, off0
    n2, n1, n0 = Tx + 4 * p, Tx + 2 * p, Tx

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
        # per-tile face-row presence, precomputed XLA-side into SMEM.
        # The whole [grid_n, 2] table is resident (a blocked (1, 2)
        # spec violates the (8, 128)-divisibility rule on real Mosaic;
        # SMEM scalar loads take the dynamic program id directly).
        has_src = flags_ref[ix, 0] > 0
        has_abc = flags_ref[ix, 1] > 0

        def apply_A(xin, wx_ref, o, nrows):
            """A x on output rows [o, o+nrows); xin = x on
            [o-p, o+nrows+p). Same roll-chunked y/z stencil as the
            reference kernel, with the two shift-0 taps merged."""
            xc = xin[p : p + nrows]
            sx = sxs_ref[0, o : o + nrows]
            tx = jnp.einsum(
                "os,sf->of", wx_ref[0], xin,
                preferred_element_type=f32, precision=precision,
            ).astype(dtype)
            out = tx * fx_ref[:]
            cv0 = (cvy_ref[p] + cvz_ref[p])[None, :]
            terms = [(cvy_ref, k, ((p - k) * Lz) % F)
                     for k in range(K) if k != p]
            terms += [(cvz_ref, k, (p - k) % F)
                      for k in range(K) if k != p]
            first = True
            e0 = cv0 * xc
            for i in range(0, len(terms), yz_chunk):
                e = e0 if i == 0 else None
                for ref, k, sh in terms[i : i + yz_chunk]:
                    t = ref[k][None, :] * pltpu.roll(xc, sh, 1)
                    e = t if e is None else e + t
                if first:
                    acc_ref[0:nrows] = e
                    first = False
                else:
                    acc_ref[0:nrows] += e
            out += acc_ref[0:nrows] * sx
            return out

        def face_terms(kv_ref, gj, vn_fn, o, nrows):
            """Source + ABC rank-1 face updates, skipped on tiles whose
            slab window has no face row (mask identically zero). vn_fn
            is evaluated lazily so the vn formation itself is also
            skipped on non-face tiles."""
            @pl.when(has_src)
            def _():
                src = src_ref[0, o : o + nrows]
                kv_ref[0:nrows] += (c0sq * gj) * (src * w1_ref[:])

            @pl.when(has_abc)
            def _():
                abc = abc_ref[0, o : o + nrows]
                kv_ref[0:nrows] += mc0 * (abc * w2_ref[:]) * vn_fn()

        # stage 0
        kv0_ref[:] = apply_A(U0[o3 : o3 + n2 + 2 * p], wxa_ref, o2, n2)
        face_terms(kv0_ref, g[0], lambda: V0[o2 : o2 + n2], o2, n2)

        # stage 1
        un1 = U0[o2 : o2 + n2] + (half * dt) * V0[o2 : o2 + n2]
        kv1_ref[:] = apply_A(un1, wxb_ref, o1, n1)
        face_terms(
            kv1_ref, g[1],
            lambda: V0[o1 : o1 + n1]
            + (half * dt) * kv0_ref[o1 - o2 : o1 - o2 + n1],
            o1, n1,
        )

        # stage 2
        un2 = un1 + (jnp.asarray(0.25, dtype) * dt2) * kv0_ref[:]
        kv2_ref[:] = apply_A(un2, wxb_ref, o1, n1)
        face_terms(
            kv2_ref, g[2],
            lambda: V0[o1 : o1 + n1] + (half * dt) * kv1_ref[:],
            o1, n1,
        )

        # stage 3
        w = U0[o1 : o1 + n1] + dt * V0[o1 : o1 + n1]
        un3 = w + (half * dt2) * kv1_ref[:]
        kv3_ref[:] = apply_A(un3, wxc_ref, o0, n0)
        face_terms(
            kv3_ref, g[3],
            lambda: V0[o0 : o0 + n0]
            + dt * kv2_ref[o0 - o1 : o0 - o1 + n0],
            o0, n0,
        )

        c2, c1 = o0 - o2, o0 - o1
        s2 = (kv0_ref[c2 : c2 + n0] + kv1_ref[c1 : c1 + n0]
              + kv2_ref[c1 : c1 + n0])
        u1_out[:] = w[c1 : c1 + n0] + (dt2 / 6.0) * s2
        v1_out[:] = V0[o0 : o0 + n0] + (dt / 6.0) * (
            s2 + kv1_ref[c1 : c1 + n0] + kv2_ref[c1 : c1 + n0]
            + kv3_ref[:]
        )


def build_step_tables(
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
    """Static tables for the fused-step kernel.

    Returns (WXA, WXB, WXC, CVY, CVZ, FX, GZ, GY, SXS, SRC, ABC, W1, W2):
    per-tile band matrices for the three distinct window shapes, the
    flattened-plane stencil/line tables, slab-aligned SX / source / ABC
    row masks, and the 1/m-premultiplied facet-weight planes.
    """
    cvx, cvy, cvz, pLx, pLy, pLz = axis_cv_tables(
        layout, A, lines, coeff, inv_m_lines
    )
    return build_step_tables_from_cv(
        layout, cvx, cvy, cvz, pLx, pLy, pLz,
        w1_flat, w2_flat, src_x, abc_x, dtype,
    )


def build_step_tables_from_cv(
    layout: PaddedLayout,
    cvx: np.ndarray, cvy: np.ndarray, cvz: np.ndarray,
    pLx: np.ndarray, pLy: np.ndarray, pLz: np.ndarray,
    w1_flat: np.ndarray,
    w2_flat: np.ndarray,
    src_x: int,
    abc_x: int,
    dtype=jnp.float32,
) -> tuple[np.ndarray, ...]:
    """Step tables from pre-built padded coefficient/line vectors.

    Used directly by the distributed value-halo path, which slices GLOBAL
    assembled vectors per device (halo regions carry the true neighbor
    coefficients instead of single-device face corrections). ``src_x`` /
    ``abc_x`` are padded x-rows, or -1 when the face is not on this block.

    The flattened-plane line factors (gz = tile(pLz), gy = repeat(pLy))
    are folded into the CVY/CVZ stencil tables so the kernel's y/z
    directions share one accumulator with no per-direction line multiply.
    """
    Nx, Ny, Nz = layout.shape
    p = layout.p
    Tx = layout.tile_x
    Lx, Ly, Lz = layout.padded_shape
    K = 2 * p + 1
    off0 = _off0(p)
    S0 = Tx + 2 * off0
    F = Ly * Lz
    npdt = np.dtype(dtype)

    ntiles = Lx // Tx
    o2, o1, o0 = off0 - 2 * p, off0 - p, off0
    shapes = [(o2, Tx + 4 * p), (o1, Tx + 2 * p), (o0, Tx)]
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
    WXA, WXB, WXC = bands

    gz = np.tile(pLz, Ly).reshape(1, F)
    gy = np.repeat(pLy, Lz).reshape(1, F)
    CVY = (np.repeat(cvy, Lz, axis=1) * gz).astype(npdt)  # [K, F], gz folded
    CVZ = (np.tile(cvz, (1, Ly)) * gy).astype(npdt)       # [K, F], gy folded
    FX = np.outer(pLy, pLz).reshape(1, F).astype(npdt)

    # slab-aligned row tables: SXS[t, r] = SX[t*Tx - off0 + r]
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
    return (WXA, WXB, WXC, CVY, CVZ, FX,
            SXS.astype(npdt), SRC.astype(npdt), ABC.astype(npdt), W1, W2)


def make_rk4_step_raw(
    layout: PaddedLayout,
    c0: float,
    dtype=jnp.float32,
    precision=jax.lax.Precision.HIGHEST,
    ablate: frozenset = frozenset(),
    yz_chunk: int = 9,
    lean: bool | None = None,
):
    """Fused-step callable with runtime tables (for shard_map operands):
    ``step(u0, v0, dt, g0, g1, g2, g3, *tables) -> (u1, v1)``.

    ``lean`` selects :func:`_kernel_rk4_step_lean` (collapsed stage
    algebra, pl.when face terms, merged shift-0 stencil tap) — same
    scheme and tables, f32 ulp-order differences only. Default (None)
    resolves to True — the lean kernel is chip-validated production
    (r5c: 1.309 ms/step at tile 48 vs 1.400 reference, on-chip
    agreement 7.1e-7; docs/BENCH_NOTES.md round 5c) — unless
    WAVE_FENICS_STEP_LEAN=0 opts back into the reference kernel."""
    import os

    if lean is None:
        lean = os.environ.get("WAVE_FENICS_STEP_LEAN", "1") == "1"
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
            f"(the 3p-deep slab halo must stay inside the all-pad x tiles)"
        )

    n2, n1, n0 = Tx + 4 * p, Tx + 2 * p, Tx

    if lean:
        if ablate:
            raise ValueError("ablate is only supported by the reference "
                             "kernel (lean=False)")
        kern = functools.partial(
            _kernel_rk4_step_lean, p=p, Tx=Tx, Ly=Ly, Lz=Lz, dtype=dtype,
            c0=float(c0), precision=precision, yz_chunk=yz_chunk,
        )
        scratch = [
            pltpu.VMEM((2, S0, F), dtype),
            pltpu.VMEM((2, S0, F), dtype),
            pltpu.VMEM((n2, F), dtype),
            pltpu.VMEM((n2, F), dtype),
            pltpu.VMEM((n1, F), dtype),
            pltpu.VMEM((n1, F), dtype),
            pltpu.VMEM((n0, F), dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ]
    else:
        kern = functools.partial(
            _kernel_rk4_step, p=p, Tx=Tx, Ly=Ly, Lz=Lz, dtype=dtype,
            c0=float(c0), precision=precision, ablate=frozenset(ablate),
            yz_chunk=yz_chunk,
        )
        scratch = [
            pltpu.VMEM((2, S0, F), dtype),
            pltpu.VMEM((2, S0, F), dtype),
            pltpu.VMEM((n2, F), dtype),
            pltpu.VMEM((Tx, F), dtype),
            pltpu.VMEM((Tx, F), dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ]
    grid_n = Lx // Tx
    interpret = jax.default_backend() != "tpu"

    tile2 = lambda i: (i, 0)
    full2 = lambda i: (0, 0)
    fullF = pl.BlockSpec((1, F), full2, memory_space=pltpu.VMEM)
    vout = pl.BlockSpec((Tx, F), tile2, memory_space=pltpu.VMEM)

    def step(u0, v0, dt, g0, g1, g2, g3, *tables):
        (WXA, WXB, WXC, CVY, CVZ, FX, SXS, SRC, ABC, W1, W2) = tables
        scal = jnp.stack(
            [jnp.asarray(s, dtype) for s in (dt, g0, g1, g2, g3)]
        ).reshape(1, 5)
        extra_in, extra_specs = (), ()
        if lean:
            flags = jnp.stack(
                [
                    (jnp.max(jnp.abs(SRC.reshape(grid_n, -1)), axis=1)
                     > 0).astype(jnp.int32),
                    (jnp.max(jnp.abs(ABC.reshape(grid_n, -1)), axis=1)
                     > 0).astype(jnp.int32),
                ],
                axis=1,
            )
            extra_in = (flags,)
            extra_specs = (
                pl.BlockSpec((grid_n, 2), full2,
                             memory_space=pltpu.SMEM),
            )
        outs = pl.pallas_call(
            kern,
            interpret=interpret,
            grid=(grid_n,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec((1, 5), full2, memory_space=pltpu.SMEM),
            ] + list(extra_specs) + [
                pl.BlockSpec((1, n2, n2 + 2 * p), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
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
            scratch_shapes=scratch,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=128 * 1024 * 1024,
            ),
        )(
            u0.reshape(Lx, F), v0.reshape(Lx, F), scal, *extra_in,
            WXA, WXB, WXC, CVY, CVZ, FX, SXS, SRC, ABC, W1, W2,
        )
        u1, v1 = outs
        return u1.reshape(Lx, Ly, Lz), v1.reshape(Lx, Ly, Lz)

    return step


def make_rk4_step(
    layout: PaddedLayout,
    tables: tuple,
    c0: float,
    dtype=jnp.float32,
    lean: bool | None = None,
):
    """Fused-step callable ``step(u0, v0, dt, g0, g1, g2, g3) -> (u1, v1)``
    on padded 3D arrays, with ``tables`` (from :func:`build_step_tables`)
    closed over as constants (single-device convenience). ``lean=None``
    resolves as in :func:`make_rk4_step_raw` (default: lean kernel)."""
    raw = make_rk4_step_raw(layout, c0, dtype, lean=lean)
    jts = tuple(jnp.asarray(t) for t in tables)

    def step(u0, v0, dt, g0, g1, g2, g3):
        return raw(u0, v0, dt, g0, g1, g2, g3, *jts)

    return step
