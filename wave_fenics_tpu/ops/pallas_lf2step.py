"""Temporal-blocked leapfrog kernel: TWO timesteps per HBM pass.

ops.pallas_lfstep reads (u0, v0) and writes (u1, v1) once per step — at
Tx=32/p=4 that is ~5 slab-amplified state arrays/step and measures
0.87 ms/step (4.90 GDoF*steps/s), within ~25% of the pass floor. The
remaining lever is temporal blocking: integrate s=2 leapfrog steps per
tile while the state sits in VMEM, amortizing the HBM pass over both.

Per output tile (rows [0, Tx) in global coords), with windows in slab
coordinates (off0 >= 3p, 8-aligned):

    A-window  [-2p, Tx+2p)   vplus1 = (v0 + dt2*F0)/(1 + dt2*D)
                             u1     = u0 + dt*vplus1
    B-window  [-p,  Tx+p)    F1     = A u1 + c0^2 g1 src W1
                             v1     = (1 - dt2*D)*vplus1 + dt2*F1
                             vplus2 = (v1 + dt2*F1)/(1 + dt2*D)
                             u2     = u1 + dt*vplus2
    out rows  [0,  Tx)       F2     = A u2 + c0^2 g2 src W1
                             v2     = (1 - dt2*D)*vplus2 + dt2*F2

The step-boundary force is computed ONCE: the leapfrog recurrence uses
F(t+dt) both to close step 1 and to open step 2 (solvers/leapfrog.py —
F is a pure function of (t, u)), and inside the kernel that reuse is
free. Stencil row-work per 2 steps is therefore (Tx+4p) + (Tx+2p) + Tx
vs the single-step kernel's 2*((Tx+2p) + Tx) — LESS work per step —
while state traffic drops from (2*(Tx+2p') + 2*Tx)/Tx to
(2*(Tx+2*off0) + 2*Tx)/(2*Tx) arrays/step (~3 vs ~5 at Tx=32, p=4).

Wedge recomputation note: neighboring tiles both evaluate step-1 values
on their overlapping halo rows; the evaluations are identical real
arithmetic but run at different matmul window offsets, so (u2, v2) may
differ from the single-step kernel at ulp level — the same class of
reassociation the distributed value-halo path canonicalizes. Tests pin
agreement at 1e-6 f32 / 1e-12 f64 against the XLA integrator.

Table semantics follow ops.pallas_lfstep (banded x windows per tile,
folded-line y/z roll stencils, slab-aligned row masks); only the window
shapes and the 3p slab halo differ. Reference physics:
common/LinearGLL.hpp:141-192 (this kernel is an optional integrator —
the reference's RK4 loop, LinearGLL.hpp:198-287, remains the parity
metric).
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
    "build_lf2_tables",
    "build_lf2_tables_from_cv",
    "make_lf2_step",
    "make_lf2_step_raw",
]


def _off0(p: int) -> int:
    """Slab x-halo depth: >= 3p (two nested stencil windows + the
    A-window's own apply halo), 8-aligned (2D DMA sublane rule)."""
    return -(-3 * p // 8) * 8


def _kernel_lf2_step(
    u0_hbm, v0_hbm, scal_ref,
    wxa_ref, wxb_ref, wxc_ref, cvy_ref, cvz_ref,
    fx_ref, sxs_ref, src_ref, abc_ref, w1_ref, w2_ref,
    u2_out, v2_out,
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
    g2 = scal_ref[0, 3]
    dt2 = dt * jnp.asarray(0.5, dtype)
    c0sq = jnp.asarray(c0 * c0, dtype)
    pc0 = jnp.asarray(c0, dtype)
    one = jnp.asarray(1.0, dtype)

    oA, oB, oC = off0 - 2 * p, off0 - p, off0
    nA, nB, nC = Tx + 4 * p, Tx + 2 * p, Tx

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
        u2_out[:] = jnp.zeros((Tx, F), dtype=dtype)
        v2_out[:] = jnp.zeros((Tx, F), dtype=dtype)

    @pl.when(jnp.logical_not(is_pad))
    def _():
        dma(u0_hbm, slab_u, sem_u, ix % 2, ix).wait()
        dma(v0_hbm, slab_v, sem_v, ix % 2, ix).wait()
        U0 = slab_u[ix % 2]  # [S0, F]
        V0 = slab_v[ix % 2]

        def apply_A(xin, wx_ref, o, nrows):
            """A x on output rows [o, o+nrows); xin = x on [o-p, o+nrows+p).
            Same structure as ops.pallas_lfstep._kernel_lf_step.apply_A."""
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

        # ---- step 1 on the A-window -------------------------------
        F0 = force(apply_A(U0[oA - p : oA - p + nA + 2 * p], wxa_ref,
                           oA, nA), g0, oA, nA)
        DA = damp(oA, nA)
        vplus1 = (V0[oA : oA + nA] + dt2 * F0) / (one + dt2 * DA)
        u1 = U0[oA : oA + nA] + dt * vplus1

        # ---- step boundary: F1 once on the B-window ---------------
        sAB = oB - oA
        F1 = force(apply_A(u1, wxb_ref, oB, nB), g1, oB, nB)
        DB = damp(oB, nB)
        vp1B = vplus1[sAB : sAB + nB]
        v1 = (one - dt2 * DB) * vp1B + dt2 * F1

        # ---- step 2 on the B-window --------------------------------
        vplus2 = (v1 + dt2 * F1) / (one + dt2 * DB)
        u2 = u1[sAB : sAB + nB] + dt * vplus2

        # ---- close step 2 on the output rows -----------------------
        sBC = oC - oB
        F2 = force(apply_A(u2, wxc_ref, oC, nC), g2, oC, nC)
        v2_out[:] = (
            (one - dt2 * damp(oC, nC)) * vplus2[sBC : sBC + nC]
            + dt2 * F2
        )
        u2_out[:] = u2[sBC : sBC + nC]


def build_lf2_tables(
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
    """Static tables for the 2-step leapfrog kernel. Returns
    (WXA, WXB, WXC, CVY, CVZ, FX, SXS, SRC, ABC, W1, W2)."""
    cvx, cvy, cvz, pLx, pLy, pLz = axis_cv_tables(
        layout, A, lines, coeff, inv_m_lines
    )
    return build_lf2_tables_from_cv(
        layout, cvx, cvy, cvz, pLx, pLy, pLz,
        w1_flat, w2_flat, src_x, abc_x, dtype,
    )


def build_lf2_tables_from_cv(
    layout: PaddedLayout,
    cvx: np.ndarray, cvy: np.ndarray, cvz: np.ndarray,
    pLx: np.ndarray, pLy: np.ndarray, pLz: np.ndarray,
    w1_flat: np.ndarray,
    w2_flat: np.ndarray,
    src_x: int,
    abc_x: int,
    dtype=jnp.float32,
) -> tuple[np.ndarray, ...]:
    """2-step leapfrog tables from pre-built padded coefficient/line
    vectors (mirrors ops.pallas_lfstep.build_lf_tables_from_cv with the
    three window shapes and the 3p slab halo)."""
    p = layout.p
    Tx = layout.tile_x
    Lx, Ly, Lz = layout.padded_shape
    K = 2 * p + 1
    off0 = _off0(p)
    S0 = Tx + 2 * off0
    F = Ly * Lz
    npdt = np.dtype(dtype)

    ntiles = Lx // Tx
    oA, oB, oC = off0 - 2 * p, off0 - p, off0
    shapes = [(oA, Tx + 4 * p), (oB, Tx + 2 * p), (oC, Tx)]
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
    return (WXA, WXB, WXC, CVY, CVZ, FX,
            SXS.astype(npdt), SRC.astype(npdt), ABC.astype(npdt), W1, W2)


def make_lf2_step_raw(
    layout: PaddedLayout,
    c0: float,
    dtype=jnp.float32,
    precision=jax.lax.Precision.HIGHEST,
    yz_chunk: int = 9,
):
    """2-step leapfrog callable with runtime tables:
    ``step2(u0, v0, dt, g0, g1, g2) -> (u2, v2)`` where gj = g(t + j*dt).
    Advances TWO leapfrog steps of size dt."""
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
            f"(the 3p-deep slab halo must stay inside the all-pad tiles)"
        )

    nA, nB, nC = Tx + 4 * p, Tx + 2 * p, Tx

    kern = functools.partial(
        _kernel_lf2_step, p=p, Tx=Tx, Ly=Ly, Lz=Lz, dtype=dtype,
        c0=float(c0), precision=precision, yz_chunk=yz_chunk,
    )
    grid_n = Lx // Tx
    interpret = jax.default_backend() != "tpu"

    full2 = lambda i: (0, 0)
    fullF = pl.BlockSpec((1, F), full2, memory_space=pltpu.VMEM)
    vout = pl.BlockSpec((Tx, F), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)

    def band_spec(nrows):
        return pl.BlockSpec((1, nrows, nrows + 2 * p),
                            lambda i: (i, 0, 0), memory_space=pltpu.VMEM)

    def mask_spec():
        return pl.BlockSpec((1, S0, 1), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)

    def step2(u0, v0, dt, g0, g1, g2, *tables):
        (WXA, WXB, WXC, CVY, CVZ, FX, SXS, SRC, ABC, W1, W2) = tables
        scal = jnp.stack(
            [jnp.asarray(s, dtype) for s in (dt, g0, g1, g2)]
        ).reshape(1, 4)
        outs = pl.pallas_call(
            kern,
            interpret=interpret,
            grid=(grid_n,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec((1, 4), full2, memory_space=pltpu.SMEM),
                band_spec(nA), band_spec(nB), band_spec(nC),
                pl.BlockSpec((K, F), full2, memory_space=pltpu.VMEM),
                pl.BlockSpec((K, F), full2, memory_space=pltpu.VMEM),
                fullF,
                mask_spec(), mask_spec(), mask_spec(),
                fullF, fullF,
            ],
            out_specs=(vout, vout),
            out_shape=tuple(
                jax.ShapeDtypeStruct((Lx, F), dtype) for _ in range(2)
            ),
            scratch_shapes=[
                pltpu.VMEM((2, S0, F), dtype),
                pltpu.VMEM((2, S0, F), dtype),
                pltpu.VMEM((nA, F), dtype),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=128 * 1024 * 1024,
            ),
        )(
            u0.reshape(Lx, F), v0.reshape(Lx, F), scal,
            WXA, WXB, WXC, CVY, CVZ, FX, SXS, SRC, ABC, W1, W2,
        )
        u2, v2 = outs
        return u2.reshape(Lx, Ly, Lz), v2.reshape(Lx, Ly, Lz)

    return step2


def make_lf2_step(
    layout: PaddedLayout,
    tables: tuple,
    c0: float,
    dtype=jnp.float32,
):
    """2-step leapfrog callable ``step2(u0, v0, dt, g0, g1, g2) ->
    (u2, v2)`` with tables closed over (single-device convenience)."""
    raw = make_lf2_step_raw(layout, c0, dtype)
    jts = tuple(jnp.asarray(t) for t in tables)

    def step2(u0, v0, dt, g0, g1, g2):
        return raw(u0, v0, dt, g0, g1, g2, *jts)

    return step2
