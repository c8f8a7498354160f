"""Fused unstructured-dofmap operators: one Pallas pass per matvec.

TPU-native equivalent of the reference's device operators on arbitrary
(imported) meshes — the fused CUDA mass kernel common/cuda/mass.hpp:74-95
(gather -> sum-factorized contraction -> atomicAdd scatter) and the
stiffness skernel common/operators.hpp:112-133 — built from the window/
chain tables of ops.general_tables:

  per batch (grid step, sequential on the TensorCore):
    1. DMA the contiguous dof window x[start*128 : (start+H)*128] to VMEM
    2. gather chains (pairs of Mosaic dynamic_gathers) -> packed element
       tile XE [H, 128] (cpr cells per row)
    3. contraction:
       - spectral/collocated mass: XE * detJw (elementwise)
       - stiffness: ye = coeff * sum_{d,d'} D_d^T (G[dd'] * (D_d' XE))
         as six static [128,128] MXU matmuls (block-diag I_cpr x axis-D)
         plus elementwise multiplies with the 6 symmetric G entries
    4. scatter chains -> window contribution Yw [H, 128]
    5. read-modify-write DMA accumulation into the output window
       (grid steps are sequential, so overlapping windows are race-free)

Everything the reference does with scattered-address hardware is here
dense VPU/MXU work + contiguous DMA; deterministic by construction (fixed
chain order), no atomics.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .general_tables import GeneralBatchTables

__all__ = ["make_general_apply", "make_general_call",
           "contraction_matrices"]

_LANES = 128


def _mxu_precision():
    """Contraction matmul precision. HIGHEST (6 bf16 passes) is the
    validated default (CLAUDE.md: DEFAULT f32 = bf16 passes, 8e-3 rel
    err). The general kernel is chain-VPU/MXU-bound (not HBM-bound), so
    HIGHEST's passes are NOT free here — WAVE_FENICS_TPU_MXU=high selects
    the 3-pass bf16_3x form for the measured-accuracy A/B
    (experiments/exp_round4_batch.py); production stays HIGHEST unless
    the A/B records both a real win and f64-checked accuracy."""
    import os

    if os.environ.get("WAVE_FENICS_TPU_MXU", "").lower() == "high":
        # Measured (round 4, on chip): Mosaic's dot lowering rejects
        # Precision.HIGH inside pallas kernels (NotImplementedError:
        # Unsupported dot precision: HIGH) — the 3-pass form is not
        # expressible in-kernel on this platform. Keep the knob (it
        # documents the attempted A/B) but fall back loudly.
        import warnings

        warnings.warn(
            "WAVE_FENICS_TPU_MXU=high: Mosaic does not lower "
            "Precision.HIGH inside pallas kernels; using HIGHEST "
            "(docs/BENCH_NOTES.md round 4).",
            stacklevel=2,
        )
    return jax.lax.Precision.HIGHEST


def _take_lanes(x, idx):
    """Lane-wise dynamic gather restricted to [<=128, 128] blocks — the
    one shape the platform's Mosaic compiler handles reliably (larger
    sublane counts and >128 lanes crash or hang it; docs/BENCH_NOTES.md
    round 3). Splits the sublane dim into 128-row blocks."""
    rows = x.shape[0]
    if rows <= _LANES:
        return jnp.take_along_axis(x, idx, axis=1)
    parts = [
        jnp.take_along_axis(
            x[h : h + _LANES], idx[h : h + _LANES], axis=1
        )
        for h in range(0, rows, _LANES)
    ]
    return jnp.concatenate(parts, axis=0)


def contraction_matrices(p: int, cpr: int, D1: np.ndarray,
                         dtype=np.float32, rpc: int = 1) -> np.ndarray:
    """Static [3, 128, 128] per-axis derivative matrices for the packed
    element layout: M[d] = I_cpr kron (axis-d application of D1 on the
    C-ordered (i,j,k) node index), zero-padded to 128 lanes.

    ``(XE @ M[d].T)[r, lb+n'] = (axis-d D-contraction of the cell packed
    at (r, lb))[n']``.

    ``rpc > 1`` (split-row cells, nd > 128): returns the
    [3*rpc*rpc, 128, 128] half-block decomposition
    ``out[(d*rpc + ho)*rpc + hi][n', n] = M[d][ho*npl + n', hi*npl + n]``
    so the kernel contracts per (output-half, input-half) pair of the
    split element rows (cpr must be 1).
    """
    m = p + 1
    nd = m**3
    eye = np.eye(m)
    mats = [
        np.kron(np.kron(D1, eye), eye),  # x: i index (slowest)
        np.kron(np.kron(eye, D1), eye),  # y: j index
        np.kron(eye, np.kron(eye, D1)),  # z: k index (fastest)
    ]
    if rpc > 1:
        if cpr != 1:
            raise ValueError("split-row cells require cpr == 1")
        npl = -(-nd // rpc)
        out = np.zeros((3 * rpc * rpc, _LANES, _LANES),
                       dtype=np.dtype(dtype))
        for d in range(3):
            for ho in range(rpc):
                for hi in range(rpc):
                    blk = mats[d][
                        ho * npl : min((ho + 1) * npl, nd),
                        hi * npl : min((hi + 1) * npl, nd),
                    ]
                    out[(d * rpc + ho) * rpc + hi,
                        : blk.shape[0], : blk.shape[1]] = blk
        return out
    out = np.zeros((3, _LANES, _LANES), dtype=np.dtype(dtype))
    for d in range(3):
        for g in range(cpr):
            s = g * nd
            out[d, s : s + nd, s : s + nd] = mats[d]
    return out


def interpolation_tiles(cpr: int, nd: int, B: np.ndarray,
                        dtype=np.float32, rpc: int = 1,
                        npl: int | None = None) -> np.ndarray:
    """Block-diagonal node->quadrature interpolation tiles for the packed
    element layout, non-collocated quadrature (nq != nd).

    ``B`` is the 3D interpolation matrix [nq, nd] (row-major kron of the
    1D tabulation). For single-row cells (``rpc == 1``), returns
    [T, 128, 128] with
    ``tiles[t, g*nq_t + j, g*nd + n] = B[t*nq_t + j, n]`` so that
    ``(XE @ tiles[t].T)[r, g*nq_t + j]`` is qpoint ``t*nq_t + j`` of the
    cell packed at (r, g); T = ceil(nq / (128 // cpr)) tiles cover all
    qpoints. For SPLIT-ROW cells (``rpc > 1``, nd > 128: one cell per
    base row, node n in half ``n // npl`` at lane ``n % npl``), returns
    [T*rpc, 128, 128] ordered t-major then input-half:
    ``tiles[t*rpc + h, j, l] = B[t*nq_t + j, h*npl + l]`` so the q-tile
    is ``sum_h XE_h @ tiles[t*rpc + h].T``. Layout matches
    ``general_tables.pack_cell_qvalues``."""
    nq = B.shape[0]
    if rpc == 1:
        cap = _LANES // cpr
        T = -(-nq // cap)
        nq_t = -(-nq // T)
        tiles = np.zeros((T, _LANES, _LANES), dtype=np.dtype(dtype))
        for t in range(T):
            cnt = min(nq_t, nq - t * nq_t)
            blk = B[t * nq_t : t * nq_t + cnt]
            for g in range(cpr):
                tiles[t, g * nq_t : g * nq_t + cnt,
                      g * nd : g * nd + nd] = blk
        return tiles
    if cpr != 1:
        raise ValueError("split-row interpolation tiles require cpr=1")
    npl = -(-nd // rpc) if npl is None else npl
    T = -(-nq // _LANES)
    nq_t = -(-nq // T)
    tiles = np.zeros((T * rpc, _LANES, _LANES), dtype=np.dtype(dtype))
    for t in range(T):
        cnt = min(nq_t, nq - t * nq_t)
        for h in range(rpc):
            ncols = min(npl, nd - h * npl)
            if ncols <= 0:
                continue
            tiles[t * rpc + h, :cnt, :ncols] = B[
                t * nq_t : t * nq_t + cnt, h * npl : h * npl + ncols
            ]
    return tiles


def _kernel(
    start_ref,  # scalar prefetch: [E, nbatch] int32 extent start rows
    # (E-major: Mosaic pads the MINOR dim of SMEM-prefetched arrays
    # to 128 lanes, so [nbatch, E] would cost nbatch*128 ints of the
    # 1 MB SMEM budget - the 64^3 compile failure, nbatch=2048)
    yin_ref,  # [padded_rows, 128] ANY — aliased with out_ref
    xv_ref,  # [padded_rows, 128] ANY
    glane_ref, growt_ref, srowt_ref, snlane_ref,  # chain tables (VMEM)
    ovt_ref,  # [slots, 4, 128] int16 gather-overflow entries (VMEM)
    mA_ref, mB_ref,  # [nr, 128, 128] scatter-merge rounds (VMEM)
    geo_ref,  # [ngeo, R, 128] geometric factors (VMEM, compact rows)
    dmat_ref,  # [3, 128, 128] static contraction matrices (VMEM)
    out_ref,  # [padded_rows, 128] ANY (aliased input)
    xw, yw, ye, sem,  # scratch
    *, H, R, kg, ks, nr, ext, n_ov, affine, C, op, coeff, dtype, rpc=1,
    acpr=1, ac8=8,
):
    del yin_ref
    i = pl.program_id(0)
    n = pl.num_programs(0)
    f32 = jnp.float32 if dtype != jnp.float64 else jnp.float64
    hi = _mxu_precision()
    He = H // ext  # rows per (disjoint) DMA extent of the window

    # double-buffered input-window DMA: sub-batch g+1's extents stream
    # in while g computes. The output RMW read stays serial — it may
    # overlap the PREVIOUS sub-batch's extents, whose write completes
    # before the next read is issued.
    def in_dma(slot, idx, e):
        s = pl.multiple_of(start_ref[e, idx], 8)
        return pltpu.make_async_copy(
            xv_ref.at[pl.ds(s, He)],
            xw.at[slot, pl.ds(e * He, He)],
            sem.at[slot, e],
        )

    @pl.when(i == 0)
    def _():
        for e in range(ext):
            in_dma(0, 0, e).start()

    # C sub-batches per grid step (grid coarsening): the platform
    # charges a fixed ~5-10 us cost per grid step (docs/BENCH_NOTES.md
    # round 3, exp_general_bsize probe: time scales with batch COUNT at
    # constant traffic), so fewer/bigger steps directly buy throughput.
    for sub in range(C):
        _kernel_sub(
            sub, i * C + sub, i, n, start_ref, xv_ref, glane_ref,
            growt_ref, srowt_ref, snlane_ref, ovt_ref, mA_ref, mB_ref,
            geo_ref, dmat_ref, out_ref, xw, yw, ye, sem, in_dma,
            H=H, R=R, kg=kg, ks=ks, nr=nr, ext=ext, n_ov=n_ov,
            affine=affine, C=C, op=op, coeff=coeff, dtype=dtype,
            f32=f32, hi=hi, He=He, rpc=rpc, acpr=acpr, ac8=ac8,
        )


def _kernel_sub(
    sub, g, i, n, start_ref, xv_ref, glane_ref, growt_ref, srowt_ref,
    snlane_ref, ovt_ref, mA_ref, mB_ref, geo_ref, dmat_ref, out_ref,
    xw, yw, ye, sem, in_dma,
    *, H, R, kg, ks, nr, ext, n_ov, affine, C, op, coeff, dtype,
    f32, hi, He, rpc=1, acpr=1, ac8=8,
):
    """One sub-batch of a (possibly coarsened) grid step: window DMA in,
    gather chains + overflow, contraction, merge + scatter chains,
    RMW window accumulation out."""
    # prefetch the next sub-batch's window into the other buffer
    if sub + 1 < C:
        for e in range(ext):
            in_dma((g + 1) % 2, g + 1, e).start()
    else:
        @pl.when(i + 1 < n)
        def _():
            for e in range(ext):
                in_dma((g + 1) % 2, g + 1, e).start()

    for e in range(ext):
        s = pl.multiple_of(start_ref[e, g], 8)
        pltpu.make_async_copy(
            out_ref.at[pl.ds(s, He)], yw.at[pl.ds(e * He, He)],
            sem.at[2, e],
        ).start()
    for e in range(ext):
        in_dma(g % 2, g, e).wait()
    xw[g % 2, H - 1, :] = jnp.zeros((_LANES,), dtype=dtype)  # sentinel

    halves = _window_contrib(
        xw[g % 2], sub, glane_ref, growt_ref, srowt_ref, snlane_ref,
        ovt_ref, mA_ref, mB_ref, geo_ref, dmat_ref, ye,
        H=H, R=R, kg=kg, ks=ks, nr=nr, n_ov=n_ov, affine=affine,
        op=op, coeff=coeff, dtype=dtype, f32=f32, hi=hi, rpc=rpc,
        acpr=acpr, ac8=ac8,
    )
    for e in range(ext):
        pltpu.make_async_copy(
            out_ref.at[pl.ds(pl.multiple_of(start_ref[e, g], 8), He)],
            yw.at[pl.ds(e * He, He)], sem.at[2, e],
        ).wait()
    for h in range(H // _LANES):
        yw[h * _LANES : (h + 1) * _LANES] = (
            yw[h * _LANES : (h + 1) * _LANES] + halves[h]
        )
    cps = [
        pltpu.make_async_copy(
            yw.at[pl.ds(e * He, He)],
            out_ref.at[pl.ds(pl.multiple_of(start_ref[e, g], 8), He)],
            sem.at[3, e],
        )
        for e in range(ext)
    ]
    for cp in cps:
        cp.start()
    for cp in cps:
        cp.wait()


def _window_contrib(
    xvals, sub, glane_ref, growt_ref, srowt_ref, snlane_ref,
    ovt_ref, mA_ref, mB_ref, geo_ref, dmat_ref, ye,
    *, H, R, kg, ks, nr, n_ov, affine, op, coeff, dtype, f32, hi,
    rpc=1, acpr=1, ac8=8,
):
    """The window-shaped operator contribution of one sub-batch: gather
    chains + overflow -> contraction -> merge + scatter chains. Returns
    the H//128 row-halves of the [H, 128] window ADDEND (caller owns
    accumulation into HBM or a VMEM-resident output)."""
    # gather chains. Mathematically XE = sum_k take(take(Xw, lane_k, 1),
    # row_k, 0) — but SUBLANE-wise dynamic_gather reliably crashes this
    # platform's compiler, and lane-wise gather only handles 128 lanes
    # (docs/BENCH_NOTES.md round 3). The row select therefore runs as
    # transpose -> masked 128-lane gathers per window-row half -> back
    # transpose, with the row table stored transposed ([128, 128]:
    # rowT[c, r] = row[r, c], sentinel H-1 = the zeroed window row;
    # element rows r < R <= 128 by construction).
    xe_t = jnp.zeros((_LANES, _LANES), dtype=dtype)
    for k in range(kg):
        lane = glane_ref[k, sub].astype(jnp.int32)
        t = _take_lanes(xvals, lane)  # [H, 128]
        tt = t.T  # [128, H]
        # rows are stored int8 UNSIGNED (mod-256 two's complement)
        rt = growt_ref[k, sub].astype(jnp.int32) & 0xFF  # [128, 128]
        if H == _LANES:
            # window rows fit one tile: the row-select is a single
            # unmasked gather (no per-half clip/compare/select)
            xe_t = xe_t + jnp.take_along_axis(tt, rt, axis=1)
            continue
        for h in range(H // _LANES):
            th = tt[:, h * _LANES : (h + 1) * _LANES]
            idx = jnp.clip(rt - h * _LANES, 0, _LANES - 1)
            m = (rt >= h * _LANES) & (rt < (h + 1) * _LANES)
            xe_t = xe_t + jnp.where(
                m, jnp.take_along_axis(th, idx, axis=1),
                jnp.zeros((), dtype=dtype),
            )
    # gather-overflow entries (chains >= keep re-encoded per entry,
    # general_tables.build_gather_overflow): two masked lane-gathers
    # fetch v[e] = Xw[t_e, l_e]; one one-hot MXU matmul lands each
    # entry at its (r_e, c_e) element slot — exact, every slot claimed
    # at most once. ~1 KB of table per slot vs ~48 KB per dense chain.
    if n_ov:
        iota = jax.lax.broadcasted_iota(jnp.int32, (_LANES, _LANES), 1)
        xt = xvals.T  # [128, H]
        for o in range(n_ov):
            tv = ovt_ref[o, sub].astype(jnp.int32)  # [4, 128]
            t_b = jnp.broadcast_to(tv[0][None, :], (_LANES, _LANES))
            if H == _LANES:
                qt = jnp.take_along_axis(xt, t_b, axis=1)
            else:
                qt = jnp.zeros((_LANES, _LANES), dtype=dtype)
                for h in range(H // _LANES):
                    idx = jnp.clip(t_b - h * _LANES, 0, _LANES - 1)
                    m = (t_b >= h * _LANES) & (t_b < (h + 1) * _LANES)
                    qt = qt + jnp.where(
                        m,
                        jnp.take_along_axis(
                            xt[:, h * _LANES : (h + 1) * _LANES], idx,
                            axis=1,
                        ),
                        jnp.zeros((), dtype=dtype),
                    )
            q = qt.T  # [e, l] = Xw[t_e, l]
            v = jnp.take_along_axis(
                q,
                jnp.broadcast_to(tv[1][:, None], (_LANES, _LANES)),
                axis=1,
            )  # [e, 128]: every column holds v[e]
            ch = (tv[3][:, None] == iota).astype(dtype)  # [e, c]
            rh = (tv[2][:, None] == iota).astype(dtype)  # [e, r]
            xe_t = xe_t + jax.lax.dot_general(
                ch * v, rh, (((0,), (0,)), ((), ())),
                preferred_element_type=f32, precision=hi,
            ).astype(dtype)  # [c, r]
    xe = xe_t.T  # [128(r), 128(c)]
    xer = xe[:R]

    # contraction on the compact cell rows only. In affine mode geo_ref
    # is the rank-1 per-cell table [ngeo, 128, ac8]: lane g of entry gi
    # holds the constant of the cell packed at block g of that row
    # (G = g6 * w with w folded into the static matrices) — a ~100x
    # geo-DMA cut for parallelepiped-cell meshes. cpr == 1 broadcasts
    # lane 0; cpr > 1 expands block constants to their nd-lane spans
    # with one static 0/1 selector MXU matmul (dmat_ref[-1][:ac8]).
    def geo_entry(gi):
        if affine:
            blk = geo_ref[gi, sub]  # [128, ac8]
            if acpr == 1:
                return jnp.broadcast_to(blk[:, :1], (_LANES, _LANES))[:R]
            # selector lives at the (static) last dmats entry; Mosaic
            # rejects negative ref indices (-1 lowers to a bad constant)
            sel = dmat_ref[dmat_ref.shape[0] - 1]
            return jax.lax.dot_general(
                blk, sel[:ac8], (((1,), (0,)), ((), ())),
                preferred_element_type=f32, precision=hi,
            ).astype(dtype)[:R]
        return geo_ref[gi, sub]

    if op == "mass":
        if affine:
            yer = xer * geo_entry(0) * dmat_ref[0][:R]
        else:
            yer = xer * geo_ref[0, sub]
    elif op == "mass_gauss":
        # decomposed B^T diag(detJw) B at NON-collocated qpoints — the
        # reference's gpu_operator pipeline (demo/gpu_operator/
        # main.cpp:144-160) fused into the same window pass. Per q-tile
        # t: q = (XE @ B_t^T) .* detJw_t; YE += q @ B_t. Split-row cells
        # (rpc > 1) sum the interpolation over rpc input halves and
        # project back into rpc output halves (q-space tiles live on the
        # base rows, one cell per row).
        R2 = R // rpc
        xh = [xer[h * R2 : (h + 1) * R2] for h in range(rpc)]
        T = dmat_ref.shape[0] // rpc
        yh = [jnp.zeros((R2, _LANES), dtype=dtype) for _ in range(rpc)]
        for t in range(T):
            acc = None
            for h in range(rpc):
                part = jax.lax.dot_general(
                    xh[h], dmat_ref[t * rpc + h], (((1,), (1,)), ((), ())),
                    preferred_element_type=f32, precision=hi,
                )
                acc = part if acc is None else acc + part
            qt = acc.astype(dtype) * geo_ref[t, sub][:R2]
            for ho in range(rpc):
                yh[ho] = yh[ho] + jax.lax.dot_general(
                    qt, dmat_ref[t * rpc + ho], (((1,), (0,)), ((), ())),
                    preferred_element_type=f32, precision=hi,
                ).astype(dtype)
        yer = yh[0] if rpc == 1 else jnp.concatenate(yh, axis=0)
    elif op == "stiffness_gauss":
        # full-G stiffness at NON-collocated qpoints: dmat tiles are the
        # 3 axis-derivative interpolations (Dx|Dy|Dz, T q-tiles each,
        # each tile split into rpc input-half blocks for split-row
        # cells); geo tiles the 6 symmetric G entries at qpoints
        # (gi*T + t). Disjoint q-tiles partition the quadrature sum, so
        # per-tile contributions add exactly.
        R2 = R // rpc
        xh = [xer[h * R2 : (h + 1) * R2] for h in range(rpc)]
        T = dmat_ref.shape[0] // (3 * rpc)
        symm = ((0, 0), (0, 1), (0, 2), (1, 1), (1, 2), (2, 2))
        yh = [jnp.zeros((R2, _LANES), dtype=dtype) for _ in range(rpc)]
        for t in range(T):
            ud = []
            for d in range(3):
                acc = None
                for h in range(rpc):
                    part = jax.lax.dot_general(
                        xh[h], dmat_ref[(d * T + t) * rpc + h],
                        (((1,), (1,)), ((), ())),
                        preferred_element_type=f32, precision=hi,
                    )
                    acc = part if acc is None else acc + part
                ud.append(acc.astype(dtype))
            for d in range(3):
                w = jnp.zeros((R2, _LANES), dtype=dtype)
                for dp in range(3):
                    gi = symm.index(tuple(sorted((d, dp))))
                    w = w + geo_ref[gi * T + t, sub][:R2] * ud[dp]
                for ho in range(rpc):
                    yh[ho] = yh[ho] + jax.lax.dot_general(
                        w, dmat_ref[(d * T + t) * rpc + ho],
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=f32, precision=hi,
                    ).astype(dtype)
        yer = (yh[0] if rpc == 1 else jnp.concatenate(yh, axis=0)) * coeff
    elif op == "stiffness" and rpc > 1:
        # split-row cells (nd > 128): per-cell nodes span rpc half-block
        # rows; the contraction runs per (output-half, input-half) pair
        # on the half-block matrices of contraction_matrices(rpc=rpc).
        # Halves are cheap major-dim slices (R2 is 8-aligned).
        R2 = R // rpc
        xh = [xer[ho * R2 : (ho + 1) * R2] for ho in range(rpc)]
        ud = []
        for d in range(3):
            parts = []
            for ho in range(rpc):
                acc = jnp.zeros((R2, _LANES), dtype=dtype)
                for hi_ in range(rpc):
                    acc = acc + jax.lax.dot_general(
                        xh[hi_], dmat_ref[(d * rpc + ho) * rpc + hi_],
                        (((1,), (1,)), ((), ())),
                        preferred_element_type=f32, precision=hi,
                    ).astype(dtype)
                parts.append(acc)
            ud.append(jnp.concatenate(parts, axis=0))
        sym = ((0, 0), (0, 1), (0, 2), (1, 1), (1, 2), (2, 2))
        yparts = [jnp.zeros((R2, _LANES), dtype=dtype)
                  for _ in range(rpc)]
        for d in range(3):
            w = jnp.zeros((R, _LANES), dtype=dtype)
            for dp in range(3):
                gi = sym.index(tuple(sorted((d, dp))))
                w = w + geo_entry(gi) * ud[dp]
            # transpose apply: yer_ho += W_hi @ M[d][hi, ho]
            for ho in range(rpc):
                for hi_ in range(rpc):
                    yparts[ho] = yparts[ho] + jax.lax.dot_general(
                        w[hi_ * R2 : (hi_ + 1) * R2],
                        dmat_ref[(d * rpc + hi_) * rpc + ho],
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=f32, precision=hi,
                    ).astype(dtype)
        yer = jnp.concatenate(yparts, axis=0) * coeff
    else:  # stiffness: ye = coeff * sum_dd' D_d^T (G_dd' * (D_d' xe))
        ud = [
            jax.lax.dot_general(
                xer, dmat_ref[d], (((1,), (1,)), ((), ())),
                preferred_element_type=f32, precision=hi,
            ).astype(dtype)
            for d in range(3)
        ]
        sym = ((0, 0), (0, 1), (0, 2), (1, 1), (1, 2), (2, 2))
        yer = jnp.zeros((R, _LANES), dtype=dtype)
        for d in range(3):
            w = jnp.zeros((R, _LANES), dtype=dtype)
            for dp in range(3):
                gi = sym.index(tuple(sorted((d, dp))))
                w = w + geo_entry(gi) * ud[dp]
            # transpose apply: contract output-node axis of M[d]
            # (affine: the w-scaled copies at dmat_ref[3:6])
            yer = yer + jax.lax.dot_general(
                w, dmat_ref[3 + d if affine else d],
                (((1,), (0,)), ((), ())),
                preferred_element_type=f32, precision=hi,
            ).astype(dtype)
        yer = yer * coeff
    if R == H:
        ye[...] = yer
    else:
        ye[...] = jnp.concatenate(
            [yer, jnp.zeros((H - R, _LANES), dtype=dtype)], axis=0
        )

    # scatter chains: Yw += sum_j take(take(YE, row_j, 0), nlane_j, 1),
    # the row select again through the transpose (rowT[c, t] = row[t, c]
    # with values < R <= 128; unclaimed slots masked via the decoded
    # out-of-range sentinel), in per-half [128, 128] gathers.
    accs = [
        jnp.zeros((_LANES, _LANES), dtype=dtype)
        for _ in range(H // _LANES)
    ]
    ye_t = ye[: _LANES].T  # [128(c), 128(r)] — rows r < R <= 128
    # element-space claim pre-reduction: binary-tree merge of duplicate
    # window-dof claims inside the tile (two lane-wise gathers per
    # round). B's unclaimed slots carry the out-of-range lane sentinel
    # (stored -128, decoded & 0xFF == 128) and are MASKED — no element
    # lane is reserved, so cells pack all 128 lanes (cpr = 128 // nd).
    for rnd in range(nr):
        Ar = mA_ref[rnd, sub].astype(jnp.int32)  # [c2, r1] -> r2
        Br = mB_ref[rnd, sub].astype(jnp.int32) & 0xFF  # [r1, c1] -> c2
        s1 = jnp.take_along_axis(ye_t, Ar, axis=1)
        s2 = jnp.take_along_axis(
            s1.T, jnp.minimum(Br, _LANES - 1), axis=1
        )
        ye_t = ye_t + jnp.where(
            Br < _LANES, s2, jnp.zeros((), dtype=dtype)
        ).T
    for sc in range(ks):
        rt = srowt_ref[sc, sub].astype(jnp.int32)  # [128, H]
        # unclaimed (t, l) slots hold the out-of-range sentinel (stored
        # int8 -128 -> decoded 128): clip for the gather, mask the add
        nlane = snlane_ref[sc, sub].astype(jnp.int32) & 0xFF
        # per-half: element-row select through the transpose, then the
        # lane realignment — all [128, 128] gathers, no concat
        for h in range(H // _LANES):
            ph = jnp.take_along_axis(
                ye_t, rt[:, h * _LANES : (h + 1) * _LANES], axis=1
            ).T  # [128(t_h), 128(c)]
            nlh = nlane[h * _LANES : (h + 1) * _LANES]
            q = jnp.take_along_axis(
                ph, jnp.minimum(nlh, _LANES - 1), axis=1
            )
            accs[h] = accs[h] + jnp.where(
                nlh < _LANES, q, jnp.zeros((), dtype=dtype)
            )
    return accs


def _kernel_resident(
    start_ref,  # scalar prefetch: [E, nbatch] int32 extent start rows
    # (E-major: Mosaic pads the MINOR dim of SMEM-prefetched arrays
    # to 128 lanes, so [nbatch, E] would cost nbatch*128 ints of the
    # 1 MB SMEM budget - the 64^3 compile failure, nbatch=2048)
    yin_ref,  # [padded_rows, 128] ANY — aliased with out_ref
    xv_ref,  # [padded_rows, 128] ANY
    glane_ref, growt_ref, srowt_ref, snlane_ref,  # chain tables (VMEM)
    ovt_ref,  # [slots, C, 4, 128] int16 gather-overflow entries (VMEM)
    mA_ref, mB_ref,  # [nr, C, 128, 128] scatter-merge rounds (VMEM)
    geo_ref,  # geometric factors (VMEM)
    dmat_ref,  # static contraction matrices (VMEM)
    out_ref,  # [padded_rows, 128] ANY (aliased input)
    xacc, yacc, ye, sem,  # scratch
    *, H, R, kg, ks, nr, ext, n_ov, affine, C, nrows, op, coeff, dtype,
    rpc=1, acpr=1, ac8=8,
):
    """VMEM-RESIDENT variant: the whole dof vector (x AND the output
    accumulator) lives in VMEM for the entire grid — one inbound DMA at
    step 0, one outbound flush at the last step, ZERO per-batch DMA
    chains. The windowed kernel's per-batch serialized RMW round trips
    (read window -> accumulate -> write, ~5-7 us each on this
    platform's virtualized memory path — docs/BENCH_NOTES.md round 3)
    were the dominant cost at production sizes; they simply disappear
    when 2*nrows*512 bytes fit the ~128 MB VMEM budget (<= ~12M dofs
    f32). Larger meshes keep the windowed kernel."""
    del yin_ref
    i = pl.program_id(0)
    n = pl.num_programs(0)
    f32 = jnp.float32 if dtype != jnp.float64 else jnp.float64
    hi = _mxu_precision()
    He = H // ext

    @pl.when(i == 0)
    def _():
        cp = pltpu.make_async_copy(xv_ref, xacc, sem.at[0])
        cp.start()
        cp.wait()
        yacc[...] = jnp.zeros((nrows, _LANES), dtype=dtype)

    rows_iota = jax.lax.broadcasted_iota(jnp.int32, (H, _LANES), 0)
    for sub in range(C):
        g = i * C + sub
        parts = [
            xacc[pl.ds(pl.multiple_of(start_ref[e, g], 8), He)]
            for e in range(ext)
        ]
        Xw = parts[0] if ext == 1 else jnp.concatenate(parts, axis=0)
        Xw = jnp.where(rows_iota == H - 1,
                       jnp.zeros((), dtype=dtype), Xw)  # sentinel row
        halves = _window_contrib(
            Xw, sub, glane_ref, growt_ref, srowt_ref, snlane_ref,
            ovt_ref, mA_ref, mB_ref, geo_ref, dmat_ref, ye,
            H=H, R=R, kg=kg, ks=ks, nr=nr, n_ov=n_ov, affine=affine,
            op=op, coeff=coeff, dtype=dtype, f32=f32, hi=hi, rpc=rpc,
            acpr=acpr, ac8=ac8,
        )
        ywadd = (halves[0] if len(halves) == 1
                 else jnp.concatenate(halves, axis=0))
        for e in range(ext):
            s = pl.multiple_of(start_ref[e, g], 8)
            yacc[pl.ds(s, He)] = (
                yacc[pl.ds(s, He)] + ywadd[e * He : (e + 1) * He]
            )

    @pl.when(i == n - 1)
    def _():
        cp = pltpu.make_async_copy(yacc, out_ref, sem.at[1])
        cp.start()
        cp.wait()


def make_general_apply(
    tables: GeneralBatchTables,
    geo: np.ndarray,
    op: str,
    *,
    D1: np.ndarray | None = None,
    coeff: float = 1.0,
    p: int | None = None,
    dtype=jnp.float32,
    interpret: bool | None = None,
    kg: int | None = None,
    ks: int | None = None,
    idx_dtype=None,
    merge=None,
    overflow: bool | int = True,
    affine_w=None,
    coarsen: int | None = None,
    resident: bool | None = None,
    Bq=None,
):
    """Build ``apply(x) -> y`` over flat [ndofs] vectors (kernel part only
    — spilled cells are the caller's responsibility).

    ``geo``: packed per-batch geometric factors [ngeo, nbatch, H, 128]
    (ngeo=1 detJw for mass; 6 symmetric G entries, order
    (xx, xy, xz, yy, yz, zz), for stiffness) laid out like the element
    tiles. ``D1``: collocated 1D derivative matrix (stiffness only).

    ``affine_w``: nodal quadrature weights [nd] — switches to the
    rank-1 affine-cell geometry form: ``geo`` is then the per-CELL
    [ngeo, nbatch, 128, ac8] table (ngeo = 6 g6 entries for stiffness,
    1 |detJ| for mass; minor lane g holds the constant of the cell
    packed at lane block g of that element-tile row, ac8 = cpr rounded
    up to 8) and the kernel reconstructs G = g6 * w by folding w into
    the static contraction matrices (cpr > 1 additionally expands the
    per-block constants to their nd-lane spans with one static 0/1
    selector matmul appended at dmats[-1]).
    """
    tb = tables
    npdt = np.dtype(dtype)
    affine = affine_w is not None
    if tb.rpc != 1 and affine:
        raise ValueError(
            "split-row cells (nd > 128) support only full per-node "
            "factors (the rank-1 affine form assumes single-row cells)"
        )
    acpr = tb.cpr if affine else 1
    ac8 = max(8, -(-acpr // 8) * 8)

    def tiled_w():
        # quadrature weights replicated over the cpr lane blocks (the
        # contraction matrices are block-diagonal with span nd)
        wv = np.zeros(_LANES, npdt)
        w1 = np.asarray(affine_w, npdt)
        for g in range(tb.cpr):
            wv[g * tb.nd : g * tb.nd + tb.nd] = w1
        return wv

    def block_selector():
        # [128, 128] 0/1 selector: row g covers lane block g, so
        # blk[128, ac8] @ sel[:ac8] broadcasts each per-block constant
        # across its cell's nd lanes (pad lanes stay zero)
        sel = np.zeros((1, _LANES, _LANES), npdt)
        for g in range(tb.cpr):
            sel[0, g, g * tb.nd : (g + 1) * tb.nd] = 1
        return sel

    if op == "stiffness":
        dmats = contraction_matrices(p, tb.cpr, np.asarray(D1), npdt,
                                     rpc=tb.rpc)
        if affine:
            wv = tiled_w()
            dmats = np.concatenate([dmats, wv[:, None] * dmats])
            if acpr > 1:
                dmats = np.concatenate([dmats, block_selector()])
    elif op == "mass_gauss":
        # geo = pack_cell_qvalues(tb, detJw[nc, nq], T) q-tiles;
        # Bq = [nq, nd] 3D interpolation matrix
        if affine:
            raise ValueError("mass_gauss: affine form not supported")
        dmats = interpolation_tiles(tb.cpr, tb.nd, np.asarray(Bq), npdt,
                                    rpc=tb.rpc, npl=tb.npl)
        if dmats.shape[0] != geo.shape[0] * tb.rpc:
            raise ValueError("mass_gauss: geo tiles != B tiles")
    elif op == "stiffness_gauss":
        # Bq = (Dx, Dy, Dz) [nq, nd] axis-derivative interpolations;
        # geo = 6 symmetric G entries at qpoints, gi*T + t tile order
        if affine:
            raise ValueError("stiffness_gauss: affine form not supported")
        dmats = np.concatenate(
            [interpolation_tiles(tb.cpr, tb.nd, np.asarray(Dq), npdt,
                                 rpc=tb.rpc, npl=tb.npl)
             for Dq in Bq]
        )
        if 2 * dmats.shape[0] != geo.shape[0] * tb.rpc:
            raise ValueError("stiffness_gauss: geo tiles != 2 * D tiles")
    else:
        if affine:
            dmats = np.ascontiguousarray(
                np.broadcast_to(tiled_w(), (_LANES, _LANES))[None]
            )
            if acpr > 1:
                dmats = np.concatenate([dmats, block_selector()])
        else:
            dmats = np.zeros((3, _LANES, _LANES), npdt)
    geo = np.ascontiguousarray(geo, dtype=npdt)
    if affine and geo.shape[1:] != (tb.nbatch, _LANES, ac8):
        raise ValueError(
            f"affine geo must be [ngeo, nbatch, 128, {ac8}], got "
            f"{geo.shape}"
        )

    # sparse gather tail -> per-entry overflow slots (only on the
    # default path: explicit kg pins the dense-chain form for ablations)
    ovf = None
    if kg is None and overflow:
        from .general_tables import build_gather_overflow

        ms = (overflow if isinstance(overflow, int)
              and overflow is not True else 4)
        ovf = build_gather_overflow(tb, max_slots=ms)
    kg = (ovf.keep if ovf is not None else tb.kg) if kg is None else kg
    n_ov = 0 if ovf is None else ovf.slots
    nr = 0 if merge is None else merge.nrounds
    if merge is not None and ks is None:
        ks = merge.ks
    ks = tb.ks if ks is None else ks
    # VMEM-resident mode (opt-in): x and the output accumulator live in
    # VMEM for the whole grid (one inbound DMA, one final flush, no
    # per-batch RMW DMA chains). Measured on chip (32^3, p=4): resident
    # 2.23/2.33 ms mass/stiffness vs windowed 2.13/2.21 — the window
    # DMAs fully overlap compute behind double buffering, so removing
    # them buys nothing and VMEM window slicing costs ~5% extra. The
    # per-batch floor is the gather/scatter chain VPU work itself
    # (docs/BENCH_NOTES.md round 3). Kept for configs where HBM traffic
    # matters (e.g. future multi-operator fusion over one residency).
    if resident is None:
        resident = False
    if resident and 2 * tb.padded_rows * _LANES * npdt.itemsize > (
        100 * 1024 * 1024
    ):
        raise ValueError("resident mode: vectors exceed the VMEM budget")
    # grid coarsening (C sub-batches per grid step): measured a wash at
    # every C in 1..32, windowed AND resident — the per-sub-batch cost
    # is chain compute, not grid-step dispatch. Default off.
    C = coarsen if coarsen is not None else 1
    nb_pad = -(-tb.nbatch // C) * C
    call = make_general_call(
        H=tb.H, R=tb.R, kg=kg, ks=ks, nr=nr, ext=tb.extents,
        n_ov=n_ov, ngeo=geo.shape[0], affine=affine,
        nrows=tb.padded_rows, nbatch=nb_pad, op=op, coeff=coeff,
        dtype=dtype, interpret=interpret, coarsen=C, resident=resident,
        rpc=tb.rpc, acpr=acpr, ac8=ac8,
    )
    nrows = tb.padded_rows
    # tables stay NumPy: they become per-trace compile-time constants and
    # can never leak tracers when the apply is first built inside a jit
    # trace (same failure class as round 2's padded-model table leak)
    # E-major layout: the scalar-prefetch SMEM buffer pads the minor dim
    # to 128 lanes, so the big axis (nbatch) must be minor
    start_rows = np.ascontiguousarray(tb.start_rows.T)
    g_rowt, s_rowt = transposed_row_tables(tb)
    g_lane, s_nlane = tb.g_lane, tb.s_nlane
    if merge is not None:
        s_rowt = np.ascontiguousarray(np.swapaxes(merge.s_row, 2, 3))
        s_nlane = merge.s_nlane
        mA, mB = merge.A, merge.B
    else:
        mA = np.zeros((1, tb.nbatch, _LANES, _LANES), np.int8)
        mB = np.full((1, tb.nbatch, _LANES, _LANES), -128,
                     np.int8)  # masked merge sentinel (unused: nr=0)
    # chain truncation (overflow re-encoding or timing ablations);
    # specs keep >=1 chain table
    kt, st = max(kg, 1), max(ks, 1)
    g_lane, g_rowt = g_lane[:kt], g_rowt[:kt]
    s_rowt, s_nlane = s_rowt[:st], s_nlane[:st]
    ovt = (ovf.tab if ovf is not None
           else np.zeros((1, tb.nbatch, 4, _LANES), np.int16))

    # pad every per-batch array to the coarsened batch count with
    # no-op sentinel batches (window [0, He): read and written back
    # unchanged — safe because grid steps are sequential and padding
    # batches come last)
    def padb(a, axis, value):
        padn = nb_pad - tb.nbatch
        if padn == 0:
            return a
        shape = list(a.shape)
        shape[axis] = padn
        return np.concatenate(
            [a, np.full(shape, np.array(value, np.int64).astype(a.dtype)
                        if a.dtype.kind in "iu" else value, a.dtype)],
            axis=axis,
        )

    if nb_pad != tb.nbatch:
        start_rows = padb(start_rows, 1, 0)
        g_lane = padb(g_lane, 1, 0)
        g_rowt = padb(g_rowt, 1, tb.H - 1)
        s_rowt = padb(s_rowt, 1, 0)
        s_nlane = padb(s_nlane, 1, -128)
        mA = padb(mA, 1, 0)
        mB = padb(mB, 1, -128)
        ovp = np.zeros((ovt.shape[0], nb_pad - tb.nbatch, 4, _LANES),
                       np.int16)
        ovp[:, :, 0, :] = tb.H - 1
        ovp[:, :, 3, :] = _LANES - 1
        ovt = np.concatenate([ovt, ovp], axis=1)
        geo = padb(geo, 1, 0)
    if idx_dtype is not None:
        # wider index tables trade DMA for the in-kernel upcasts
        g_lane, g_rowt, s_rowt, s_nlane = (
            a.astype(idx_dtype) for a in (g_lane, g_rowt, s_rowt,
                                          s_nlane)
        )
    ndofs_pad = nrows * _LANES

    def apply(x):
        xp = jnp.zeros((ndofs_pad,), dtype=dtype)
        xp = xp.at[: x.shape[0]].set(x.astype(dtype))
        xv = xp.reshape(nrows, _LANES)
        y0 = jnp.zeros((nrows, _LANES), dtype=dtype)
        out = call(start_rows, y0, xv, g_lane, g_rowt, s_rowt, s_nlane,
                   ovt, mA, mB, geo, dmats)
        return out.reshape(-1)[: x.shape[0]]

    return apply


def transposed_row_tables(tb) -> tuple[np.ndarray, np.ndarray]:
    """Row-select tables in the kernel's TRANSPOSED layout:
    g_rowt[k, i, c, r] = g_row[k, i, r, c] ([Kg, nb, 128, 128] — element
    rows r < R <= 128 by construction, sentinel H-1 beyond) and
    s_rowt[j, i, c, t] = s_row[j, i, t, c] ([Ks, nb, 128, H])."""
    Kg, nb = tb.g_row.shape[:2]
    g_rowt = np.full(
        (Kg, max(nb, 1), _LANES, _LANES),
        np.array(tb.H - 1, np.int64).astype(tb.g_row.dtype),
        tb.g_row.dtype,
    )
    g_rowt[:, :nb, :, : tb.R] = np.swapaxes(tb.g_row, 2, 3)
    s_rowt = np.ascontiguousarray(np.swapaxes(tb.s_row, 2, 3))
    return g_rowt[:, :nb], s_rowt


def make_general_call(
    *, H, R, kg, ks, ngeo, nrows, nbatch, op, coeff, dtype,
    interpret=None, nr=0, ext=1, n_ov=0, affine=False, coarsen=1,
    resident=False, rpc=1, acpr=1, ac8=8,
):
    """The compiled program alone (no table capture):
    ``call(start_rows, y0, xv, g_lane, g_row, s_row, s_nlane, ovt, mA,
    mB, geo, dmats) -> y [nrows, 128]``. Tables are runtime operands, so
    the same program serves every device of a sharded fleet with
    per-device tables. ``nr``: scatter-merge rounds (mA/mB are
    [max(nr,1), nbatch, 128, 128] dummies when nr=0). ``n_ov``:
    gather-overflow slots (ovt is a [max(n_ov,1), nbatch, 4, 128] int16
    dummy when n_ov=0). ``coarsen``: sub-batches per grid step —
    ``nbatch`` must already be padded to a multiple; the platform's
    fixed per-grid-step cost makes this the dominant throughput knob
    at production sizes (docs/BENCH_NOTES.md round 3)."""
    npdt = np.dtype(dtype)
    C = coarsen
    if nbatch % C:
        raise ValueError("nbatch must be padded to a multiple of coarsen")
    if resident:
        kern = functools.partial(
            _kernel_resident, H=H, R=R, kg=kg, ks=ks, nr=nr, ext=ext,
            n_ov=n_ov, affine=affine, C=C, nrows=nrows, op=op,
            coeff=npdt.type(coeff), dtype=dtype, rpc=rpc, acpr=acpr,
            ac8=ac8,
        )
    else:
        kern = functools.partial(
            _kernel, H=H, R=R, kg=kg, ks=ks, nr=nr, ext=ext, n_ov=n_ov,
            affine=affine, C=C, op=op, coeff=npdt.type(coeff),
            dtype=dtype, rpc=rpc, acpr=acpr, ac8=ac8,
        )
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    def chain_spec(K, rows=H, cols=_LANES):
        return pl.BlockSpec(
            (K, C, rows, cols), lambda i, *_: (0, i, 0, 0),
            memory_space=pltpu.VMEM,
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nbatch // C,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # y0 (aliased)
            pl.BlockSpec(memory_space=pl.ANY),  # xv
            chain_spec(max(kg, 1)),  # g_lane
            chain_spec(max(kg, 1), _LANES, _LANES),  # g_rowt (transposed)
            chain_spec(max(ks, 1), _LANES, H),  # s_rowt (transposed)
            chain_spec(max(ks, 1)),  # s_nlane
            chain_spec(max(n_ov, 1), 4, _LANES),  # gather overflow
            chain_spec(max(nr, 1), _LANES, _LANES),  # merge A
            chain_spec(max(nr, 1), _LANES, _LANES),  # merge B
            # geo: full per-node factors, or the rank-1 per-cell table
            # (minor dim ac8 == its array dim)
            (pl.BlockSpec((ngeo, C, _LANES, ac8),
                          lambda i, *_: (0, i, 0, 0),
                          memory_space=pltpu.VMEM)
             if affine else chain_spec(ngeo, R)),  # geo
            pl.BlockSpec(memory_space=pltpu.VMEM),  # dmats (whole)
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=(
            [
                pltpu.VMEM((nrows, _LANES), dtype),  # xacc (whole x)
                pltpu.VMEM((nrows, _LANES), dtype),  # yacc (whole y)
                pltpu.VMEM((H, _LANES), dtype),  # ye
                pltpu.SemaphoreType.DMA((2,)),
            ]
            if resident
            else [
                pltpu.VMEM((2, H, _LANES), dtype),  # xw (double-buffer)
                pltpu.VMEM((H, _LANES), dtype),  # yw
                pltpu.VMEM((H, _LANES), dtype),  # ye
                pltpu.SemaphoreType.DMA((4, ext)),
            ]
        ),
    )

    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nrows, _LANES), dtype),
        # y accumulates in place across (sequential) grid steps; operand
        # index counts the scalar-prefetch arg at position 0
        input_output_aliases={1: 0},
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024,
        ),
    )
