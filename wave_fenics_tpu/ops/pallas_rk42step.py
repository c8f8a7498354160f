"""Temporal-blocked RK4 kernel: TWO full RK4 timesteps per HBM pass.

ops.pallas_rk4step runs one whole RK4 step per pass and measures
1.44 ms/step at Tx=32/p=4 — within ~3% of its own state-traffic floor
(2 reads + 2 writes of (u, v) at (Tx+2*3p')/Tx slab amplification).
The only way below that floor is to amortize the pass over more
physics: integrate s=2 RK4 steps per tile while the state sits in VMEM
(the structured-path analogue of ops.pallas_lf2step).

Per output tile (rows [0, Tx)), step 1 is evaluated on a 3p-deep
superset window so step 2's stage recursion never leaves VMEM:

    step 1: output rows [-3p, Tx+3p)   (R1 = Tx+6p), stage windows at
            slab offsets off0-5p / off0-4p / off0-3p
            (kv0 on R1+4p, kv1/kv2 on R1+2p, kv3 on R1 rows)
    step 2: output rows [0, Tx)        (R2 = Tx), stage windows at
            off0-2p / off0-p / off0 — identical shapes to the
            single-step kernel's

Slab halo off0 >= 6p (8-aligned): state traffic per TWO steps is
2*(Tx+2*off0) reads + 2*Tx writes, i.e. ~(Tx+48)/Tx amplification
amortized over two steps — at Tx=32/p=4 that is 112 state rows/step vs
the single-step kernel's 176 (x0.64). The trade is wedge recomputation:
stage A-applies total 8*Tx+40p rows per 2 steps vs 8*Tx+16p for two
separate passes (+44% stencil row-work at Tx=32/p=4) — profitable ONLY
if the pass is traffic-bound.

STATUS (round 5): CLOSED as a production path, on two independent
grounds. (1) The real-Mosaic compile at roll_env=6 still OOMs VMEM
(129.46/128 MB, 1553 s compile — experiments/logs/r4e_rk42.json; the
register allocator spills the step-1 superset stage temporaries, which
roll_env does not bound). (2) The round-5 roofline retraction
(docs/BENCH_NOTES.md) shows the single-step kernel runs at 31% of its
own DMA pattern's demonstrated streaming rate: the pass is COMPUTE-
bound, so trading +44% stencil row-work for traffic savings is
counterproductive even if it compiled. The kernel is kept (correct
under interpret mode, tested, sharded variant exercised in
dryrun_multichip) as the structured-path temporal-blocking design
record; ops.pallas_lf2step is where temporal blocking actually pays
(leapfrog's 1 stage/step makes its wedge recomputation cheap).

Wedge recomputation note (same class as ops.pallas_lf2step): the halo
rows of step 1 are re-evaluated by neighboring tiles at different
matmul window offsets, so results may differ from two single-step
passes at ulp level; tests pin 1e-6 f32 / 1e-12 f64 agreement.

Semantics per stage are exactly ops.pallas_rk4step's (Butcher tableau
of LinearGLL.hpp:233-287); source amplitudes are sampled at the five
distinct stage times t + {0, 1/2, 1, 3/2, 2} dt.
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
    "build_rk42_tables",
    "build_rk42_tables_from_cv",
    "make_rk42_step",
    "make_rk42_step_raw",
]

_RK_A = (0.0, 0.5, 0.5, 1.0)
_RK_B = (1.0 / 6.0, 1.0 / 3.0, 1.0 / 3.0, 1.0 / 6.0)


def _off0(p: int) -> int:
    """Slab x-halo depth: >= 6p (two chained 3p stage recursions),
    8-aligned (2D DMA sublane rule)."""
    return -(-6 * p // 8) * 8


def _window_shapes(p: int, Tx: int) -> list[tuple[int, int]]:
    """(slab offset, row count) of the six stage A-apply windows:
    three for the step-1 superset output, three for step 2."""
    off0 = _off0(p)
    q0 = off0 - 3 * p  # step-1 output base
    R1 = Tx + 6 * p
    return [
        (q0 - 2 * p, R1 + 4 * p),
        (q0 - p, R1 + 2 * p),
        (q0, R1),
        (off0 - 2 * p, Tx + 4 * p),
        (off0 - p, Tx + 2 * p),
        (off0, Tx),
    ]


def _kernel_rk42_step(
    u0_hbm, v0_hbm, scal_ref,
    wx1a_ref, wx1b_ref, wx1c_ref, wx2a_ref, wx2b_ref, wx2c_ref,
    cvy_ref, cvz_ref,
    fx_ref, sxs_ref, src_ref, abc_ref, w1_ref, w2_ref,
    u2_out, v2_out,
    slab_u, slab_v, acc_ref, accu_ref, accv_ref, sem_u, sem_v,
    *, p, Tx, Ly, Lz, dtype, c0, precision=jax.lax.Precision.HIGHEST,
    yz_chunk=9, roll_env=6,
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
    # g at t + {0, 1/2, 1, 3/2, 2} dt
    g = tuple(scal_ref[0, 1 + j] for j in range(5))
    c0sq = jnp.asarray(c0 * c0, dtype)
    mc0 = jnp.asarray(-c0, dtype)
    q0 = off0 - 3 * p
    R1 = Tx + 6 * p

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

        def apply_A(xin, wx_ref, o, nrows):
            """A x on output rows [o, o+nrows) (slab coords); xin = x on
            [o-p, o+nrows+p). Identical structure to
            ops.pallas_rk4step._kernel_rk4_step.apply_A, except the
            roll-chunk scales DOWN with the window height: a chunk of c
            keeps c rolled [nrows, F] tensors live at once, and the
            step-1 superset windows (up to Tx+10p rows) at yz_chunk=9
            spilled ~90 MB of VMEM (r4d chip log: OOM by 1.9 MB out of
            128). Capping c*nrows at roll_env*(Tx+4p) rows bounds the
            live roll set across windows; the r4e chip run showed the
            single-step kernel's envelope of 9 STILL spills 129.47 MB
            (OOM by 1.47 MB, 90.7 MB register-spill slots), so the
            default is 6 (saves ~2*(Tx+4p)*F*4 bytes of live rolls at
            the worst window, ~8 MB at Tx=32/p=4/F=20736). The extra
            acc_ref accumulation passes are VMEM-local and hidden under
            the slab DMA (docs/BENCH_NOTES.md step-kernel bisection)."""
            xc = xin[p : p + nrows]
            sx = sxs_ref[0, o : o + nrows]
            chunk = max(1, min(yz_chunk, (roll_env * (Tx + 4 * p)) // nrows))
            tx = jnp.einsum(
                "os,sf->of", wx_ref[0], xin,
                preferred_element_type=f32, precision=precision,
            ).astype(dtype)
            out = tx * fx_ref[:]
            terms = [(cvy_ref, k, ((p - k) * Lz) % F) for k in range(K)]
            terms += [(cvz_ref, k, (p - k) % F) for k in range(K)]
            first = True
            for i in range(0, len(terms), chunk):
                e = None
                for ref, k, sh in terms[i : i + chunk]:
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
            src = src_ref[0, o : o + nrows]
            abc = abc_ref[0, o : o + nrows]
            return kv + (c0sq * gj) * (src * w1_ref[:]) + mc0 * (
                abc * w2_ref[:]
            ) * vn

        def substep(U, V, ob, R, wxa, wxb, wxc, ga, gb, gc):
            """One RK4 step: (u', v') on slab rows [ob, ob+R). ``U``/``V``
            carry rows [ob-3p, ob+R+3p) (row 0 = slab row ob-3p)."""
            oA, oB, oC = ob - 2 * p, ob - p, ob
            nA, nB, nC = R + 4 * p, R + 2 * p, R
            ca1 = _RK_A[1] * dt
            ca2 = _RK_A[2] * dt
            ca3 = _RK_A[3] * dt

            # stage 0: kv0 on the A window (U rows [0, nA+2p) feed it)
            kv0 = bc(apply_A(U, wxa, oA, nA), V[p : p + nA], ga, oA, nA)
            accu_ref[0:R] = _RK_B[0] * V[3 * p : 3 * p + R]
            accv_ref[0:R] = _RK_B[0] * kv0[2 * p : 2 * p + R]

            # stage 1
            un1 = U[p : p + nA] + ca1 * V[p : p + nA]
            vn1 = V[p : p + nA] + ca1 * kv0
            kv1 = bc(apply_A(un1, wxb, oB, nB), vn1[p : p + nB], gb,
                     oB, nB)
            accu_ref[0:R] += _RK_B[1] * vn1[2 * p : 2 * p + R]
            accv_ref[0:R] += _RK_B[1] * kv1[p : p + R]

            # stage 2
            un2 = U[p : p + nA] + ca2 * vn1
            vn2 = V[2 * p : 2 * p + nB] + ca2 * kv1
            kv2 = bc(apply_A(un2, wxb, oB, nB), vn2, gb, oB, nB)
            accu_ref[0:R] += _RK_B[2] * vn2[p : p + R]
            accv_ref[0:R] += _RK_B[2] * kv2[p : p + R]

            # stage 3
            un3 = U[2 * p : 2 * p + nB] + ca3 * vn2
            vn3 = V[2 * p : 2 * p + nB] + ca3 * kv2
            kv3 = bc(apply_A(un3, wxc, oC, nC), vn3[p : p + nC], gc,
                     oC, nC)
            accu_ref[0:R] += _RK_B[3] * vn3[p : p + R]
            accv_ref[0:R] += _RK_B[3] * kv3

            u_out = U[3 * p : 3 * p + R] + dt * accu_ref[0:R]
            v_out = V[3 * p : 3 * p + R] + dt * accv_ref[0:R]
            return u_out, v_out

        # step 1 on the superset window [q0, q0+R1): its state inputs
        # span slab rows [q0-3p, q0+R1+3p) = [off0-6p, off0+Tx+6p) ⊂ slab
        s1 = q0 - 3 * p
        u1, v1 = substep(
            slab_u[ix % 2][s1 : s1 + R1 + 6 * p],
            slab_v[ix % 2][s1 : s1 + R1 + 6 * p],
            q0, R1, wx1a_ref, wx1b_ref, wx1c_ref, g[0], g[1], g[2],
        )
        # step 2 on the output rows: u1/v1 row 0 = slab row q0 = off0-3p,
        # exactly the [ob-3p, ob+R+3p) contract for ob=off0, R=Tx
        u2, v2 = substep(
            u1, v1, off0, Tx,
            wx2a_ref, wx2b_ref, wx2c_ref, g[2], g[3], g[4],
        )
        u2_out[:] = u2
        v2_out[:] = v2


def build_rk42_tables(
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
    """Static tables for the 2-step RK4 kernel. Returns
    (WX1A, WX1B, WX1C, WX2A, WX2B, WX2C, CVY, CVZ, FX, SXS, SRC, ABC,
    W1, W2)."""
    cvx, cvy, cvz, pLx, pLy, pLz = axis_cv_tables(
        layout, A, lines, coeff, inv_m_lines
    )
    return build_rk42_tables_from_cv(
        layout, cvx, cvy, cvz, pLx, pLy, pLz,
        w1_flat, w2_flat, src_x, abc_x, dtype,
    )


def build_rk42_tables_from_cv(
    layout: PaddedLayout,
    cvx: np.ndarray, cvy: np.ndarray, cvz: np.ndarray,
    pLx: np.ndarray, pLy: np.ndarray, pLz: np.ndarray,
    w1_flat: np.ndarray,
    w2_flat: np.ndarray,
    src_x: int,
    abc_x: int,
    dtype=jnp.float32,
) -> tuple[np.ndarray, ...]:
    """2-step RK4 tables from pre-built padded coefficient/line vectors
    (six banded x windows — three step-1 superset shapes, three step-2
    shapes identical to ops.pallas_rk4step's — plus the shared folded
    stencil/mask tables at the 6p slab halo)."""
    p = layout.p
    Tx = layout.tile_x
    Lx, Ly, Lz = layout.padded_shape
    K = 2 * p + 1
    off0 = _off0(p)
    S0 = Tx + 2 * off0
    F = Ly * Lz
    npdt = np.dtype(dtype)

    ntiles = Lx // Tx
    bands = []
    for o_w, nrows in _window_shapes(p, Tx):
        W = np.zeros((ntiles, nrows, nrows + 2 * p))
        for t in range(1, ntiles - 1):
            base = t * Tx - off0
            for r in range(nrows):
                gx = base + o_w + r
                if 0 <= gx < Lx:
                    for k in range(K):
                        W[t, r, r + k] = cvx[k, gx]
        bands.append(W.astype(npdt))

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
            gx = base + r
            if 0 <= gx < Lx:
                SXS[t, r, 0] = pLx[gx]
                SRC[t, r, 0] = 1.0 if gx == src_x else 0.0
                ABC[t, r, 0] = 1.0 if gx == abc_x else 0.0

    W1 = np.asarray(w1_flat).reshape(1, F).astype(npdt)
    W2 = np.asarray(w2_flat).reshape(1, F).astype(npdt)
    return tuple(bands) + (CVY, CVZ, FX,
                           SXS.astype(npdt), SRC.astype(npdt),
                           ABC.astype(npdt), W1, W2)


def make_rk42_step_raw(
    layout: PaddedLayout,
    c0: float,
    dtype=jnp.float32,
    precision=jax.lax.Precision.HIGHEST,
    yz_chunk: int = 9,
    roll_env: int = 6,
):
    """2-step RK4 callable with runtime tables:
    ``step2(u0, v0, dt, g0, gh1, g1, gh2, g2) -> (u2, v2)`` where the g
    arguments sample the source amplitude at t + {0, .5, 1, 1.5, 2} dt.
    Advances TWO classic RK4 steps of size dt."""
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
            f"(the 6p-deep slab halo must stay inside the all-pad tiles)"
        )

    shapes = _window_shapes(p, Tx)
    R1 = Tx + 6 * p
    n_max = R1 + 4 * p

    kern = functools.partial(
        _kernel_rk42_step, p=p, Tx=Tx, Ly=Ly, Lz=Lz, dtype=dtype,
        c0=float(c0), precision=precision, yz_chunk=yz_chunk,
        roll_env=roll_env,
    )
    grid_n = Lx // Tx
    interpret = jax.default_backend() != "tpu"

    full2 = lambda i: (0, 0)
    fullF = pl.BlockSpec((1, F), full2, memory_space=pltpu.VMEM)
    vout = pl.BlockSpec((Tx, F), lambda i: (i, 0), memory_space=pltpu.VMEM)

    def band_spec(nrows):
        return pl.BlockSpec((1, nrows, nrows + 2 * p),
                            lambda i: (i, 0, 0), memory_space=pltpu.VMEM)

    def mask_spec():
        return pl.BlockSpec((1, S0, 1), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)

    def step2(u0, v0, dt, g0, gh1, g1, gh2, g2, *tables):
        (WX1A, WX1B, WX1C, WX2A, WX2B, WX2C,
         CVY, CVZ, FX, SXS, SRC, ABC, W1, W2) = tables
        scal = jnp.stack(
            [jnp.asarray(s, dtype) for s in (dt, g0, gh1, g1, gh2, g2)]
        ).reshape(1, 6)
        outs = pl.pallas_call(
            kern,
            interpret=interpret,
            grid=(grid_n,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec((1, 6), full2, memory_space=pltpu.SMEM),
            ] + [band_spec(nr) for _, nr in shapes] + [
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
                pltpu.VMEM((n_max, F), dtype),
                pltpu.VMEM((R1, F), dtype),
                pltpu.VMEM((R1, F), dtype),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=128 * 1024 * 1024,
            ),
        )(
            u0.reshape(Lx, F), v0.reshape(Lx, F), scal,
            WX1A, WX1B, WX1C, WX2A, WX2B, WX2C,
            CVY, CVZ, FX, SXS, SRC, ABC, W1, W2,
        )
        u2, v2 = outs
        return u2.reshape(Lx, Ly, Lz), v2.reshape(Lx, Ly, Lz)

    return step2


def make_rk42_step(
    layout: PaddedLayout,
    tables: tuple,
    c0: float,
    dtype=jnp.float32,
    roll_env: int = 6,
):
    """2-step RK4 callable ``step2(u0, v0, dt, g0, gh1, g1, gh2, g2) ->
    (u2, v2)`` with tables closed over (single-device convenience)."""
    raw = make_rk42_step_raw(layout, c0, dtype, roll_env=roll_env)
    jts = tuple(jnp.asarray(t) for t in tables)

    def step2(u0, v0, dt, g0, gh1, g1, gh2, g2):
        return raw(u0, v0, dt, g0, gh1, g1, gh2, g2, *jts)

    return step2
