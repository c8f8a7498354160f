"""Padded-layout wave model: the production TPU hot path.

Same physics as :class:`models.linear_wave.LinearWave`, but the state lives
permanently in the aligned padded layout of ops.pallas_wave, so the RK4
loop runs with:

- one fused Pallas kernel per stage for -c0^2 (K u)/m (no pad/unpad, no
  separate mass divide)
- boundary source/ABC contributions as single-plane updates (the facet
  integrals are diagonal and live on one grid plane each)
- plain XLA axpys on padded arrays for the RK updates

Tests validate it against the reference-semantics unpadded model to f64
tolerance (interpret mode on CPU; same kernel compiles with Mosaic on TPU).
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from functools import cached_property

import jax
import jax.numpy as jnp
import numpy as np

from ..core.basis import lumped_weight_line
from ..core.mesh import BOX_FACETS
from ..ops.pallas_wave import PaddedLayout, make_padded_stiffness
from ..ops.separable import grid_lines, separable_stiffness_tables
from ..solvers.rk4 import rk4_solve, rk4_solve_n
from .linear_wave import LinearWave, lumped_boundary_weights

__all__ = ["PaddedLinearWave"]


def _flat_tile_x(p: int, want: int = 16) -> int:
    """Smallest tile >= want that is a multiple of both p and 8 (flat-kernel
    2D-DMA sublane alignment)."""
    t = max(p, want, 8)
    while t % p or t % 8:
        t += 1
    return t


@dataclass(frozen=True)
class PaddedLinearWave:
    base: LinearWave
    tile_x: int = 16
    kernel: str = "flat"  # 'flat' (z_align=16) or '3d' (z_align=128)

    @cached_property
    def _kernel_resolved(self) -> str:
        # the flat kernel's 8-deep halo windows support p <= 8; fall back
        # to the 3D-slab kernel for higher degrees
        if self.kernel == "flat" and self.base.p > 8:
            return "3d"
        return self.kernel

    @cached_property
    def layout(self) -> PaddedLayout:
        shape = tuple(n * self.base.p + 1 for n in self.base.mesh.shape)
        if self._kernel_resolved == "flat":
            return PaddedLayout(
                shape=shape, p=self.base.p,
                tile_x=_flat_tile_x(self.base.p, self.tile_x), z_align=16,
            )
        return PaddedLayout(shape=shape, p=self.base.p, tile_x=self.tile_x)

    @cached_property
    def _m_lines(self) -> list[np.ndarray]:
        m = self.base.mesh
        return [
            lumped_weight_line(m.shape[d], self.base.p, m.h[d]) for d in range(3)
        ]

    @cached_property
    def _apply(self):
        # Constants built here are cached across traces; without the
        # compile-time-eval guard a first access from inside a jit trace
        # would cache tracers (leak) instead of concrete arrays.
        with jax.ensure_compile_time_eval():
            return self._build_apply()

    def _build_apply(self):
        b = self.base
        A, _ = separable_stiffness_tables(b.p, b.mesh.h, b.dtype)
        lines = grid_lines(b.mesh.shape, b.p, b.dtype)
        coeff = -float(b.c0) ** 2
        if self._kernel_resolved == "flat":
            import jax.numpy as _jnp

            from ..ops.pallas_wave import build_tables_flat, make_apply_flat

            tables = [
                _jnp.asarray(t)
                for t in build_tables_flat(
                    self.layout, A, lines, coeff,
                    inv_m_lines=self._m_lines, dtype=b.dtype,
                )
            ]
            raw = make_apply_flat(self.layout, dtype=b.dtype)
            return lambda xp: raw(xp, *tables)
        return make_padded_stiffness(
            self.layout, A, lines, coeff,
            inv_m_lines=self._m_lines, dtype=b.dtype, yz_matmul=True,
        )

    @cached_property
    def _boundary_planes(self):
        """[(index_tuple, w1_plane_or_None, w2_plane_or_None), ...] with
        planes premultiplied by 1/m, padded to the plane's padded dims."""
        with jax.ensure_compile_time_eval():
            return self._build_boundary_planes()

    def _build_boundary_planes(self):
        b = self.base
        lay = self.layout
        m3 = np.einsum("i,j,k->ijk", *self._m_lines)
        tags = b.mesh.facet_tags
        out = []
        npdt = np.dtype(b.dtype)
        for tag, attr in ((b.source_tag, "w1"), (b.abc_tag, "w2")):
            for fid in tags.facets_of(tag):
                axis, side = BOX_FACETS[fid]
                W = lumped_boundary_weights(b.mesh, b.p, (fid,))
                idx = [slice(None)] * 3
                n_ax = W.shape[axis]
                idx[axis] = 0 if side == 0 else n_ax - 1
                plane = (W / m3)[tuple(idx)]
                # pad the 2D plane to the padded extents of its axes
                oth = [d for d in range(3) if d != axis]
                pp = np.zeros(
                    (lay.padded_shape[oth[0]], lay.padded_shape[oth[1]]),
                    dtype=npdt,
                )
                o0 = lay.x0 if oth[0] == 0 else lay.h
                o1 = lay.h  # oth[1] is never axis 0
                pp[o0 : o0 + plane.shape[0], o1 : o1 + plane.shape[1]] = plane
                # padded index of the face plane
                off = lay.x0 if axis == 0 else lay.h
                pidx = [slice(None)] * 3
                pidx[axis] = off if side == 0 else off + n_ax - 1
                out.append((axis, tuple(pidx), attr, jnp.asarray(pp)))
        return out

    # -- physics --------------------------------------------------------
    def f1(self, t, u, v):
        b = self.base
        kv = self._apply(u)
        for axis, pidx, attr, plane in self._boundary_planes:
            if attr == "w1":
                kv = kv.at[pidx].add(
                    (b.c0**2 * b.g_amplitude(t)).astype(b.dtype) * plane
                )
            else:
                kv = kv.at[pidx].add(-b.c0 * plane * v[pidx])
        return kv

    def f0(self, t, u, v):
        return v

    # -- leapfrog decomposition: f1 = force(t, u) - damping * v ---------
    def force(self, t, u):
        """v-independent part of f1 (solvers/leapfrog.py split)."""
        b = self.base
        kv = self._apply(u)
        for axis, pidx, attr, plane in self._boundary_planes:
            if attr == "w1":
                kv = kv.at[pidx].add(
                    (b.c0**2 * b.g_amplitude(t)).astype(b.dtype) * plane
                )
        return kv

    @cached_property
    def damping(self) -> jax.Array:
        """Diagonal ABC damping D = c0 W2/m as a padded array."""
        with jax.ensure_compile_time_eval():
            damp = jnp.zeros(self.layout.padded_shape,
                             dtype=self.base.dtype)
            for axis, pidx, attr, plane in self._boundary_planes:
                if attr == "w2":
                    damp = damp.at[pidx].add(self.base.c0 * plane)
            return damp

    # -- driver ----------------------------------------------------------
    def zero_state(self):
        z = jnp.zeros(self.layout.padded_shape, dtype=self.base.dtype)
        return z, z

    def solve(self, t0, tf, dt, u0=None, v0=None):
        if u0 is None:
            u0, v0 = self.zero_state()
        return rk4_solve(self.f0, self.f1, u0, v0, t0, tf, dt)

    def solve_n(self, t0, dt, nsteps, u0=None, v0=None):
        if u0 is None:
            u0, v0 = self.zero_state()
        return rk4_solve_n(self.f0, self.f1, u0, v0, t0, dt, nsteps)

    def to_grid(self, xp: jax.Array) -> jax.Array:
        return self.layout.unpad(xp)

    def from_grid(self, x: jax.Array) -> jax.Array:
        return self.layout.pad(x)


# ---------------------------------------------------------------------------
# Fully fused stage path (x-face source/ABC problems, flat layout)
# ---------------------------------------------------------------------------

def _x_face_planes(pm: "PaddedLinearWave"):
    """(w1_flat, w2_flat, src_x, abc_x) if all tagged faces are x-faces with
    exactly one source and one absorbing plane; None otherwise."""
    w1 = w2 = None
    src_x = abc_x = None
    for axis, pidx, attr, plane in pm._boundary_planes:
        if axis != 0:
            return None
        row = pidx[0]
        if attr == "w1":
            if w1 is not None:
                return None
            w1, src_x = np.asarray(plane).ravel(), row
        else:
            if w2 is not None:
                return None
            w2, abc_x = np.asarray(plane).ravel(), row
    if w1 is None or w2 is None:
        return None
    return w1, w2, src_x, abc_x


_RK_A = (0.0, 0.5, 0.5, 1.0)
_RK_B = (1 / 6, 1 / 3, 1 / 3, 1 / 6)
_RK_C = (0.0, 0.5, 0.5, 1.0)


class _FusedMixin:
    @cached_property
    def _stage_fn(self):
        with jax.ensure_compile_time_eval():
            return self._build_stage_fn()

    def _build_stage_fn(self):
        from ..ops.pallas_wave import build_tables_flat, make_rk_stage

        if self._kernel_resolved != "flat":
            return None
        planes = _x_face_planes(self)
        if planes is None:
            return None
        w1, w2, src_x, abc_x = planes
        b = self.base
        A, _ = separable_stiffness_tables(b.p, b.mesh.h, b.dtype)
        lines = grid_lines(b.mesh.shape, b.p, b.dtype)
        tables = build_tables_flat(
            self.layout, A, lines, -float(b.c0) ** 2,
            inv_m_lines=self._m_lines, dtype=b.dtype,
        )
        return make_rk_stage(
            self.layout, tables, w1, w2, src_x, abc_x, b.c0, dtype=b.dtype
        )

    def solve_fused_n(self, t0, dt, nsteps, u0=None, v0=None):
        """RK4 with one fused kernel per stage (stiffness + axpys +
        boundary planes). Falls back to :meth:`solve_n` when the fused path
        does not apply (non-x-face tags)."""
        stage = self._stage_fn
        if stage is None:
            return self.solve_n(t0, dt, nsteps, u0, v0)
        if u0 is None:
            u0, v0 = self.zero_state()
        b = self.base
        dtf = float(dt)

        def body(carry, _):
            u, v, t = carry
            ku, kv = u, v
            ua, va = u, v
            for j in range(4):
                tn = t + _RK_C[j] * dtf
                g = b.g_amplitude(tn)
                vn, kv, ua, va = stage(
                    u, ku, v, kv, ua, va, dtf * _RK_A[j], dtf * _RK_B[j], g
                )
                ku = vn
            return (ua, va, t + dtf), None

        (u, v, _), _ = jax.lax.scan(
            body,
            (u0, v0, jnp.asarray(t0, dtype=u0.dtype)),
            jnp.arange(nsteps),
        )
        return u, v, nsteps

    def solve_fused_dyn(self, t0, dt, nsteps, u0, v0):
        """:meth:`solve_fused_n` with a TRACED step count (fori_loop):
        one compiled executable serves any window length — a cold-start
        benchmark canary (1 step) and the timed run then share a compile
        (the fused kernels dominate compile time through the TPU tunnel)."""
        stage = self._stage_fn
        assert stage is not None, "fused stage kernel unavailable"
        b = self.base
        dtf = float(dt)

        def body(i, carry):
            u, v, t = carry
            ku, kv = u, v
            ua, va = u, v
            for j in range(4):
                tn = t + _RK_C[j] * dtf
                g = b.g_amplitude(tn)
                vn, kv, ua, va = stage(
                    u, ku, v, kv, ua, va, dtf * _RK_A[j], dtf * _RK_B[j], g
                )
                ku = vn
            return (ua, va, t + dtf)

        u, v, _ = jax.lax.fori_loop(
            0, nsteps, body, (u0, v0, jnp.asarray(t0, dtype=u0.dtype))
        )
        return u, v


class _StepMixin:
    @cached_property
    def _step_fn(self):
        """Fully fused RK4 STEP kernel (ops.pallas_rk4step): one Pallas call
        and one HBM pass per timestep. Requires the flat layout, x-face
        source/ABC, and tile_x >= the 3p slab halo."""
        with jax.ensure_compile_time_eval():
            return self._build_step_fn()

    def _build_step_fn(self):
        from ..ops.pallas_rk4step import _off0, build_step_tables, make_rk4_step

        if self._kernel_resolved != "flat":
            return None
        if self.layout.tile_x < _off0(self.base.p):
            return None
        planes = _x_face_planes(self)
        if planes is None:
            return None
        w1, w2, src_x, abc_x = planes
        b = self.base
        A, _ = separable_stiffness_tables(b.p, b.mesh.h, b.dtype)
        lines = grid_lines(b.mesh.shape, b.p, b.dtype)
        tables = build_step_tables(
            self.layout, A, lines, -float(b.c0) ** 2, self._m_lines,
            w1, w2, src_x, abc_x, dtype=b.dtype,
        )
        # lean kernel is the chip-validated production default (r5c);
        # WAVE_FENICS_STEP_LEAN=0 opts back into the reference kernel
        # (resolved inside make_rk4_step_raw)
        return make_rk4_step(self.layout, tables, b.c0, dtype=b.dtype)

    def solve_step_n(self, t0, dt, nsteps, u0=None, v0=None):
        """RK4 with ONE fused kernel per step (communication-avoiding:
        2 reads + 2 writes of state per step vs 40 for per-stage kernels).
        Falls back to :meth:`solve_fused_n` when the step kernel does not
        apply."""
        step = self._step_fn
        if step is None:
            return self.solve_fused_n(t0, dt, nsteps, u0, v0)
        if u0 is None:
            u0, v0 = self.zero_state()
        b = self.base
        dtf = float(dt)

        def body(carry, _):
            u, v, t = carry
            gs = [b.g_amplitude(t + c * dtf) for c in _RK_C]
            u, v = step(u, v, dtf, *gs)
            return (u, v, t + dtf), None

        (u, v, _), _ = jax.lax.scan(
            body,
            (u0, v0, jnp.asarray(t0, dtype=u0.dtype)),
            jnp.arange(nsteps),
        )
        return u, v, nsteps

    def solve_step_dyn(self, t0, dt, nsteps, u0, v0):
        """:meth:`solve_step_n` with a TRACED step count (fori_loop) —
        see :meth:`solve_fused_dyn` for why."""
        step = self._step_fn
        assert step is not None, "step kernel unavailable"
        b = self.base
        dtf = float(dt)

        def body(i, carry):
            u, v, t = carry
            gs = [b.g_amplitude(t + c * dtf) for c in _RK_C]
            u, v = step(u, v, dtf, *gs)
            return (u, v, t + dtf)

        u, v, _ = jax.lax.fori_loop(
            0, nsteps, body, (u0, v0, jnp.asarray(t0, dtype=u0.dtype))
        )
        return u, v


class _LFStepMixin:
    @cached_property
    def _lf_step_fn(self):
        """Fused leapfrog STEP kernel (ops.pallas_lfstep): one Pallas
        call and one HBM pass per leapfrog timestep (2p slab halo, two
        stencil windows). Same applicability conditions as the RK4 step
        kernel minus the deeper-halo tile bound."""
        with jax.ensure_compile_time_eval():
            return self._build_lf_step_fn()

    def _build_lf_step_fn(self):
        from ..ops.pallas_lfstep import (_off0 as _lf_off0,
                                         build_lf_tables, make_lf_step)

        if self._kernel_resolved != "flat":
            return None
        if self.layout.tile_x < _lf_off0(self.base.p):
            return None
        planes = _x_face_planes(self)
        if planes is None:
            return None
        w1, w2, src_x, abc_x = planes
        b = self.base
        A, _ = separable_stiffness_tables(b.p, b.mesh.h, b.dtype)
        lines = grid_lines(b.mesh.shape, b.p, b.dtype)
        tables = build_lf_tables(
            self.layout, A, lines, -float(b.c0) ** 2, self._m_lines,
            w1, w2, src_x, abc_x, dtype=b.dtype,
        )
        return make_lf_step(self.layout, tables, b.c0, dtype=b.dtype)

    def solve_lf_n(self, t0, dt, nsteps, u0=None, v0=None):
        """Leapfrog with ONE fused kernel per step (solvers/leapfrog.py
        semantics: kick-drift-kick, semi-implicit/adjoint ABC damping).
        dt must satisfy the leapfrog CFL (~0.71x the RK4 step). Raises
        when the fused path does not apply — there is no cheap XLA
        fallback with identical cost, so silence would mislead."""
        step = self._lf_step_fn
        if step is None:
            raise ValueError(
                "fused leapfrog step kernel unavailable for this "
                "config (needs flat layout + x-face source/ABC + "
                "tile_x >= the 2p slab halo)"
            )
        if u0 is None:
            u0, v0 = self.zero_state()
        b = self.base
        dtf = float(dt)

        def body(carry, _):
            u, v, t = carry
            g0 = b.g_amplitude(t)
            g1 = b.g_amplitude(t + dtf)
            u, v = step(u, v, dtf, g0, g1)
            return (u, v, t + dtf), None

        (u, v, _), _ = jax.lax.scan(
            body,
            (u0, v0, jnp.asarray(t0, dtype=u0.dtype)),
            jnp.arange(nsteps),
        )
        return u, v, nsteps

    def solve_lf_dyn(self, t0, dt, nsteps, u0, v0):
        """:meth:`solve_lf_n` with a TRACED step count (fori_loop) —
        canary and timed window share one executable."""
        step = self._lf_step_fn
        assert step is not None, "leapfrog step kernel unavailable"
        b = self.base
        dtf = float(dt)

        def body(i, carry):
            u, v, t = carry
            g0 = b.g_amplitude(t)
            g1 = b.g_amplitude(t + dtf)
            u, v = step(u, v, dtf, g0, g1)
            return (u, v, t + dtf)

        u, v, _ = jax.lax.fori_loop(
            0, nsteps, body, (u0, v0, jnp.asarray(t0, dtype=u0.dtype))
        )
        return u, v


class _LF2StepMixin:
    @cached_property
    def _lf2_step_fn(self):
        """Temporal-blocked leapfrog kernel (ops.pallas_lf2step): TWO
        timesteps per Pallas call / HBM pass (3p slab halo, three
        stencil windows, step-boundary force computed once). Same
        applicability conditions as the single-step leapfrog kernel
        with the deeper halo tile bound."""
        with jax.ensure_compile_time_eval():
            return self._build_lf2_step_fn()

    def _build_lf2_step_fn(self):
        from ..ops.pallas_lf2step import (_off0 as _lf2_off0,
                                          build_lf2_tables,
                                          make_lf2_step)

        if self._kernel_resolved != "flat":
            return None
        if self.layout.tile_x < _lf2_off0(self.base.p):
            return None
        planes = _x_face_planes(self)
        if planes is None:
            return None
        w1, w2, src_x, abc_x = planes
        b = self.base
        A, _ = separable_stiffness_tables(b.p, b.mesh.h, b.dtype)
        lines = grid_lines(b.mesh.shape, b.p, b.dtype)
        tables = build_lf2_tables(
            self.layout, A, lines, -float(b.c0) ** 2, self._m_lines,
            w1, w2, src_x, abc_x, dtype=b.dtype,
        )
        return make_lf2_step(self.layout, tables, b.c0, dtype=b.dtype)

    def solve_lf2_n(self, t0, dt, nsteps, u0=None, v0=None):
        """Leapfrog with TWO timesteps per fused kernel call (same
        scheme/CFL as :meth:`solve_lf_n`; an odd trailing step runs
        through the single-step kernel). Raises when the fused path
        does not apply."""
        step2 = self._lf2_step_fn
        if step2 is None:
            raise ValueError(
                "fused 2-step leapfrog kernel unavailable for this "
                "config (needs flat layout + x-face source/ABC + "
                "tile_x >= the 3p slab halo)"
            )
        if u0 is None:
            u0, v0 = self.zero_state()
        b = self.base
        dtf = float(dt)

        def body(carry, _):
            u, v, t = carry
            g0 = b.g_amplitude(t)
            g1 = b.g_amplitude(t + dtf)
            g2 = b.g_amplitude(t + 2 * dtf)
            u, v = step2(u, v, dtf, g0, g1, g2)
            return (u, v, t + 2 * dtf), None

        (u, v, t), _ = jax.lax.scan(
            body,
            (u0, v0, jnp.asarray(t0, dtype=u0.dtype)),
            jnp.arange(nsteps // 2),
        )
        if nsteps % 2:
            step = self._lf_step_fn
            g0 = b.g_amplitude(t)
            g1 = b.g_amplitude(t + dtf)
            u, v = step(u, v, dtf, g0, g1)
        return u, v, nsteps

    def solve_lf2_dyn(self, t0, dt, nsteps, u0, v0):
        """:meth:`solve_lf2_n` with a TRACED step count. Caller
        contract: ``nsteps`` must be EVEN (bench.py enforces it) —
        handling an odd tail in-graph would compile the single-step
        kernel into every executable for a case the benchmarks never
        hit."""
        step2 = self._lf2_step_fn
        assert step2 is not None, "2-step leapfrog kernel unavailable"
        b = self.base
        dtf = float(dt)

        def body(i, carry):
            u, v, t = carry
            g0 = b.g_amplitude(t)
            g1 = b.g_amplitude(t + dtf)
            g2 = b.g_amplitude(t + 2 * dtf)
            u, v = step2(u, v, dtf, g0, g1, g2)
            return (u, v, t + 2 * dtf)

        u, v, _ = jax.lax.fori_loop(
            0, nsteps // 2, body,
            (u0, v0, jnp.asarray(t0, dtype=u0.dtype)),
        )
        return u, v


class _RK42StepMixin:
    @cached_property
    def _rk42_step_fn(self):
        """Temporal-blocked RK4 kernel (ops.pallas_rk42step): TWO full
        RK4 timesteps per Pallas call / HBM pass (6p slab halo, six
        stage windows, step-1 evaluated on a 3p superset so step 2
        never leaves VMEM). Same applicability conditions as the
        single-step RK4 kernel with the deeper halo tile bound."""
        with jax.ensure_compile_time_eval():
            return self._build_rk42_step_fn()

    def _build_rk42_step_fn(self):
        from ..ops.pallas_rk42step import (_off0 as _rk42_off0,
                                           build_rk42_tables,
                                           make_rk42_step)

        if self._kernel_resolved != "flat":
            return None
        if self.layout.tile_x < _rk42_off0(self.base.p):
            return None
        planes = _x_face_planes(self)
        if planes is None:
            return None
        w1, w2, src_x, abc_x = planes
        b = self.base
        A, _ = separable_stiffness_tables(b.p, b.mesh.h, b.dtype)
        lines = grid_lines(b.mesh.shape, b.p, b.dtype)
        tables = build_rk42_tables(
            self.layout, A, lines, -float(b.c0) ** 2, self._m_lines,
            w1, w2, src_x, abc_x, dtype=b.dtype,
        )
        # live-roll envelope of the 2-step kernel, in units of (Tx+4p)
        # rows — the VMEM-spill lever (the r4e hardwired-9 form OOM'd
        # the Mosaic register allocator). The knob OVERRIDES an active
        # default of 6; unset does NOT mean the old behavior.
        roll_env = int(os.environ.get("WAVE_FENICS_RK42_ROLL_ENV", "6"))
        return make_rk42_step(self.layout, tables, b.c0, dtype=b.dtype,
                              roll_env=roll_env)

    def solve_step2_n(self, t0, dt, nsteps, u0=None, v0=None):
        """Classic RK4 with TWO timesteps per fused kernel call (same
        scheme/accuracy as :meth:`solve_step_n`, ulp-level wedge
        recomputation differences only; an odd trailing step runs
        through the single-step kernel). Raises when the fused path
        does not apply."""
        step2 = self._rk42_step_fn
        if step2 is None:
            raise ValueError(
                "fused 2-step RK4 kernel unavailable for this config "
                "(needs flat layout + x-face source/ABC + tile_x >= "
                "the 6p slab halo)"
            )
        if u0 is None:
            u0, v0 = self.zero_state()
        b = self.base
        dtf = float(dt)

        def body(carry, _):
            u, v, t = carry
            gs = [b.g_amplitude(t + j * 0.5 * dtf) for j in range(5)]
            u, v = step2(u, v, dtf, *gs)
            return (u, v, t + 2 * dtf), None

        (u, v, t), _ = jax.lax.scan(
            body,
            (u0, v0, jnp.asarray(t0, dtype=u0.dtype)),
            jnp.arange(nsteps // 2),
        )
        if nsteps % 2:
            step = self._step_fn
            gs = [b.g_amplitude(t + c * dtf) for c in _RK_C]
            u, v = step(u, v, dtf, *gs)
        return u, v, nsteps

    def solve_step2_dyn(self, t0, dt, nsteps, u0, v0):
        """:meth:`solve_step2_n` with a TRACED step count. Caller
        contract: ``nsteps`` must be EVEN (bench.py enforces it)."""
        step2 = self._rk42_step_fn
        assert step2 is not None, "2-step RK4 kernel unavailable"
        b = self.base
        dtf = float(dt)

        def body(i, carry):
            u, v, t = carry
            gs = [b.g_amplitude(t + j * 0.5 * dtf) for j in range(5)]
            u, v = step2(u, v, dtf, *gs)
            return (u, v, t + 2 * dtf)

        u, v, _ = jax.lax.fori_loop(
            0, nsteps // 2, body,
            (u0, v0, jnp.asarray(t0, dtype=u0.dtype)),
        )
        return u, v


# Graft the fused-stage methods onto the (frozen) dataclass. The
# cached_property descriptor keeps the __set_name__ binding it received in
# _FusedMixin ('_stage_fn'), which matches the attribute name here.
PaddedLinearWave._stage_fn = _FusedMixin._stage_fn
PaddedLinearWave._build_stage_fn = _FusedMixin._build_stage_fn
PaddedLinearWave.solve_fused_n = _FusedMixin.solve_fused_n
PaddedLinearWave.solve_fused_dyn = _FusedMixin.solve_fused_dyn
PaddedLinearWave._step_fn = _StepMixin._step_fn
PaddedLinearWave._build_step_fn = _StepMixin._build_step_fn
PaddedLinearWave.solve_step_n = _StepMixin.solve_step_n
PaddedLinearWave.solve_step_dyn = _StepMixin.solve_step_dyn
PaddedLinearWave._lf_step_fn = _LFStepMixin._lf_step_fn
PaddedLinearWave._build_lf_step_fn = _LFStepMixin._build_lf_step_fn
PaddedLinearWave.solve_lf_n = _LFStepMixin.solve_lf_n
PaddedLinearWave.solve_lf_dyn = _LFStepMixin.solve_lf_dyn
PaddedLinearWave._lf2_step_fn = _LF2StepMixin._lf2_step_fn
PaddedLinearWave._build_lf2_step_fn = _LF2StepMixin._build_lf2_step_fn
PaddedLinearWave.solve_lf2_n = _LF2StepMixin.solve_lf2_n
PaddedLinearWave.solve_lf2_dyn = _LF2StepMixin.solve_lf2_dyn
PaddedLinearWave._rk42_step_fn = _RK42StepMixin._rk42_step_fn
PaddedLinearWave._build_rk42_step_fn = _RK42StepMixin._build_rk42_step_fn
PaddedLinearWave.solve_step2_n = _RK42StepMixin.solve_step2_n
PaddedLinearWave.solve_step2_dyn = _RK42StepMixin.solve_step2_dyn
