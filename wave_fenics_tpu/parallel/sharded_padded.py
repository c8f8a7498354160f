"""Multi-chip production path: padded fused kernel under shard_map.

Combines the two performance layers:

- per device: the padded-layout fused Pallas stiffness/m kernel
  (ops.pallas_wave) on the device's block of cells
- across devices: one 3-axis ppermute halo-add of the interior interface
  planes per RK stage (parallel.halo semantics on padded blocks)

Key distribution facts (see ops.pallas_wave.build_tables):
- each device builds its stencil tables AS IF its subdomain had domain
  faces; the halo-add of the resulting single-sided partial sums
  reconstructs the full stencil on interface dofs exactly
- the 1/m division uses GLOBAL mass-line slices per device (division is
  linear, so it commutes with the partial-sum halo-add)
- boundary source/ABC planes are added BEFORE the halo-add, so shared
  face-edge dofs accumulate their facet contributions across devices

Tables differ per device only through the global-mass slices and face
corrections, and are fed as sharded operands.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import cached_property

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax, shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.basis import lumped_weight_line
from ..core.mesh import BOX_FACETS
from ..models.linear_wave import LinearWave
from ..ops.pallas_wave import (PaddedLayout, build_tables, build_tables_flat,
                               make_apply, make_apply_flat)
from ..ops.separable import separable_stiffness_tables
from ..solvers.rk4 import rk4_solve_n
from .partition import make_device_mesh

__all__ = ["ShardedPaddedWave"]


@dataclass(frozen=True)
class ShardedPaddedWave:
    model: LinearWave
    parts: tuple[int, int, int]
    tile_x: int = 16
    devices: tuple | None = None
    kernel: str = "flat"  # 'flat' (z_align=16) or '3d' (z_align=128)
    #: overlap the x-axis halo exchange with the interior kernel: the
    #: interface-plane values are recomputed from u by a cheap XLA slab
    #: formula and ppermuted BEFORE the Pallas kernel runs, so XLA's async
    #: collective-permute rides ICI while the MXU chews the interior — the
    #: update_fwd_begin/end split of the reference
    #: (demo/gpu_scatter_mpi/VectorUpdater.hpp:106-143), TPU-style.
    overlap_x: bool = True

    def __post_init__(self):
        for n, m in zip(self.model.mesh.shape, self.parts):
            if n % m != 0:
                raise ValueError(
                    f"cells {self.model.mesh.shape} not divisible by {self.parts}"
                )

    # -- geometry ---------------------------------------------------------
    @cached_property
    def mesh(self) -> Mesh:
        return make_device_mesh(self.parts, self.devices)

    @cached_property
    def local_cells(self) -> tuple[int, int, int]:
        return tuple(n // m for n, m in zip(self.model.mesh.shape, self.parts))

    @cached_property
    def _kernel_resolved(self) -> str:
        # flat kernel's 8-deep halo windows support p <= 8
        if self.kernel == "flat" and self.model.p > 8:
            return "3d"
        return self.kernel

    @cached_property
    def layout(self) -> PaddedLayout:
        shape = tuple(n * self.model.p + 1 for n in self.local_cells)
        if self._kernel_resolved == "flat":
            from ..models.linear_wave_padded import _flat_tile_x

            return PaddedLayout(
                shape=shape, p=self.model.p,
                tile_x=_flat_tile_x(self.model.p, self.tile_x), z_align=16,
            )
        return PaddedLayout(shape=shape, p=self.model.p, tile_x=self.tile_x)

    # -- per-device tables ------------------------------------------------
    @cached_property
    def _global_m_lines(self) -> list[np.ndarray]:
        gm = self.model.mesh
        return [
            lumped_weight_line(gm.shape[d], self.model.p, gm.h[d])
            for d in range(3)
        ]

    def _m_slice(self, axis: int, b: int) -> np.ndarray:
        p = self.model.p
        nl = self.local_cells[axis]
        start = b * nl * p
        return self._global_m_lines[axis][start : start + nl * p + 1]

    @cached_property
    def _tables(self):
        """Blocked sharded table arrays (LYZ, LXZ, LXY, CVX, CVY, CVZ)."""
        md = self.model
        p = md.p
        lay = self.layout
        mx, my, mz = self.parts
        A, _ = separable_stiffness_tables(p, md.mesh.h, md.dtype)
        local_lines = [
            lumped_weight_line(n, p, 1.0) for n in self.local_cells
        ]
        coeff = -float(md.c0) ** 2

        flat = self._kernel_resolved == "flat"

        def tables_for(bx, by, bz):
            inv_m = [
                self._m_slice(0, bx),
                self._m_slice(1, by),
                self._m_slice(2, bz),
            ]
            if flat:
                return build_tables_flat(
                    lay, A, local_lines, coeff, inv_m, md.dtype
                )
            return build_tables(
                lay, A, local_lines, coeff, inv_m, md.dtype, yz_matmul=True
            )

        # table index -> which block axes it depends on
        if flat:
            # (WXT, CVY, CVZ, FX, GZ, GY, SX)
            deps = {0: (0,), 1: (1,), 2: (2,), 3: (1, 2), 4: (2,), 5: (1,),
                    6: (0,)}
        else:
            # (LYZ, LXZ, LXY, CVX, CVY, CVZ)
            deps = {0: (1, 2), 1: (0, 2), 2: (0, 1), 3: (0,), 4: (1,),
                    5: (2,)}
        ms = (mx, my, mz)
        shape0 = [t.shape for t in tables_for(0, 0, 0)]
        nt = len(shape0)
        blocked = []
        for ti in range(nt):
            d = deps[ti]
            lead = tuple(ms[a] for a in d)
            arr = np.zeros(lead + shape0[ti], dtype=np.dtype(md.dtype))
            blocked.append(arr)
        for bx in range(mx):
            for by in range(my):
                for bz in range(mz):
                    ts = tables_for(bx, by, bz)
                    b = (bx, by, bz)
                    for ti in range(nt):
                        idx = tuple(b[a] for a in deps[ti])
                        blocked[ti][idx] = ts[ti]

        axis_names = ("x", "y", "z")
        out = []
        for ti in range(nt):
            d = deps[ti]
            spec = P(*[axis_names[a] for a in d],
                     *([None] * len(shape0[ti])))
            out.append(
                jax.device_put(
                    jnp.asarray(blocked[ti]), NamedSharding(self.mesh, spec)
                )
            )
        return tuple(out), deps

    @cached_property
    def _apply_raw(self):
        if self._kernel_resolved == "flat":
            return make_apply_flat(self.layout, self.model.dtype)
        return make_apply(self.layout, self.model.dtype, yz_matmul=True)

    # -- overlapped x-face exchange operands -------------------------------
    @cached_property
    def _face_consts(self) -> dict:
        """Block-independent np constants for the x-interface face formula.

        The stiffness output on a block's boundary x-plane, single-sided
        (the quantity today's halo-add exchanges), separates as

            kv[face] = coeff * ( (A_x[edge,:] . u_slab) * Ly(x)Lz
                               + B_y(A_y) u_plane * Lx[edge] Lz
                               + B_z(A_z) u_plane * Lx[edge] Ly ) / m

        — a (p+1)-deep slab contraction plus two in-plane 1D passes, cheap
        enough to recompute from u so the exchange no longer depends on the
        Pallas kernel's output.
        """
        md = self.model
        p = md.p
        npdt = np.dtype(md.dtype)
        A, _ = separable_stiffness_tables(p, md.mesh.h, md.dtype)
        Ll = [
            lumped_weight_line(n, p, 1.0).astype(npdt)
            for n in self.local_cells
        ]
        return {
            "Ax0": A[0][0].astype(npdt),
            "Axp": A[0][p].astype(npdt),
            "Ay": A[1].astype(npdt),
            "Az": A[2].astype(npdt),
            "Ly": Ll[1],
            "Lz": Ll[2],
            "Lyz": np.outer(Ll[1], Ll[2]).astype(npdt),
            "Lx0": float(Ll[0][0]),
            "coeff": -float(md.c0) ** 2,
        }

    @cached_property
    def _face_inv(self):
        """Blocked [mx,my,mz,ny,nz] 1/m planes for each block's lo/hi
        x-interface plane, or None when overlap is off / no x exchange."""
        if self.parts[0] == 1 or not self.overlap_x:
            return None
        md = self.model
        p = md.p
        mx, my, mz = self.parts
        ny, nz = self.layout.shape[1], self.layout.shape[2]
        nlx = self.local_cells[0]
        npdt = np.dtype(md.dtype)
        inv = np.zeros((2, mx, my, mz, ny, nz), dtype=npdt)
        mx_line = self._global_m_lines[0]
        for bx in range(mx):
            g_lo = bx * nlx * p
            g_hi = g_lo + nlx * p
            for by in range(my):
                msy = self._m_slice(1, by)
                for bz in range(mz):
                    myz = np.outer(msy, self._m_slice(2, bz))
                    inv[0, bx, by, bz] = 1.0 / (mx_line[g_lo] * myz)
                    inv[1, bx, by, bz] = 1.0 / (mx_line[g_hi] * myz)
        sh = NamedSharding(self.mesh, P("x", "y", "z", None, None))
        return (
            jax.device_put(jnp.asarray(inv[0]), sh),
            jax.device_put(jnp.asarray(inv[1]), sh),
        )

    def _faces_x(self, t, u, v, inv_lo, inv_hi, planes):
        """Single-sided x-interface plane values of f1, computed from u
        (local shard terms). Returns (face_lo, face_hi), each [ny, nz]."""
        from ..ops.separable import apply_block_axis

        md = self.model
        lay = self.layout
        p = md.p
        nx, ny, nz = lay.shape
        x0 = lay.x0
        fc = self._face_consts
        yint = slice(p, p + ny)
        zint = slice(p, p + nz)
        slab_lo = u[x0 : x0 + p + 1, yint, zint]
        slab_hi = u[x0 + nx - 1 - p : x0 + nx, yint, zint]

        def face(slab, arow, edge, inv):
            plane = slab[edge]
            tx = jnp.tensordot(
                jnp.asarray(arow), slab, axes=(0, 0),
                precision=jax.lax.Precision.HIGHEST,
            )
            ty = apply_block_axis(plane[None], fc["Ay"], p, 1)[0]
            tz = apply_block_axis(plane[None], fc["Az"], p, 2)[0]
            val = fc["coeff"] * (
                tx * fc["Lyz"]
                + ty * (fc["Lx0"] * fc["Lz"])[None, :]
                + tz * (fc["Lx0"] * fc["Ly"])[:, None]
            )
            return val * inv

        faces = [
            face(slab_lo, fc["Ax0"], 0, inv_lo),
            face(slab_hi, fc["Axp"], p, inv_hi),
        ]

        # boundary (source/ABC) contributions restricted to the x planes
        gt = (md.c0**2 * md.g_amplitude(t)).astype(md.dtype)
        c0 = md.c0
        xpl = (x0, x0 + nx - 1)
        for pidx, attr, pl_ in planes:
            axis = next(d for d in range(3) if not isinstance(pidx[d], slice))
            if axis == 0:
                tgt = 0 if pidx[0] == x0 else 1
                seg = pl_[yint, zint]
                if attr == "w1":
                    faces[tgt] = faces[tgt] + gt * seg
                else:
                    faces[tgt] = faces[tgt] - c0 * seg * v[pidx[0], yint, zint]
            elif axis == 1:
                ri = pidx[1] - p
                for tgt in (0, 1):
                    seg = pl_[xpl[tgt], zint]
                    if attr == "w1":
                        faces[tgt] = faces[tgt].at[ri, :].add(gt * seg)
                    else:
                        faces[tgt] = faces[tgt].at[ri, :].add(
                            -c0 * seg * v[xpl[tgt], pidx[1], zint]
                        )
            else:
                ci = pidx[2] - p
                for tgt in (0, 1):
                    seg = pl_[xpl[tgt], yint]
                    if attr == "w1":
                        faces[tgt] = faces[tgt].at[:, ci].add(gt * seg)
                    else:
                        faces[tgt] = faces[tgt].at[:, ci].add(
                            -c0 * seg * v[xpl[tgt], yint, pidx[2]]
                        )
        return faces[0], faces[1]

    # -- boundary planes (blocked; zero off the global faces) -------------
    @cached_property
    def _boundary_planes(self):
        md = self.model
        lay = self.layout
        p = md.p
        mx, my, mz = self.parts
        m3_lines = self._global_m_lines
        out = []
        npdt = np.dtype(md.dtype)
        for tag, attr in ((md.source_tag, "w1"), (md.abc_tag, "w2")):
            for fid in md.mesh.facet_tags.facets_of(tag):
                axis, side = BOX_FACETS[fid]
                oth = [d for d in range(3) if d != axis]
                # blocked per-device padded planes; nonzero only on devices
                # at the face side of `axis`; LOCAL lumped facet weights
                # (halo-add sums the shared-edge contributions)
                nl0 = self.local_cells[oth[0]] * p + 1
                nl1 = self.local_cells[oth[1]] * p + 1
                L0 = lay.padded_shape[oth[0]]
                L1 = lay.padded_shape[oth[1]]
                o0 = lay.x0 if oth[0] == 0 else lay.h
                o1 = lay.h
                blocked = np.zeros((mx, my, mz, L0, L1), dtype=npdt)
                # local facet-lumped weights per block (single-sided at
                # local edges) over the block's global slice of the plane
                for b0 in range(self.parts[oth[0]]):
                    for b1 in range(self.parts[oth[1]]):
                        lines = []
                        for a, b in ((oth[0], b0), (oth[1], b1)):
                            lines.append(
                                lumped_weight_line(
                                    self.local_cells[a], p, md.mesh.h[a]
                                )
                            )
                        wloc = np.outer(lines[0], lines[1])
                        # divide by global m on the local slice
                        mseg = np.outer(
                            self._m_slice(oth[0], b0), self._m_slice(oth[1], b1)
                        )
                        # global-face mass factor on the face axis
                        mface = m3_lines[axis][
                            0 if side == 0 else -1
                        ]
                        plane_loc = wloc / (mseg * mface)
                        pp = np.zeros((L0, L1), dtype=npdt)
                        pp[o0 : o0 + nl0, o1 : o1 + nl1] = plane_loc
                        bidx = [slice(None)] * 3
                        bidx[axis] = 0 if side == 0 else self.parts[axis] - 1
                        bidx[oth[0]] = b0
                        bidx[oth[1]] = b1
                        blocked[tuple(bidx)] = pp
                pidx = [slice(None)] * 3
                off = lay.x0 if axis == 0 else lay.h
                n_ax = self.local_cells[axis] * p + 1
                pidx[axis] = off if side == 0 else off + n_ax - 1
                arr = jax.device_put(
                    jnp.asarray(blocked),
                    NamedSharding(self.mesh, P("x", "y", "z", None, None)),
                )
                out.append((tuple(pidx), attr, arr))
        return out

    # -- halo-add on padded blocks ---------------------------------------
    def _halo_add_padded(self, a: jax.Array, skip_x: bool = False) -> jax.Array:
        """Halo-add the interior interface planes of a local padded block."""
        lay = self.layout
        p = self.model.p
        offs = (lay.x0, lay.h, lay.h)
        for axis, (name, size) in enumerate(
            zip(("x", "y", "z"), self.parts)
        ):
            if size == 1 or (axis == 0 and skip_x):
                continue
            n_ax = lay.shape[axis]
            lo_i = offs[axis]
            hi_i = offs[axis] + n_ax - 1
            lo = lax.slice_in_dim(a, lo_i, lo_i + 1, axis=axis)
            hi = lax.slice_in_dim(a, hi_i, hi_i + 1, axis=axis)
            left_perm = [(i, i - 1) for i in range(1, size)]
            right_perm = [(i, i + 1) for i in range(size - 1)]
            from_right = lax.ppermute(lo, name, left_perm)
            from_left = lax.ppermute(hi, name, right_perm)
            idx_lo = [slice(None)] * 3
            idx_lo[axis] = lo_i
            idx_hi = [slice(None)] * 3
            idx_hi[axis] = hi_i
            a = a.at[tuple(idx_lo)].add(from_left.squeeze(axis))
            a = a.at[tuple(idx_hi)].add(from_right.squeeze(axis))
        return a

    # -- physics ----------------------------------------------------------
    def _f1_local(self, t, u, v, tables, planes, face_inv=None):
        md = self.model
        if face_inv is not None:
            # overlapped x exchange: face values depend only on u, so the
            # ppermute is issued BEFORE the interior kernel and XLA's async
            # collective-permute rides ICI while the kernel runs
            face_lo, face_hi = self._faces_x(t, u, v, *face_inv, planes)
            size = self.parts[0]
            from_right = lax.ppermute(
                face_lo, "x", [(i, i - 1) for i in range(1, size)]
            )
            from_left = lax.ppermute(
                face_hi, "x", [(i, i + 1) for i in range(size - 1)]
            )
        kv = self._apply_raw(u, *tables)
        for pidx, attr, plane in planes:
            if attr == "w1":
                kv = kv.at[pidx].add(
                    (md.c0**2 * md.g_amplitude(t)).astype(md.dtype) * plane
                )
            else:
                kv = kv.at[pidx].add(-md.c0 * plane * v[pidx])
        if face_inv is not None:
            lay = self.layout
            p = md.p
            nx, ny, nz = lay.shape
            x0 = lay.x0
            yint = slice(p, p + ny)
            zint = slice(p, p + nz)
            # both copies of each interface plane compute the SAME sum
            # (mine + received), so the duplicated-plane invariant holds
            # exactly; edge devices receive ppermute zeros and keep their
            # single-sided (global-face) value
            kv = kv.at[x0, yint, zint].set(face_lo + from_left)
            kv = kv.at[x0 + nx - 1, yint, zint].set(face_hi + from_right)
            return self._halo_add_padded(kv, skip_x=True)
        return self._halo_add_padded(kv)

    # -- driver ------------------------------------------------------------
    def zero_state(self):
        mx, my, mz = self.parts
        shape = (mx, my, mz) + self.layout.padded_shape
        z = jax.device_put(
            jnp.zeros(shape, dtype=self.model.dtype),
            NamedSharding(self.mesh, P("x", "y", "z", None, None, None)),
        )
        return z, z

    def solve(self, t0, tf, dt, u0=None, v0=None):
        return self.solve_n(t0, dt, int(round((tf - t0) / dt)), u0, v0)

    def solve_n(self, t0, dt, nsteps, u0=None, v0=None):
        """Distributed RK4 for a static number of steps (jit-cache friendly:
        recompiles only on a new ``nsteps``, not on every (t0, tf) pair)."""
        if u0 is None:
            u0, v0 = self.zero_state()
        tables, deps = self._tables
        planes = self._boundary_planes
        face_inv = self._face_inv
        state_spec = P("x", "y", "z", None, None, None)
        table_specs = tuple(t.sharding.spec for t in tables)
        plane_specs = tuple(p[2].sharding.spec for p in planes)
        face_specs = (
            () if face_inv is None
            else tuple(f.sharding.spec for f in face_inv)
        )

        def local_solve(u, v, *ops):
            tbl = [o.reshape(o.shape[o.ndim - nd:])
                   for o, nd in zip(ops[: len(tables)],
                                    [t.ndim - len(deps[i]) for i, t in
                                     enumerate(tables)])]
            pls = [
                (planes[i][0], planes[i][1],
                 ops[len(tables) + i].reshape(
                     ops[len(tables) + i].shape[3:]
                 ))
                for i in range(len(planes))
            ]
            fin = None
            if face_inv is not None:
                fin = tuple(
                    o.reshape(o.shape[3:])
                    for o in ops[len(tables) + len(planes):]
                )
            usq = u.reshape(u.shape[3:])
            vsq = v.reshape(v.shape[3:])
            f0 = lambda t, uu, vv: vv
            f1 = lambda t, uu, vv: self._f1_local(t, uu, vv, tbl, pls, fin)
            uo, vo = rk4_solve_n(f0, f1, usq, vsq, t0, dt, nsteps)
            return uo.reshape(u.shape), vo.reshape(v.shape)

        sm = shard_map(
            local_solve,
            mesh=self.mesh,
            in_specs=(state_spec, state_spec) + table_specs + plane_specs
            + face_specs,
            out_specs=(state_spec, state_spec),
            # pallas_call outputs carry no varying-mesh-axes metadata
            check_vma=False,
        )
        u, v = jax.jit(sm)(
            u0, v0, *tables, *[p[2] for p in planes],
            *(face_inv if face_inv is not None else ()),
        )
        return u, v, nsteps

    # -- distributed value-halo fused-step mode ----------------------------
    #
    # Instead of one partial-sum halo-add per RK STAGE (4 x 1-plane
    # exchanges per step), exchange 3p-deep VALUE halos of (u, v) once per
    # step and run the communication-avoiding fused RK4 step kernel
    # (ops.pallas_rk4step) locally. Tables carry GLOBAL assembled stencil
    # coefficients sliced per block (halo regions hold the true neighbor
    # coefficients; face corrections only at true domain faces), so each
    # device computes the full stencil for every row it owns — no partial
    # sums, no per-stage communication. This is the distributed form of
    # the reference's update_fwd_begin/end overlap
    # (demo/gpu_scatter_mpi/VectorUpdater.hpp:106-143): fewer, deeper
    # messages and zero intermediate HBM traffic.

    @cached_property
    def _step_layout(self) -> PaddedLayout | None:
        if self._kernel_resolved != "flat":
            return None
        from ..models.linear_wave_padded import _flat_tile_x
        from ..ops.pallas_rk4step import _off0

        p = self.model.p
        # Minimum-local-extent guard: the value-halo refresh is ONE-hop, so
        # a block must be able to supply a neighbor's full 3p halo from rows
        # that are themselves valid to that depth. With 1 cell per block on
        # an axis split >= 3 ways (Nloc-1 = p < 3p), the sent slab would
        # include the sender's own halo rows — valid only to depth p after a
        # step (and the x low side is re-zeroed by the kernel's pad tile) —
        # so interior dofs needing depth-2p inputs silently corrupt within a
        # few steps. Fall back to the per-stage halo-add path (solve_n).
        if any(m >= 3 and n < 2
               for n, m in zip(self.local_cells, self.parts)):
            return None
        shape = tuple(n * p + 1 for n in self.local_cells)
        tx = _flat_tile_x(p, max(self.tile_x, _off0(p)))
        return PaddedLayout(shape=shape, p=p, tile_x=tx, z_align=16,
                            halo=3 * p)

    def _embed_global(self, gvec: np.ndarray, axis: int, b: int,
                      lay: PaddedLayout, h: int | None = None
                      ) -> np.ndarray:
        """Slice a global per-dof axis vector for block ``b`` including the
        value halo (default 3p), embedded at the block's padded offsets
        (zeros outside the domain)."""
        h = 3 * self.model.p if h is None else h
        off = lay.x0 if axis == 0 else lay.h
        L = lay.padded_shape[axis]
        Nloc = lay.shape[axis]
        g0 = b * (Nloc - 1)
        out = np.zeros((gvec.shape[:-1] + (L,)), dtype=gvec.dtype)
        lo = max(0, g0 - h)
        hi = min(gvec.shape[-1], g0 + Nloc + h)
        out[..., off - (g0 - lo) : off + (hi - g0)] = gvec[..., lo:hi]
        return out

    @cached_property
    def _step_tables(self):
        """Blocked sharded step tables + per-axis deps, or None when the
        step path does not apply (non-flat kernel, non-x-face tags, or a
        tile too small for the 3p slab halo)."""
        from ..ops.pallas_rk4step import (_off0, build_step_tables_from_cv)

        lay = self._step_layout
        if lay is None or lay.tile_x < _off0(self.model.p):
            return None
        # table index -> block-axis deps for
        # (WXA, WXB, WXC, CVY, CVZ, FX, SXS, SRC, ABC, W1, W2)
        # CVY/CVZ carry the folded gz/gy line factors, so they depend on
        # BOTH plane axes.
        deps = {0: (0,), 1: (0,), 2: (0,), 3: (1, 2), 4: (1, 2), 5: (1, 2),
                6: (0,), 7: (0,), 8: (0,), 9: (1, 2), 10: (1, 2)}
        return self._value_halo_tables(
            lay, 3 * self.model.p, build_step_tables_from_cv, deps
        )

    def _value_halo_tables(self, lay, h, build_fn, deps):
        """Blocked sharded tables for a value-halo fused kernel family
        (``build_fn`` = the rk4step or lfstep table builder, ``h`` the
        value-halo depth), or None for non-x-face tag configs."""
        from ..ops.pallas_stiffness import banded_1d_coeffs

        md = self.model
        p = md.p
        mx, my, mz = self.parts
        # x-face source/ABC only (planar3d shape); otherwise fall back
        tags = md.mesh.facet_tags
        faces = {}
        for tag, attr in ((md.source_tag, "w1"), (md.abc_tag, "w2")):
            fl = tags.facets_of(tag)
            if len(fl) != 1 or BOX_FACETS[fl[0]][0] != 0 or attr in faces:
                return None
            faces[attr] = BOX_FACETS[fl[0]][1]
        if faces.get("w1") != 0 or faces.get("w2") != 1:
            return None

        coeff = -float(md.c0) ** 2
        A, _ = separable_stiffness_tables(p, md.mesh.h, md.dtype)
        gshape = tuple(n * p + 1 for n in md.mesh.shape)
        K = 2 * p + 1
        glines = [lumped_weight_line(n, p, 1.0) for n in md.mesh.shape]
        ginv = [1.0 / m for m in self._global_m_lines]

        def gcv(Ad, Ng, inv):
            return banded_1d_coeffs(Ad, Ng, p, scale=coeff) * inv[None, :]

        gcvs = [gcv(A[d], gshape[d], ginv[d]) for d in range(3)]
        gsl = [glines[d] * ginv[d] for d in range(3)]  # scaled lines
        # global facet-weight-over-mass lines for the x-face planes
        wly = lumped_weight_line(md.mesh.shape[1], p, md.mesh.h[1])
        wlz = lumped_weight_line(md.mesh.shape[2], p, md.mesh.h[2])
        w_y = wly * ginv[1]
        w_z = wlz * ginv[2]
        mx_line = self._global_m_lines[0]

        def tables_for(bx, by, bz):
            cvx = self._embed_global(gcvs[0], 0, bx, lay, h)
            cvy = self._embed_global(gcvs[1], 1, by, lay, h)
            cvz = self._embed_global(gcvs[2], 2, bz, lay, h)
            pLx = self._embed_global(gsl[0], 0, bx, lay, h)
            pLy = self._embed_global(gsl[1], 1, by, lay, h)
            pLz = self._embed_global(gsl[2], 2, bz, lay, h)
            py = self._embed_global(w_y, 1, by, lay, h)
            pz = self._embed_global(w_z, 2, bz, lay, h)
            w1 = np.outer(py / mx_line[0], pz).ravel()
            w2 = np.outer(py / mx_line[-1], pz).ravel()
            # global face rows in this block's padded x coordinates
            Nloc = lay.shape[0]
            g0 = bx * (Nloc - 1)
            def prow(g):
                r = g - g0
                return lay.x0 + r if -h <= r < Nloc + h else -1
            return build_fn(
                lay, cvx, cvy, cvz, pLx, pLy, pLz, w1, w2,
                prow(0), prow(gshape[0] - 1), md.dtype,
            )

        ms = (mx, my, mz)
        shape0 = [t.shape for t in tables_for(0, 0, 0)]
        nt = len(shape0)
        blocked = [
            np.zeros(tuple(ms[a] for a in deps[ti]) + shape0[ti],
                     dtype=np.dtype(md.dtype))
            for ti in range(nt)
        ]
        for bx in range(mx):
            for by in range(my):
                for bz in range(mz):
                    ts = tables_for(bx, by, bz)
                    b = (bx, by, bz)
                    for ti in range(nt):
                        idx = tuple(b[a] for a in deps[ti])
                        blocked[ti][idx] = ts[ti]
        axis_names = ("x", "y", "z")
        out = []
        for ti in range(nt):
            d = deps[ti]
            spec = P(*[axis_names[a] for a in d], *([None] * len(shape0[ti])))
            out.append(
                jax.device_put(
                    jnp.asarray(blocked[ti]), NamedSharding(self.mesh, spec)
                )
            )
        return tuple(out), deps

    def _refresh_value_halos(self, a: jax.Array, lay=None,
                             h: int | None = None) -> jax.Array:
        """Overwrite the h-deep (default 3p) halo regions with neighbor
        interior VALUES (owner->ghost forward scatter,
        VectorUpdater.hpp:106-152 semantics). Axis order x->y->z fills
        corner halos transitively.

        The duplicated interface plane is canonicalized to the LOW-side
        block's value (the two copies could otherwise drift at ulp level:
        their x-band matmuls sum the same taps at different window
        offsets), so the duplicate-plane invariant holds bitwise."""
        lay = self._step_layout if lay is None else lay
        h = 3 * self.model.p if h is None else h
        offs = (lay.x0, lay.h, lay.h)
        for axis, (name, size) in enumerate(zip(("x", "y", "z"), self.parts)):
            if size == 1:
                continue
            n_ax = lay.shape[axis]
            o = offs[axis]
            lo_slab = lax.slice_in_dim(a, o + 1, o + 1 + h, axis=axis)
            # h halo rows + the owner's copy of the interface plane
            hi_slab = lax.slice_in_dim(
                a, o + n_ax - 1 - h, o + n_ax, axis=axis
            )
            from_right = lax.ppermute(
                lo_slab, name, [(i, i - 1) for i in range(1, size)]
            )
            from_left = lax.ppermute(
                hi_slab, name, [(i, i + 1) for i in range(size - 1)]
            )
            a = lax.dynamic_update_slice_in_dim(
                a, from_right, o + n_ax, axis=axis
            )
            halo_part = lax.slice_in_dim(from_left, 0, h, axis=axis)
            a = lax.dynamic_update_slice_in_dim(a, halo_part, o - h, axis=axis)
            # interface plane: take the low-side owner's value (edge blocks
            # receive ppermute zeros and keep their own plane)
            own = lax.slice_in_dim(a, o, o + 1, axis=axis)
            recv = lax.slice_in_dim(from_left, h, h + 1, axis=axis)
            has_left = lax.axis_index(name) > 0
            a = lax.dynamic_update_slice_in_dim(
                a, jnp.where(has_left, recv, own), o, axis=axis
            )
        return a

    def zero_state_step(self):
        mx, my, mz = self.parts
        shape = (mx, my, mz) + self._step_layout.padded_shape
        z = jax.device_put(
            jnp.zeros(shape, dtype=self.model.dtype),
            NamedSharding(self.mesh, P("x", "y", "z", None, None, None)),
        )
        return z, z

    def solve_step_n(self, t0, dt, nsteps, u0=None, v0=None):
        """Distributed RK4, one fused kernel + one value-halo exchange per
        step. Falls back to :meth:`solve_n` when the step path does not
        apply."""
        from ..ops.pallas_rk4step import make_rk4_step_raw

        st = self._step_tables
        if st is None:
            if u0 is not None and u0.shape[3:] != self.layout.padded_shape:
                raise ValueError(
                    "step path unavailable for this configuration and the "
                    "given state uses the step layout (halo=3p) — build "
                    "fallback state with zero_state(), not zero_state_step()"
                )
            return self.solve_n(t0, dt, nsteps, u0, v0)
        tables, deps = st
        if u0 is None:
            u0, v0 = self.zero_state_step()
        md = self.model
        lay = self._step_layout
        raw = make_rk4_step_raw(lay, md.c0, md.dtype)
        dtf = float(dt)
        from ..models.linear_wave_padded import _RK_C

        state_spec = P("x", "y", "z", None, None, None)
        table_specs = tuple(t.sharding.spec for t in tables)

        def local_solve(u, v, *ops):
            tbl = [
                o.reshape(o.shape[o.ndim - (t.ndim - len(deps[i])):])
                for i, (o, t) in enumerate(zip(ops, tables))
            ]
            usq = u.reshape(u.shape[3:])
            vsq = v.reshape(v.shape[3:])

            def body(carry, _):
                uu, vv, t = carry
                uu = self._refresh_value_halos(uu)
                vv = self._refresh_value_halos(vv)
                gs = [md.g_amplitude(t + c * dtf) for c in _RK_C]
                uu, vv = raw(uu, vv, dtf, *gs, *tbl)
                return (uu, vv, t + dtf), None

            (uo, vo, _), _ = lax.scan(
                body, (usq, vsq, jnp.asarray(t0, dtype=md.dtype)),
                jnp.arange(nsteps),
            )
            return uo.reshape(u.shape), vo.reshape(v.shape)

        sm = shard_map(
            local_solve,
            mesh=self.mesh,
            in_specs=(state_spec, state_spec) + table_specs,
            out_specs=(state_spec, state_spec),
            check_vma=False,
        )
        u, v = jax.jit(sm)(u0, v0, *tables)
        return u, v, nsteps

    def to_global_step(self, blocked: jax.Array) -> np.ndarray:
        return self.to_global(blocked, self._step_layout)

    # -- distributed value-halo LEAPFROG step mode ---------------------
    # the round-4 integrator (solvers/leapfrog.py, ops/pallas_lfstep.py)
    # in the same value-halo scheme: ONE 2p-deep (u, v) exchange + ONE
    # fused kernel per leapfrog step.

    @cached_property
    def _lf_layout(self) -> PaddedLayout | None:
        if self._kernel_resolved != "flat":
            return None
        from ..models.linear_wave_padded import _flat_tile_x
        from ..ops.pallas_lfstep import _off0

        p = self.model.p
        # one-hop refresh: a block must supply a neighbor's full 2p halo
        # from rows valid to that depth (same guard as the RK4 step mode)
        if any(m >= 3 and n < 2
               for n, m in zip(self.local_cells, self.parts)):
            return None
        shape = tuple(n * p + 1 for n in self.local_cells)
        tx = _flat_tile_x(p, max(self.tile_x, _off0(p)))
        return PaddedLayout(shape=shape, p=p, tile_x=tx, z_align=16,
                            halo=2 * p)

    @cached_property
    def _lf_tables(self):
        from ..ops.pallas_lfstep import _off0, build_lf_tables_from_cv

        lay = self._lf_layout
        if lay is None or lay.tile_x < _off0(self.model.p):
            return None
        # (WXB, WXC, CVY, CVZ, FX, SXS, SRC, ABC, W1, W2)
        deps = {0: (0,), 1: (0,), 2: (1, 2), 3: (1, 2), 4: (1, 2),
                5: (0,), 6: (0,), 7: (0,), 8: (1, 2), 9: (1, 2)}
        return self._value_halo_tables(
            lay, 2 * self.model.p, build_lf_tables_from_cv, deps
        )

    def zero_state_lf(self):
        mx, my, mz = self.parts
        shape = (mx, my, mz) + self._lf_layout.padded_shape
        z = jax.device_put(
            jnp.zeros(shape, dtype=self.model.dtype),
            NamedSharding(self.mesh, P("x", "y", "z", None, None, None)),
        )
        return z, z

    def solve_lf_n(self, t0, dt, nsteps, u0=None, v0=None):
        """Distributed leapfrog: one fused kernel + one 2p value-halo
        exchange per step. dt must satisfy the leapfrog CFL (~0.71x the
        RK4 step). Raises when the path does not apply (no silent
        fallback — see PaddedLinearWave.solve_lf_n)."""
        from ..ops.pallas_lfstep import make_lf_step_raw

        st = self._lf_tables
        if st is None:
            raise ValueError(
                "distributed leapfrog step path unavailable for this "
                "configuration (needs flat layout, x-face source/ABC, "
                ">= 2 cells/block on axes split >= 3 ways)"
            )
        tables, deps = st
        if u0 is None:
            u0, v0 = self.zero_state_lf()
        md = self.model
        lay = self._lf_layout
        raw = make_lf_step_raw(lay, md.c0, md.dtype)
        dtf = float(dt)
        h = 2 * md.p

        state_spec = P("x", "y", "z", None, None, None)
        table_specs = tuple(t.sharding.spec for t in tables)

        def local_solve(u, v, *ops):
            tbl = [
                o.reshape(o.shape[o.ndim - (t.ndim - len(deps[i])):])
                for i, (o, t) in enumerate(zip(ops, tables))
            ]
            usq = u.reshape(u.shape[3:])
            vsq = v.reshape(v.shape[3:])

            def body(carry, _):
                uu, vv, t = carry
                uu = self._refresh_value_halos(uu, lay, h)
                vv = self._refresh_value_halos(vv, lay, h)
                g0 = md.g_amplitude(t)
                g1 = md.g_amplitude(t + dtf)
                uu, vv = raw(uu, vv, dtf, g0, g1, *tbl)
                return (uu, vv, t + dtf), None

            (uo, vo, _), _ = lax.scan(
                body, (usq, vsq, jnp.asarray(t0, dtype=md.dtype)),
                jnp.arange(nsteps),
            )
            return uo.reshape(u.shape), vo.reshape(v.shape)

        sm = shard_map(
            local_solve,
            mesh=self.mesh,
            in_specs=(state_spec, state_spec) + table_specs,
            out_specs=(state_spec, state_spec),
            check_vma=False,
        )
        u, v = jax.jit(sm)(u0, v0, *tables)
        return u, v, nsteps

    def to_global_lf(self, blocked: jax.Array) -> np.ndarray:
        return self.to_global(blocked, self._lf_layout)

    # -- distributed temporal-blocked LEAPFROG (2 steps / exchange) ----
    # ops.pallas_lf2step under shard_map: ONE 3p-deep (u, v) value
    # exchange + ONE kernel call per TWO leapfrog steps — half the
    # message count of the single-step path on top of half the HBM
    # passes (the step-1 wedge values are recomputed in-kernel from the
    # deeper halo, exactly like the single-device kernel's tiles).

    @cached_property
    def _lf2_layout(self) -> PaddedLayout | None:
        if self._kernel_resolved != "flat":
            return None
        from ..models.linear_wave_padded import _flat_tile_x
        from ..ops.pallas_lf2step import _off0

        p = self.model.p
        # same one-hop supply guard as the RK4 step mode (3p halo)
        if any(m >= 3 and n < 2
               for n, m in zip(self.local_cells, self.parts)):
            return None
        shape = tuple(n * p + 1 for n in self.local_cells)
        tx = _flat_tile_x(p, max(self.tile_x, _off0(p)))
        return PaddedLayout(shape=shape, p=p, tile_x=tx, z_align=16,
                            halo=3 * p)

    @cached_property
    def _lf2_tables(self):
        from ..ops.pallas_lf2step import _off0, build_lf2_tables_from_cv

        lay = self._lf2_layout
        if lay is None or lay.tile_x < _off0(self.model.p):
            return None
        # (WXA, WXB, WXC, CVY, CVZ, FX, SXS, SRC, ABC, W1, W2)
        deps = {0: (0,), 1: (0,), 2: (0,), 3: (1, 2), 4: (1, 2),
                5: (1, 2), 6: (0,), 7: (0,), 8: (0,), 9: (1, 2),
                10: (1, 2)}
        return self._value_halo_tables(
            lay, 3 * self.model.p, build_lf2_tables_from_cv, deps
        )

    def zero_state_lf2(self):
        mx, my, mz = self.parts
        shape = (mx, my, mz) + self._lf2_layout.padded_shape
        z = jax.device_put(
            jnp.zeros(shape, dtype=self.model.dtype),
            NamedSharding(self.mesh, P("x", "y", "z", None, None, None)),
        )
        return z, z

    def solve_lf2_n(self, t0, dt, nsteps, u0=None, v0=None):
        """Distributed 2-step leapfrog: one fused kernel + one 3p
        value-halo exchange per TWO steps. ``nsteps`` must be even
        (an odd tail would need the 2p single-step layout). Raises when
        the path does not apply."""
        from ..ops.pallas_lf2step import make_lf2_step_raw

        st = self._lf2_tables
        if st is None:
            raise ValueError(
                "distributed 2-step leapfrog path unavailable for this "
                "configuration (needs flat layout, x-face source/ABC, "
                ">= 2 cells/block on axes split >= 3 ways)"
            )
        if nsteps % 2:
            raise ValueError("nsteps must be even for solve_lf2_n")
        tables, deps = st
        if u0 is None:
            u0, v0 = self.zero_state_lf2()
        md = self.model
        lay = self._lf2_layout
        raw = make_lf2_step_raw(lay, md.c0, md.dtype)
        dtf = float(dt)
        h = 3 * md.p

        state_spec = P("x", "y", "z", None, None, None)
        table_specs = tuple(t.sharding.spec for t in tables)

        def local_solve(u, v, *ops):
            tbl = [
                o.reshape(o.shape[o.ndim - (t.ndim - len(deps[i])):])
                for i, (o, t) in enumerate(zip(ops, tables))
            ]
            usq = u.reshape(u.shape[3:])
            vsq = v.reshape(v.shape[3:])

            def body(carry, _):
                uu, vv, t = carry
                uu = self._refresh_value_halos(uu, lay, h)
                vv = self._refresh_value_halos(vv, lay, h)
                g0 = md.g_amplitude(t)
                g1 = md.g_amplitude(t + dtf)
                g2 = md.g_amplitude(t + 2 * dtf)
                uu, vv = raw(uu, vv, dtf, g0, g1, g2, *tbl)
                return (uu, vv, t + 2 * dtf), None

            (uo, vo, _), _ = lax.scan(
                body, (usq, vsq, jnp.asarray(t0, dtype=md.dtype)),
                jnp.arange(nsteps // 2),
            )
            return uo.reshape(u.shape), vo.reshape(v.shape)

        sm = shard_map(
            local_solve,
            mesh=self.mesh,
            in_specs=(state_spec, state_spec) + table_specs,
            out_specs=(state_spec, state_spec),
            check_vma=False,
        )
        u, v = jax.jit(sm)(u0, v0, *tables)
        return u, v, nsteps

    def to_global_lf2(self, blocked: jax.Array) -> np.ndarray:
        return self.to_global(blocked, self._lf2_layout)

    # -- distributed temporal-blocked RK4 (2 steps / exchange) ---------
    # ops.pallas_rk42step under shard_map: ONE 6p-deep (u, v) value
    # exchange + ONE kernel call per TWO RK4 steps — half the message
    # count AND half the HBM passes of the step path, on the
    # reference-parity integrator.

    @cached_property
    def _rk42_layout(self) -> PaddedLayout | None:
        if self._kernel_resolved != "flat":
            return None
        from ..models.linear_wave_padded import _flat_tile_x
        from ..ops.pallas_rk42step import _off0

        p = self.model.p
        # one-hop supply guard, scaled to the 6p halo: the probe
        # (experiments/exp_halo_staleness_probe.py, random O(1) state)
        # verifies exactness at supply n*p = h - p for the 3p-halo
        # paths; for h = 6p require n >= 5 and verify the same margin
        # empirically (test_parallel + the probe cover n=5, m=3).
        if any(m >= 3 and n < 5
               for n, m in zip(self.local_cells, self.parts)):
            return None
        shape = tuple(n * p + 1 for n in self.local_cells)
        tx = _flat_tile_x(p, max(self.tile_x, _off0(p)))
        return PaddedLayout(shape=shape, p=p, tile_x=tx, z_align=16,
                            halo=6 * p)

    @cached_property
    def _rk42_tables(self):
        from ..ops.pallas_rk42step import (_off0,
                                           build_rk42_tables_from_cv)

        lay = self._rk42_layout
        if lay is None or lay.tile_x < _off0(self.model.p):
            return None
        # (WX1A, WX1B, WX1C, WX2A, WX2B, WX2C, CVY, CVZ, FX, SXS, SRC,
        #  ABC, W1, W2)
        deps = {0: (0,), 1: (0,), 2: (0,), 3: (0,), 4: (0,), 5: (0,),
                6: (1, 2), 7: (1, 2), 8: (1, 2), 9: (0,), 10: (0,),
                11: (0,), 12: (1, 2), 13: (1, 2)}
        return self._value_halo_tables(
            lay, 6 * self.model.p, build_rk42_tables_from_cv, deps
        )

    def zero_state_rk42(self):
        mx, my, mz = self.parts
        shape = (mx, my, mz) + self._rk42_layout.padded_shape
        z = jax.device_put(
            jnp.zeros(shape, dtype=self.model.dtype),
            NamedSharding(self.mesh, P("x", "y", "z", None, None, None)),
        )
        return z, z

    def solve_step2_n(self, t0, dt, nsteps, u0=None, v0=None):
        """Distributed 2-step RK4: one fused kernel + one 6p value-halo
        exchange per TWO steps. ``nsteps`` must be even (an odd tail
        would need the 3p single-step layout). Raises when the path
        does not apply."""
        from ..ops.pallas_rk42step import make_rk42_step_raw

        st = self._rk42_tables
        if st is None:
            raise ValueError(
                "distributed 2-step RK4 path unavailable for this "
                "configuration (needs flat layout, x-face source/ABC, "
                ">= 5 cells/block on axes split >= 3 ways)"
            )
        if nsteps % 2:
            raise ValueError("nsteps must be even for solve_step2_n")
        tables, deps = st
        if u0 is None:
            u0, v0 = self.zero_state_rk42()
        md = self.model
        lay = self._rk42_layout
        raw = make_rk42_step_raw(lay, md.c0, md.dtype)
        dtf = float(dt)
        h = 6 * md.p

        state_spec = P("x", "y", "z", None, None, None)
        table_specs = tuple(t.sharding.spec for t in tables)

        def local_solve(u, v, *ops):
            tbl = [
                o.reshape(o.shape[o.ndim - (t.ndim - len(deps[i])):])
                for i, (o, t) in enumerate(zip(ops, tables))
            ]
            usq = u.reshape(u.shape[3:])
            vsq = v.reshape(v.shape[3:])

            def body(carry, _):
                uu, vv, t = carry
                uu = self._refresh_value_halos(uu, lay, h)
                vv = self._refresh_value_halos(vv, lay, h)
                gs = [md.g_amplitude(t + j * 0.5 * dtf) for j in range(5)]
                uu, vv = raw(uu, vv, dtf, *gs, *tbl)
                return (uu, vv, t + 2 * dtf), None

            (uo, vo, _), _ = lax.scan(
                body, (usq, vsq, jnp.asarray(t0, dtype=md.dtype)),
                jnp.arange(nsteps // 2),
            )
            return uo.reshape(u.shape), vo.reshape(v.shape)

        sm = shard_map(
            local_solve,
            mesh=self.mesh,
            in_specs=(state_spec, state_spec) + table_specs,
            out_specs=(state_spec, state_spec),
            check_vma=False,
        )
        u, v = jax.jit(sm)(u0, v0, *tables)
        return u, v, nsteps

    def to_global_rk42(self, blocked: jax.Array) -> np.ndarray:
        return self.to_global(blocked, self._rk42_layout)

    # -- host conversion ---------------------------------------------------
    def to_global(self, blocked: jax.Array, lay: PaddedLayout | None = None
                  ) -> np.ndarray:
        """Blocked padded state -> global dof grid (numpy)."""
        b = np.asarray(blocked)
        lay = lay or self.layout
        mx, my, mz = self.parts
        p = self.model.p
        nx, ny, nz = lay.shape
        Nx = mx * (nx - 1) + 1
        Ny = my * (ny - 1) + 1
        Nz = mz * (nz - 1) + 1
        out = np.empty((Nx, Ny, Nz), dtype=b.dtype)
        inter = lay.interior
        for bx in range(mx):
            for by in range(my):
                for bz in range(mz):
                    out[
                        bx * (nx - 1) : bx * (nx - 1) + nx,
                        by * (ny - 1) : by * (ny - 1) + ny,
                        bz * (nz - 1) : bz * (nz - 1) + nz,
                    ] = b[bx, by, bz][inter]
        return out

    def from_global(self, grid: np.ndarray,
                    lay: PaddedLayout | None = None) -> jax.Array:
        lay = lay or self.layout
        mx, my, mz = self.parts
        nx, ny, nz = lay.shape
        blocked = np.zeros(
            (mx, my, mz) + lay.padded_shape, dtype=np.dtype(self.model.dtype)
        )
        inter = lay.interior
        for bx in range(mx):
            for by in range(my):
                for bz in range(mz):
                    blk = np.zeros(lay.padded_shape, dtype=blocked.dtype)
                    blk[inter] = grid[
                        bx * (nx - 1) : bx * (nx - 1) + nx,
                        by * (ny - 1) : by * (ny - 1) + ny,
                        bz * (nz - 1) : bz * (nz - 1) + nz,
                    ]
                    blocked[bx, by, bz] = blk
        return jax.device_put(
            jnp.asarray(blocked),
            NamedSharding(self.mesh, P("x", "y", "z", None, None, None)),
        )
