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
                o0 = lay.x0 if oth[0] == 0 else lay.p
                o1 = lay.p
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
                off = lay.x0 if axis == 0 else lay.p
                n_ax = self.local_cells[axis] * p + 1
                pidx[axis] = off if side == 0 else off + n_ax - 1
                arr = jax.device_put(
                    jnp.asarray(blocked),
                    NamedSharding(self.mesh, P("x", "y", "z", None, None)),
                )
                out.append((tuple(pidx), attr, arr))
        return out

    # -- halo-add on padded blocks ---------------------------------------
    def _halo_add_padded(self, a: jax.Array) -> jax.Array:
        """Halo-add the interior interface planes of a local padded block."""
        lay = self.layout
        p = self.model.p
        offs = (lay.x0, lay.p, lay.p)
        for axis, (name, size) in enumerate(
            zip(("x", "y", "z"), self.parts)
        ):
            if size == 1:
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
    def _f1_local(self, t, u, v, tables, planes):
        md = self.model
        kv = self._apply_raw(u, *tables)
        for pidx, attr, plane in planes:
            if attr == "w1":
                kv = kv.at[pidx].add(
                    (md.c0**2 * md.g_amplitude(t)).astype(md.dtype) * plane
                )
            else:
                kv = kv.at[pidx].add(-md.c0 * plane * v[pidx])
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
        state_spec = P("x", "y", "z", None, None, None)
        table_specs = tuple(t.sharding.spec for t in tables)
        plane_specs = tuple(p[2].sharding.spec for p in planes)

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
            usq = u.reshape(u.shape[3:])
            vsq = v.reshape(v.shape[3:])
            f0 = lambda t, uu, vv: vv
            f1 = lambda t, uu, vv: self._f1_local(t, uu, vv, tbl, pls)
            uo, vo = rk4_solve_n(f0, f1, usq, vsq, t0, dt, nsteps)
            return uo.reshape(u.shape), vo.reshape(v.shape)

        sm = shard_map(
            local_solve,
            mesh=self.mesh,
            in_specs=(state_spec, state_spec) + table_specs + plane_specs,
            out_specs=(state_spec, state_spec),
            # pallas_call outputs carry no varying-mesh-axes metadata
            check_vma=False,
        )
        u, v = jax.jit(sm)(u0, v0, *tables, *[p[2] for p in planes])
        return u, v, nsteps

    # -- host conversion ---------------------------------------------------
    def to_global(self, blocked: jax.Array) -> np.ndarray:
        """Blocked padded state -> global dof grid (numpy)."""
        b = np.asarray(blocked)
        lay = self.layout
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

    def from_global(self, grid: np.ndarray) -> jax.Array:
        lay = self.layout
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
