"""Probe: are the value-halo sharded paths exact for NON-vacuous fields?

The sharded-vs-single-device tests start from zero state with a face
source and run ~12 tiny steps — the field near deep-halo regions is
exponentially small there, so rtol-against-max comparisons could be
VACUOUS for deep-halo staleness (the round-3 guard comment warns of
exactly that silent-corruption mode). This probe initializes u, v with
RANDOM state (O(1) everywhere) and compares each value-halo solver
against its single-device kernel over enough steps for any one-hop
supply deficit to surface.

CPU, 8 virtual devices, f64, interpret-mode kernels on a small grid.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

from wave_fenics_tpu.core.mesh import FacetTags, box_mesh
from wave_fenics_tpu.models.linear_wave import LinearWave
from wave_fenics_tpu.models.linear_wave_padded import PaddedLinearWave
from wave_fenics_tpu.parallel.sharded_padded import ShardedPaddedWave


def blocked_from_global(sw, lay, grid):
    from jax.sharding import NamedSharding, PartitionSpec as P

    mx, my, mz = sw.parts
    nx, ny, nz = lay.shape
    blocked = np.zeros((mx, my, mz) + lay.padded_shape,
                       dtype=np.dtype(sw.model.dtype))
    inter = lay.interior
    for bx in range(mx):
        for by in range(my):
            for bz in range(mz):
                blk = np.zeros(lay.padded_shape, dtype=blocked.dtype)
                blk[inter] = grid[
                    bx * (nx - 1): bx * (nx - 1) + nx,
                    by * (ny - 1): by * (ny - 1) + ny,
                    bz * (nz - 1): bz * (nz - 1) + nz,
                ]
                blocked[bx, by, bz] = blk
    return jax.device_put(
        jnp.asarray(blocked),
        NamedSharding(sw.mesh, P("x", "y", "z", None, None, None)),
    )


def main():
    tags = FacetTags({1: (0,), 2: (1,)})
    mesh = box_mesh((8, 4, 4), (0.02, 0.01, 0.01), facet_tags=tags)
    base = LinearWave(mesh, p=4, dtype=jnp.float64)
    pm = PaddedLinearWave(base, tile_x=16)
    rng = np.random.default_rng(7)
    gshape = tuple(n * 4 + 1 for n in (8, 4, 4))
    u0g = rng.standard_normal(gshape)
    v0g = rng.standard_normal(gshape)
    dt = 1e-9

    for nsteps in (4, 12):
        ur, vr, _ = pm.solve_step_n(
            0.0, dt, nsteps, pm.from_grid(jnp.asarray(u0g)),
            pm.from_grid(jnp.asarray(v0g)))
        gu, gv = np.asarray(pm.to_grid(ur)), np.asarray(pm.to_grid(vr))
        ul, vl, _ = pm.solve_lf_n(
            0.0, dt, nsteps, pm.from_grid(jnp.asarray(u0g)),
            pm.from_grid(jnp.asarray(v0g)))
        glu, glv = np.asarray(pm.to_grid(ul)), np.asarray(pm.to_grid(vl))

        for parts in ((2, 2, 2), (4, 1, 2)):
            sw = ShardedPaddedWave(base, parts, tile_x=16)

            def rel(a, b):
                return float(np.max(np.abs(a - b)) / np.max(np.abs(b)))

            lay = sw._step_layout
            ub = blocked_from_global(sw, lay, u0g)
            vb = blocked_from_global(sw, lay, v0g)
            u, v, _ = sw.solve_step_n(0.0, dt, nsteps, ub, vb)
            r_step = (rel(sw.to_global_step(u), gu),
                      rel(sw.to_global_step(v), gv))

            lay = sw._lf_layout
            ub = blocked_from_global(sw, lay, u0g)
            vb = blocked_from_global(sw, lay, v0g)
            u, v, _ = sw.solve_lf_n(0.0, dt, nsteps, ub, vb)
            r_lf = (rel(sw.to_global_lf(u), glu),
                    rel(sw.to_global_lf(v), glv))

            lay = sw._lf2_layout
            ub = blocked_from_global(sw, lay, u0g)
            vb = blocked_from_global(sw, lay, v0g)
            u, v, _ = sw.solve_lf2_n(0.0, dt, nsteps, ub, vb)
            r_lf2 = (rel(sw.to_global_lf2(u), glu),
                     rel(sw.to_global_lf2(v), glv))

            print(f"nsteps={nsteps} parts={parts}: "
                  f"step u/v {r_step[0]:.2e}/{r_step[1]:.2e}  "
                  f"lf {r_lf[0]:.2e}/{r_lf[1]:.2e}  "
                  f"lf2 {r_lf2[0]:.2e}/{r_lf2[1]:.2e}", flush=True)

    # rk42 (6p halo): guard boundary n=5 on a 3-way split + an m=2 case
    for cells, parts in (((8, 4, 4), (2, 2, 2)), ((15, 4, 4), (3, 1, 1))):
        mesh2 = box_mesh((cells), (0.0025 * cells[0], 0.01, 0.01),
                         facet_tags=tags)
        base2 = LinearWave(mesh2, p=4, dtype=jnp.float64)
        pm2 = PaddedLinearWave(base2, tile_x=24)
        gshape2 = tuple(n * 4 + 1 for n in cells)
        u0g2 = rng.standard_normal(gshape2)
        v0g2 = rng.standard_normal(gshape2)
        for nsteps in (4, 12):
            ur, vr, _ = pm2.solve_step_n(
                0.0, dt, nsteps, pm2.from_grid(jnp.asarray(u0g2)),
                pm2.from_grid(jnp.asarray(v0g2)))
            gu, gv = np.asarray(pm2.to_grid(ur)), np.asarray(pm2.to_grid(vr))
            sw = ShardedPaddedWave(base2, parts, tile_x=24)
            assert sw._rk42_tables is not None, (cells, parts)
            lay = sw._rk42_layout
            ub = blocked_from_global(sw, lay, u0g2)
            vb = blocked_from_global(sw, lay, v0g2)
            u, v, _ = sw.solve_step2_n(0.0, dt, nsteps, ub, vb)
            ru = float(np.max(np.abs(sw.to_global_rk42(u) - gu))
                       / np.max(np.abs(gu)))
            rv = float(np.max(np.abs(sw.to_global_rk42(v) - gv))
                       / np.max(np.abs(gv)))
            print(f"rk42 nsteps={nsteps} cells={cells} parts={parts}: "
                  f"u/v {ru:.2e}/{rv:.2e}", flush=True)


if __name__ == "__main__":
    main()
