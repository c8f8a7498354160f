"""Physics diagnostics for wave solves.

The reference prints only step counters and solve time (SURVEY.md §5); this
adds the standard observables used to validate wave solvers:

- acoustic energy  E(t) = 1/2 [ <v, M v> / c0^2 + <u, K u> ]
  (conserved by the continuous system on a closed domain; decays through
  absorbing boundaries; the RK4 discretization conserves it to O(dt^4))
- L2 norm of a field through the mass inner product
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["energy", "l2_norm"]


def energy(model, u: jax.Array, v: jax.Array) -> jax.Array:
    """Total acoustic energy of the (u, v) state.

    Works for any model exposing ``ops.mass``/``ops.stiffness`` and ``c0``
    (LinearWave grids and GeneralLinearWave flat vectors alike)."""
    ops = model.ops
    kin = jnp.vdot(v, ops.mass(v)) / model.c0**2
    # ops.stiffness returns -c0^2 K u; undo the sign/scaling for <u, K u>
    pot = -jnp.vdot(u, ops.stiffness(u, 1.0))
    return 0.5 * (kin + pot)


def l2_norm(model, u: jax.Array) -> jax.Array:
    """||u||_{L2} = sqrt(<u, M u>) (mass-weighted, mesh-independent)."""
    return jnp.sqrt(jnp.vdot(u, model.ops.mass(u)))
