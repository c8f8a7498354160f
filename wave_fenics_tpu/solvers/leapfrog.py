"""Leapfrog (velocity-Verlet) time integration with semi-implicit
diagonal damping — ONE stiffness apply per step.

The LinearGLL system is second-order linear with purely DIAGONAL
velocity coupling: du/dt = v, dv/dt = F(t, u) - D v, where
F(t, u) = M^-1(-c0^2 K u + g(t) W1) and D = diag(c0 W2 / m) acts only on
absorbing-boundary dofs (common/LinearGLL.hpp:141-192 semantics). The
reference integrates it with RK4 (LinearGLL.hpp:198-287) at 4 stiffness
applies per step; on general (imported) meshes the fused operator is the
entire step cost (BENCH_SUITE: ms_per_step ~= 4 x matvec, zero glue), so
the classic wave-propagation integrator — leapfrog, optimal on the
imaginary axis per force evaluation (stability interval 2 per apply vs
RK4's 2.83/4) — is ~3.5x cheaper per step and ~2.8x cheaper per unit
simulated time at the respective stability limits.

Order/stability trade (documented, not hidden): leapfrog is 2nd-order
(RK4 is 4th) and needs dt <= ~0.71x the RK4 CFL step. For production
HIFU-class runs resolution is set by the mesh/source, and dt by CFL —
the regime where leapfrog is the standard choice. RK4 remains the
default and the recorded parity metric.

Scheme (kick-drift-kick; the first half-kick treats the diagonal damping
with an implicit Euler half-step, the second with its ADJOINT (explicit)
half-step — the symmetric composition is 2nd order, and the per-step
damping amplification (1 - dt/2 D)/(1 + dt/2 D) has modulus <= 1 for any
dt, so the damping part is unconditionally stable):

    v+ = (v + dt/2 F(t, u)) / (1 + dt/2 D)
    u' = u + dt v+
    v' = (1 - dt/2 D) v+ + dt/2 F(t+dt, u')

F(t+dt, u') is carried to the next step, so steady state costs exactly
one force (stiffness) evaluation per step.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax import lax

__all__ = ["leapfrog_step", "leapfrog_solve_n", "leapfrog_solve_dyn",
           "leapfrog_solve_n_recording"]


def leapfrog_step(
    force: Callable,
    damp,
    u: jax.Array,
    v: jax.Array,
    F: jax.Array,
    t: jax.Array,
    dt,
):
    """One leapfrog step. ``F`` must equal ``force(t, u)`` (carried
    across steps); returns (u', v', F', t+dt)."""
    dt2 = dt * 0.5
    if damp is None:
        vh = v + dt2 * F
    else:
        vh = (v + dt2 * F) / (1.0 + dt2 * damp)  # implicit half-kick
    u = u + dt * vh
    t = t + dt
    F = force(t, u)
    if damp is None:
        v = vh + dt2 * F
    else:
        v = (1.0 - dt2 * damp) * vh + dt2 * F  # adjoint (explicit) half
    return u, v, F, t


def leapfrog_solve_n(
    force: Callable,
    damp,
    u0: jax.Array,
    v0: jax.Array,
    t0,
    dt: float,
    nsteps: int,
):
    """Integrate exactly ``nsteps`` fixed steps. ``force(t, u)`` is the
    mass-normalized acceleration; ``damp`` a diagonal damping vector (or
    None). Returns (u, v)."""
    tdt = jnp.result_type(float)

    def body(carry, i):
        u, v, F, t = carry
        return leapfrog_step(force, damp, u, v, F, t, dt), None

    t0 = jnp.asarray(t0, dtype=tdt)
    F0 = force(t0, u0)
    (u, v, _, _), _ = lax.scan(
        body, (u0, v0, F0, t0), jnp.arange(nsteps)
    )
    return u, v


def leapfrog_solve_dyn(
    force: Callable,
    damp,
    u0: jax.Array,
    v0: jax.Array,
    t0,
    dt: float,
    nsteps,
):
    """:func:`leapfrog_solve_n` with a TRACED step count (``fori_loop``)
    — one executable serves every window length. ``F = force(t, u)`` is
    re-derived from the carried state at entry, so chunked/resumed
    integration is exact (force is a pure function of ``(t, u)``)."""
    tdt = jnp.result_type(float)

    def body(i, carry):
        u, v, F, t = carry
        return leapfrog_step(force, damp, u, v, F, t, dt)

    t0 = jnp.asarray(t0, dtype=tdt)
    u, v, _, _ = lax.fori_loop(
        0, nsteps, body, (u0, v0, force(t0, u0), t0)
    )
    return u, v


def leapfrog_solve_n_recording(
    force: Callable,
    damp,
    u0: jax.Array,
    v0: jax.Array,
    t0,
    dt: float,
    nsteps: int,
    sample: Callable,
):
    """Like :func:`leapfrog_solve_n` but stacks per-step observations
    ``sample(t, u, v)`` (probe series; mirrors rk4_solve_n_recording)."""
    tdt = jnp.result_type(float)

    def body(carry, i):
        u, v, F, t = carry
        u, v, F, t = leapfrog_step(force, damp, u, v, F, t, dt)
        return (u, v, F, t), sample(t, u, v)

    t0 = jnp.asarray(t0, dtype=tdt)
    F0 = force(t0, u0)
    (u, v, _, _), samples = lax.scan(
        body, (u0, v0, F0, t0), jnp.arange(nsteps)
    )
    return u, v, samples
