"""Implicit Newmark-beta time integration with matrix-free PCG.

Beyond-parity addition: the reference only time-steps explicitly (RK4,
LinearGLL.hpp:198-287) and uses CG solely as the BP1 benchmark
(demo/gpu_cg). Combining the two gives an unconditionally stable implicit
integrator for stiff meshes / large time steps: Newmark-beta
(beta=1/4, gamma=1/2 — the trapezoidal rule, 2nd order, A-stable) on

    M u'' = -c0^2 K u + c0^2 g(t) W1 - c0 W2 u'

Each step solves the SPD system

    A a = rhs,   A = M + gamma dt c0 W2 + beta dt^2 c0^2 K

for the new acceleration with Jacobi(M)-preconditioned CG (solvers.cg),
fully inside lax.scan — no host round-trips.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
from jax import lax

from .cg import cg

__all__ = ["newmark_solve_n"]


def newmark_solve_n(
    model,
    dt: float,
    nsteps: int,
    u0: jax.Array,
    v0: jax.Array,
    beta: float = 0.25,
    gamma: float = 0.5,
    cg_kmax: int = 40,
    cg_rtol: float = 1e-9,
    t0: float = 0.0,
):
    """Integrate ``nsteps`` implicit Newmark steps of a LinearWave model.

    Returns (u, v, a) at the final time. ``model`` is
    models.linear_wave.LinearWave (grid representation).
    """
    c0 = model.c0
    m = jnp.asarray(model.m, dtype=u0.dtype)
    inv_m = jnp.asarray(model.inv_m, dtype=u0.dtype)
    W1 = jnp.asarray(model.W1, dtype=u0.dtype)
    W2 = jnp.asarray(model.W2, dtype=u0.dtype)

    def K_pos(x):
        # positive stiffness K x (ops.stiffness returns -c0^2 K x at c0=1)
        return -model.ops.stiffness(x, 1.0)

    def A(x):
        return (
            m * x
            + (gamma * dt * c0) * (W2 * x)
            + (beta * dt * dt * c0 * c0) * K_pos(x)
        )

    precond = lambda r: inv_m * r

    def rhs(t_new, u_star, v_star):
        return (
            -(c0 * c0) * K_pos(u_star)
            + (c0 * c0) * model.g_amplitude(t_new) * W1
            - c0 * (W2 * v_star)
        )

    def initial_accel(t, u, v):
        return inv_m * rhs(t, u, v)

    a0 = initial_accel(jnp.asarray(t0, u0.dtype), u0, v0)

    def body(carry, _):
        u, v, a, t = carry
        t_new = t + dt
        u_star = u + dt * v + (0.5 - beta) * dt * dt * a
        v_star = v + (1.0 - gamma) * dt * a
        b = rhs(t_new, u_star, v_star)
        a_new, _, _ = cg(A, b, x0=a, kmax=cg_kmax, rtol=cg_rtol,
                         precond=precond)
        u_new = u_star + beta * dt * dt * a_new
        v_new = v_star + gamma * dt * a_new
        return (u_new, v_new, a_new, t_new), None

    (u, v, a, t), _ = lax.scan(
        body, (u0, v0, a0, jnp.asarray(t0, u0.dtype)), jnp.arange(nsteps)
    )
    return u, v, a
