"""Matrix-free conjugate gradient under ``lax.while_loop``.

Re-expression of the reference distributed CG (demo/gpu_cg/CUDA/cg.hpp:37-121):
- cuBLAS dot/axpy/scale kernels -> fused jnp vector ops
- per-iteration MPI_Allreduce of scalars (cg.hpp:21,88-91,102-103) ->
  ``lax.psum`` when run under shard_map / GSPMD collectives when jit-sharded;
  single-chip reductions are just jnp.vdot
- host-side convergence check -> ``lax.while_loop`` predicate on device
  (no device->host sync per iteration, unlike the reference which returns
  every scalar to the host)

Semantics preserved: stopping rule rnorm/rnorm0 < rtol^2 on *squared* norms
(cg.hpp:68,110), iteration cap kmax, standard beta/p update. The reference's
update loop contains a transcription slip (it adds p into r, cg.hpp:116-117);
we implement the mathematically correct p <- r + beta p.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax import lax

__all__ = ["cg"]


def cg(
    matvec: Callable[[jax.Array], jax.Array],
    b: jax.Array,
    x0: jax.Array | None = None,
    kmax: int = 50,
    rtol: float = 1e-8,
    dot: Callable[[jax.Array, jax.Array], jax.Array] | None = None,
    precond: Callable[[jax.Array], jax.Array] | None = None,
):
    """Solve A x = b with (preconditioned) CG. Returns (x, k, rnorm2).

    ``dot`` lets distributed callers supply a psum-reduced inner product
    (the mpi_reduce analogue, cg.hpp:14-24); defaults to jnp.vdot.
    ``precond``: optional SPD preconditioner application z = M^-1 r (e.g.
    Jacobi via the lumped mass reciprocal) — an extension over the
    reference's plain CG. The stopping rule stays on the TRUE residual
    norm (rnorm/rnorm0 < rtol^2) for parity with cg.hpp:110.
    """
    if dot is None:
        dot = lambda a, c: jnp.vdot(a, c)
    if x0 is None:
        x0 = jnp.zeros_like(b)
    M = precond if precond is not None else (lambda r: r)

    r0 = b - matvec(x0)
    z0 = M(r0)
    rnorm0 = dot(r0, r0)
    rz0 = dot(r0, z0)
    rtol2 = jnp.asarray(rtol, dtype=jnp.real(rnorm0).dtype) ** 2

    def cond(state):
        x, r, z, p, rnorm, rz, k = state
        return jnp.logical_and(k < kmax, rnorm / rnorm0 >= rtol2)

    def body(state):
        x, r, z, p, rnorm, rz, k = state
        y = matvec(p)
        alpha = rz / dot(p, y)
        x = x + alpha * p
        r = r - alpha * y
        z = M(r)
        rnorm_new = dot(r, r)
        rz_new = dot(r, z)
        beta = rz_new / rz
        p = z + beta * p
        return (x, r, z, p, rnorm_new, rz_new, k + 1)

    x, r, z, p, rnorm, rz, k = lax.while_loop(
        cond,
        body,
        (x0, r0, z0, z0, rnorm0, rz0, jnp.asarray(0, dtype=jnp.int32)),
    )
    return x, k, rnorm
