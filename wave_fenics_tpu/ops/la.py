"""Dense vector linear algebra on dof grids/vectors.

The cuBLAS wrapper layer of the reference (``linalg::copy/axpy/
inner_product/squared_norm/scale/prefetch``, common/cuda/la.hpp:19-139, and
its fork demo/gpu_cg/CUDA/streaming.hpp:18-138) collapses to a handful of
jnp expressions that XLA fuses into surrounding computations — kept as a
named module so call sites read like the reference and so the distributed
variants (ownership-weighted + psum) have one home.

The reference operates on the locally-owned prefix only (``size_local``);
here single-device arrays have no ghosts, and distributed blocked arrays
weight duplicated entries via ``own_weights`` (see parallel.sharded_wave).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "copy", "axpy", "scale", "inner_product", "squared_norm", "norm",
    "pointwise_divide", "pointwise_multiply",
]


def copy(x: jax.Array) -> jax.Array:
    """out = x (la.hpp copy; a no-op under XLA value semantics)."""
    return x


def axpy(alpha, x: jax.Array, y: jax.Array) -> jax.Array:
    """y + alpha*x (la.hpp axpy / LinearGLL kernels::axpy)."""
    return alpha * x + y


def scale(alpha, x: jax.Array) -> jax.Array:
    return alpha * x


def inner_product(a: jax.Array, b: jax.Array, weights=None) -> jax.Array:
    """<a, b>; optional multiplicity weights for duplicated-entry layouts."""
    if weights is not None:
        a = a * weights
    return jnp.vdot(a, b)


def squared_norm(a: jax.Array, weights=None) -> jax.Array:
    return inner_product(a, a, weights)


def norm(a: jax.Array, weights=None) -> jax.Array:
    return jnp.sqrt(squared_norm(a, weights))


def pointwise_divide(b: jax.Array, m: jax.Array) -> jax.Array:
    """out = b / m elementwise (the mass solve, LinearGLL.hpp:187-191)."""
    return b / m


def pointwise_multiply(b: jax.Array, inv_m: jax.Array) -> jax.Array:
    """out = b * inv_m — the precomputed-reciprocal form (the TODO at
    LinearGLL.hpp:179-181, implemented)."""
    return b * inv_m
