"""XLA precision helpers.

JAX's default matmul precision on TPU-class backends lowers f32 matmuls to
bfloat16 passes (~3 decimal digits). That is the right default for the big
dense stages (conv/correlation), but geometry code — pose algebra, normal
equations, triangulation — needs true f32 accumulation: a 7e-4 relative error
per 3x3 product is catastrophic once poses chain over thousands of frames.

Use these wrappers for every correctness-critical small contraction.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

HIGHEST = jax.lax.Precision.HIGHEST


def matmul_hp(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Full-precision matmul (f32 inputs accumulate in f32)."""
    return jnp.matmul(a, b, precision=HIGHEST)


def einsum_hp(subscripts: str, *operands) -> jnp.ndarray:
    """Full-precision einsum."""
    return jnp.einsum(subscripts, *operands, precision=HIGHEST)
