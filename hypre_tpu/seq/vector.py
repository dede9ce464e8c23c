"""Dense vector kernels (hypre seq_mv/vector.c analogue).

On TPU these are one-liners that XLA fuses; they exist as named functions so
the Krylov layer binds to a stable kernel vocabulary (hypre's
``hypre_SeqVectorInnerProd`` / ``Axpy`` / ``Scale``) and so the precision
policy for reductions lives in exactly one place: inner products accumulate in
float32 at minimum even for bf16 data, matching hypre's practice of running
reductions at full precision.
"""

from __future__ import annotations

import jax.numpy as jnp


def dot(x, y):
    acc_dtype = jnp.promote_types(x.dtype, jnp.float32)
    return jnp.sum(x.astype(acc_dtype) * y.astype(acc_dtype)).astype(x.dtype)


def norm2(x):
    return jnp.sqrt(dot(x, x))


def axpy(alpha, x, y):
    return alpha * x + y


def scale(alpha, x):
    return alpha * x
