"""Structured-grid smoothers (struct_ls/point_relax.c, red_black_gs.c).

Weighted (pointwise) Jacobi and red-black Gauss-Seidel. RB-GS on TPU uses
checkerboard masks instead of strided BoxLoops: both colors are computed as
full-grid fused updates and combined with a parity mask — double the flops of
hypre's strided loops, but on TPU the masked full-grid pass is the faster
layout (no strided memory access, perfect VPU utilization).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from hypre_tpu.struct.matrix import StructMatrix, struct_matvec


def diag_inverse(A: StructMatrix) -> jax.Array:
    d = jnp.broadcast_to(A.diagonal(), A.shape)
    return jnp.where(d != 0, 1.0 / jnp.where(d != 0, d, 1.0), 0.0)


def weighted_jacobi(
    A: StructMatrix, dinv: jax.Array, u: jax.Array, f: jax.Array, weight: float = 2.0 / 3.0
) -> jax.Array:
    """u += w * D^{-1} (f - A u)  (point_relax.c weighted Jacobi)."""
    return u + weight * dinv * (f - struct_matvec(A, u))


def parity_mask(shape: tuple[int, ...]) -> np.ndarray:
    """Checkerboard: True at 'red' points (coordinate sum even)."""
    idx = np.indices(shape).sum(axis=0)
    return (idx % 2) == 0


def red_black_gs(
    A: StructMatrix,
    dinv: jax.Array,
    red: jax.Array,
    u: jax.Array,
    f: jax.Array,
) -> jax.Array:
    """One RB-GS sweep (red then black; struct_ls/red_black_gs.c).

    Exact Gauss-Seidel for star stencils (5-pt/7-pt), where same-color points
    never couple; hypre restricts RB-GS to those stencils too.
    """
    u = jnp.where(red, u + dinv * (f - struct_matvec(A, u)), u)
    u = jnp.where(red, u, u + dinv * (f - struct_matvec(A, u)))
    return u
