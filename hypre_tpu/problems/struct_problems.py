"""Structured-grid model problems (the struct.c driver's built-in problems).

Mirrors ``src/test/struct.c``'s default Laplacian setup and the anisotropic
``-c cx cy cz`` weighting: a (2*ndim+1)-point star stencil with Dirichlet
boundaries eliminated (out-of-grid stencil reads are zero-filled by
``struct/matrix.py:shift``, matching hypre's zeroed ghost layers).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from hypre_tpu.core.config import default_real_dtype
from hypre_tpu.struct.matrix import StructMatrix, struct_from_dense_coeffs


def struct_laplacian(
    shape: tuple[int, ...],
    weights: tuple[float, ...] | None = None,
    dtype=None,
    constant: bool = True,
    periodic: tuple[bool, ...] | None = None,
) -> StructMatrix:
    """(2d+1)-point anisotropic Laplacian: -w_d u_xx in each dim.

    weights = hypre struct.c's -c flag (cx, cy, cz), default all 1.
    periodic = per-dim wraparound (hypre struct.c's -p flag); note a
    fully-periodic Laplacian is singular (constant null space).
    """
    dtype = dtype or default_real_dtype()
    ndim = len(shape)
    weights = weights or (1.0,) * ndim
    coeff_map = {(0,) * ndim: 2.0 * float(sum(weights))}
    for d in range(ndim):
        for s in (-1, 1):
            off = [0] * ndim
            off[d] = s
            coeff_map[tuple(off)] = -float(weights[d])
    if not constant:
        coeff_map = {
            k: np.full(shape, v, dtype=dtype) for k, v in coeff_map.items()
        }
    return struct_from_dense_coeffs(
        coeff_map, shape, dtype=dtype, periodic=periodic
    )


def random_struct_matrix(
    shape: tuple[int, ...], extent: int = 1, seed: int = 0, dtype=None
) -> StructMatrix:
    """Random diagonally-dominant box-stencil matrix (test oracle input)."""
    from hypre_tpu.struct.stencil import box_stencil

    dtype = dtype or default_real_dtype()
    rng = np.random.default_rng(seed)
    st = box_stencil(len(shape), extent)
    coeffs = rng.standard_normal((st.size,) + tuple(shape)).astype(dtype)
    # make it SPD-ish: strong positive diagonal
    ci = st.center_index()
    coeffs[ci] = np.abs(coeffs).sum(axis=0) + 1.0
    return StructMatrix(
        coeffs=jnp.asarray(coeffs), stencil=st, shape=tuple(shape)
    )
