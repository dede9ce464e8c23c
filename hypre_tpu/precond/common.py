"""Shared pattern/gather utilities for the preconditioner family.

The recurring primitive: given a per-row index pattern J (n, k) into the
matrix, gather the dense submatrices A[J_i, J_i] as an (n, k, k) batch.
Padded pattern slots (-1) become identity rows/cols so batched factorizations
stay nonsingular. This is the TPU replacement for hypre's per-row hash-lookup
loops (e.g. ``par_fsai_setup.c``'s ExtractSubSystems).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from hypre_tpu.seq.ell import EllMatrix


def lookup(A: EllMatrix, rows: jax.Array, cols: jax.Array) -> jax.Array:
    """A[rows, cols] for arbitrary same-shape index arrays (missing -> 0)."""
    rsafe = jnp.maximum(rows, 0)
    rvals = A.vals[rsafe]  # (..., kA)
    rcols = A.cols[rsafe]
    match = (rcols == cols[..., None]) & (rcols >= 0) & (rows >= 0)[..., None]
    return jnp.sum(jnp.where(match, rvals, 0), axis=-1)


def gather_submatrices(A: EllMatrix, pattern: jax.Array) -> jax.Array:
    """(n, k, k) dense blocks A[J_i, J_i]; padded slots are identity."""
    n, k = pattern.shape
    rows = jnp.broadcast_to(pattern[:, :, None], (n, k, k))
    cols = jnp.broadcast_to(pattern[:, None, :], (n, k, k))
    sub = lookup(A, rows, cols)
    valid = pattern >= 0
    pair_valid = valid[:, :, None] & valid[:, None, :]
    eye = jnp.eye(k, dtype=A.dtype)[None]
    return jnp.where(pair_valid, sub, eye)


def row_pattern_lower(A: EllMatrix) -> jax.Array:
    """Per-row pattern {j : A_ij != 0, j <= i}, diagonal guaranteed, sorted
    ascending with -1 padding (the FSAI/ILU static level-0 pattern)."""
    n, k = A.cols.shape
    big = jnp.int32(2**30)
    row_ids = jnp.arange(n, dtype=A.cols.dtype)[:, None]
    keep = (A.cols >= 0) & (A.cols <= row_ids)
    cols = jnp.where(keep, A.cols, big)
    # append the diagonal unconditionally, then sort + dedupe
    cols = jnp.sort(jnp.concatenate([cols, row_ids], axis=1), axis=1)
    dup = jnp.concatenate(
        [jnp.zeros((n, 1), bool), cols[:, 1:] == cols[:, :-1]], axis=1
    )
    cols = jnp.sort(jnp.where(dup, big, cols), axis=1)
    return jnp.where(cols < big, cols, -1)
