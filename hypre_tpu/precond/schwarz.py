"""Additive Schwarz / block-Jacobi preconditioner (parcsr_ls/schwarz.c).

hypre's Schwarz smoothers solve overlapping subdomain systems with dense
factorizations per domain. TPU formulation: contiguous row blocks of size
``block_size`` (+ ``overlap`` rows on each side), extracted as one
(nb, bs, bs) dense batch, inverted once at setup (batched ``inv`` — MXU
work), applied as one batched matmul. Overlapping contributions are averaged
(restricted additive Schwarz weighting).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from hypre_tpu.precond.common import lookup
from hypre_tpu.seq.ell import EllMatrix


@dataclasses.dataclass
class Schwarz:
    """HYPRE_Schwarz* object protocol (HYPRE_parcsr_ls.h:3651)."""

    block_size: int = 32
    overlap: int = 0
    # 'additive' keeps M symmetric (PCG-safe); 'ras' is restricted additive
    # Schwarz (1/ownership-count weighting) — better for GMRES, nonsymmetric
    weighting: str = "additive"

    inv_blocks: Optional[jax.Array] = dataclasses.field(default=None, repr=False)
    index: Optional[jax.Array] = dataclasses.field(default=None, repr=False)
    weight: Optional[jax.Array] = dataclasses.field(default=None, repr=False)
    n: int = 0

    def setup(self, A: EllMatrix) -> "Schwarz":
        n = A.n_rows
        bs = self.block_size
        ov = self.overlap
        width = bs + 2 * ov
        nb = -(-n // bs)
        starts = jnp.arange(nb) * bs - ov
        idx = starts[:, None] + jnp.arange(width)[None, :]  # (nb, width)
        valid = (idx >= 0) & (idx < n)
        idx = jnp.where(valid, idx, -1)
        rows = jnp.broadcast_to(idx[:, :, None], (nb, width, width))
        cols = jnp.broadcast_to(idx[:, None, :], (nb, width, width))
        sub = lookup(A, rows, cols)
        pair = valid[:, :, None] & valid[:, None, :]
        sub = jnp.where(pair, sub, jnp.eye(width, dtype=A.dtype)[None])
        self.inv_blocks = jnp.linalg.inv(sub)
        self.index = idx
        if self.weighting == "ras":
            # restricted-additive: 1/(number of blocks owning each row)
            counts = jnp.zeros(n).at[jnp.maximum(idx, 0).reshape(-1)].add(
                valid.reshape(-1).astype(A.dtype)
            )
            self.weight = 1.0 / jnp.maximum(counts, 1.0)
        else:
            self.weight = jnp.ones(n, A.dtype)
        self.n = n
        return self

    def precond(self):
        inv_b, idx, w, n = self.inv_blocks, self.index, self.weight, self.n
        assert inv_b is not None, "call setup(A) first"
        valid = idx >= 0

        def M(r):
            rb = jnp.where(valid, r[jnp.maximum(idx, 0)], 0.0)  # (nb, width)
            zb = jnp.einsum("bij,bj->bi", inv_b, rb)
            z = jnp.zeros(n, r.dtype).at[jnp.maximum(idx, 0).reshape(-1)].add(
                jnp.where(valid, zb, 0.0).reshape(-1)
            )
            return w * z

        return M
