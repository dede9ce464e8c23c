"""Struct Jacobi solver (struct_ls/jacobi.c — driver solver id 8)."""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from hypre_tpu.core.config import make_convergence_info, ConvergenceInfo
from hypre_tpu.struct.matrix import StructMatrix, struct_matvec
from hypre_tpu.struct.relax import diag_inverse, weighted_jacobi


@dataclasses.dataclass
class StructJacobi:
    weight: float = 1.0
    max_iter: int = 1000

    A: Optional[StructMatrix] = dataclasses.field(default=None, repr=False)
    dinv: Optional[jax.Array] = dataclasses.field(default=None, repr=False)

    def setup(self, A: StructMatrix) -> "StructJacobi":
        self.A = A
        self.dinv = diag_inverse(A)
        return self

    def solve(
        self,
        b: jax.Array,
        x0: Optional[jax.Array] = None,
        rtol: float = 1e-6,
        maxiter: Optional[int] = None,
    ) -> tuple[jax.Array, ConvergenceInfo]:
        A, dinv = self.A, self.dinv
        maxiter = self.max_iter if maxiter is None else maxiter
        x = jnp.zeros_like(b) if x0 is None else x0
        b2 = jnp.sum(b * b)
        eps = rtol * rtol * b2

        def cond(state):
            _, r2, it = state
            return (r2 > eps) & (it < maxiter) & jnp.isfinite(r2)

        def body(state):
            x, _, it = state
            x = weighted_jacobi(A, dinv, x, b, self.weight)
            r = b - struct_matvec(A, x)
            return x, jnp.sum(r * r), it + 1

        r0 = b - struct_matvec(A, x)
        x, r2, iters = jax.lax.while_loop(
            cond, body, (x, jnp.sum(r0 * r0), jnp.int32(0))
        )
        safe_b2 = jnp.where(b2 > 0, b2, 1.0)
        rel = jnp.sqrt(jnp.maximum(r2, 0.0) / safe_b2)
        return x, make_convergence_info(iters, rel, (r2 <= eps) | (b2 == 0))
