"""Split solver — block-diagonal per-part struct solves.

Analogue of HYPRE_SStructSplit* (``sstruct_ls/HYPRE_sstruct_split.c:261``):
each iteration solves every part's structured system independently (SMG or
PFMG as the per-part "sub-solver"), treating the U-matrix couplings with the
current iterate — block Jacobi over parts. Used standalone or as a Krylov
preconditioner for the coupled system.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from hypre_tpu.core.config import make_convergence_info, ConvergenceInfo
from hypre_tpu.sstruct.matrix import SStructMatrix
from hypre_tpu.struct.pfmg import PFMG
from hypre_tpu.struct.smg import SMG


@dataclasses.dataclass
class SplitSolver:
    solver: str = "pfmg"  # 'pfmg' | 'smg' (hypre HYPRE_SSTRUCT_SOLVER_*)
    max_iter: int = 100
    sub_cycles: int = 1  # V-cycles per part per outer iteration

    A: Optional[SStructMatrix] = dataclasses.field(default=None, repr=False)
    subs: Optional[list] = dataclasses.field(default=None, repr=False)

    def setup(self, A: SStructMatrix) -> "SplitSolver":
        self.A = A
        mk = PFMG if self.solver == "pfmg" else SMG
        self.subs = [mk().setup(P) for P in A.parts]
        return self

    def _sweep(self, x: jax.Array, b: jax.Array) -> jax.Array:
        """One outer iteration: per-part MG cycles on the part residual
        systems (U couplings lagged, hypre's split iteration)."""
        A = self.A
        r = b - A.mv(x)
        rs = A.grid.split(r)
        xs = A.grid.split(x)
        out = []
        for sub, rp, xp in zip(self.subs, rs, xs):
            e = rp * 0.0
            for _ in range(self.sub_cycles):
                e = sub.cycle(rp, e)
            out.append((xp + e).reshape(-1))
        return jnp.concatenate(out)

    def precond(self):
        assert self.A is not None, "call setup(A) first"
        zero = jnp.zeros(self.A.n_rows, self.A.dtype)
        return lambda r: self._sweep(zero, r)

    def solve(
        self,
        b: jax.Array,
        x0: Optional[jax.Array] = None,
        rtol: float = 1e-6,
        maxiter: Optional[int] = None,
    ) -> tuple[jax.Array, ConvergenceInfo]:
        A = self.A
        assert A is not None, "call setup(A) first"
        maxiter = maxiter or self.max_iter
        x = jnp.zeros(A.n_rows, A.dtype) if x0 is None else x0
        b2 = jnp.sum(b * b)
        eps = rtol * rtol * b2

        def cond(state):
            _, r2, it = state
            return (r2 > eps) & (it < maxiter) & jnp.isfinite(r2)

        def body(state):
            x, _, it = state
            x = self._sweep(x, b)
            r = b - A.mv(x)
            return x, jnp.sum(r * r), it + 1

        r0 = b - A.mv(x)
        x, r2, iters = jax.lax.while_loop(
            cond, body, (x, jnp.sum(r0 * r0), jnp.int32(0))
        )
        safe = jnp.where(b2 > 0, b2, 1.0)
        rel = jnp.sqrt(jnp.maximum(r2, 0.0) / safe)
        return x, make_convergence_info(iters, rel, (r2 <= eps) | (b2 == 0))
