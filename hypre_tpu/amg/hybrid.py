"""Hybrid solver — diagonal-scaled Krylov with automatic AMG escalation.

Analogue of hypre's ParCSR Hybrid (``parcsr_ls/amg_hybrid.c:1692-2202``):
first run cheap diagonally-scaled PCG/GMRES/BiCGSTAB while monitoring the
convergence factor; if it stalls (cf > cf_tol, hypre's DSCG cutoff), pay for
a BoomerAMG setup and finish with AMG-preconditioned Krylov. The two phases
are separate jitted solves with host orchestration between them — the same
shape as hypre's two solver objects inside one driver.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from hypre_tpu.amg.boomeramg import BoomerAMG
from hypre_tpu.core.config import make_convergence_info, ConvergenceInfo
from hypre_tpu.krylov import bicgstab, gmres, pcg
from hypre_tpu.seq.ell import EllMatrix, ell_spmv


@dataclasses.dataclass
class HybridSolver:
    """HYPRE_ParCSRHybrid* object protocol (HYPRE_parcsr_ls.h:3097)."""

    solver_type: str = "pcg"  # 'pcg' | 'gmres' | 'bicgstab'
    cf_tol: float = 0.9  # DSCG convergence-factor cutoff (hypre default 0.9)
    dscg_max_iter: int = 1000
    pcg_max_iter: int = 200
    amg: Optional[BoomerAMG] = None  # pre-configured AMG, or defaults

    A: Optional[EllMatrix] = dataclasses.field(default=None, repr=False)
    dscg_iterations: int = 0
    amg_iterations: int = 0

    def setup(self, A: EllMatrix) -> "HybridSolver":
        self.A = A
        return self

    def solve(
        self,
        b: jax.Array,
        x0: Optional[jax.Array] = None,
        rtol: float = 1e-8,
        atol: float = 0.0,
    ) -> tuple[jax.Array, ConvergenceInfo]:
        A = self.A
        assert A is not None, "call setup(A) first"
        op = lambda v: ell_spmv(A, v)
        diag = A.diagonal()
        dinv = jnp.where(diag != 0, 1.0 / jnp.where(diag != 0, diag, 1.0), 1.0)
        ds = lambda r: dinv * r

        # phase 1: diagonally-scaled Krylov with slow-convergence cutoff
        if self.solver_type == "pcg":
            x, info = pcg(
                op, b, x0=x0, M=ds, rtol=rtol, atol=atol,
                maxiter=self.dscg_max_iter, cf_tol=self.cf_tol,
            )
        elif self.solver_type == "gmres":
            x, info = gmres(op, b, x0=x0, M=ds, rtol=rtol, atol=atol,
                            maxiter=self.dscg_max_iter)
        else:
            x, info = bicgstab(op, b, x0=x0, M=ds, rtol=rtol, atol=atol,
                               maxiter=self.dscg_max_iter)
        self.dscg_iterations = int(info.iterations)
        self.amg_iterations = 0
        if bool(info.converged):
            return x, info

        # phase 2: escalate to AMG-preconditioned Krylov from the current x
        amg = self.amg or BoomerAMG()
        amg.setup(A)
        M = amg.precond()
        if self.solver_type == "pcg":
            x, info2 = pcg(op, b, x0=x, M=M, rtol=rtol, atol=atol,
                           maxiter=self.pcg_max_iter)
        elif self.solver_type == "gmres":
            x, info2 = gmres(op, b, x0=x, M=M, rtol=rtol, atol=atol,
                             maxiter=self.pcg_max_iter)
        else:
            x, info2 = bicgstab(op, b, x0=x, M=M, rtol=rtol, atol=atol,
                                maxiter=self.pcg_max_iter)
        self.amg_iterations = int(info2.iterations)
        total = make_convergence_info(
            self.dscg_iterations + self.amg_iterations,
            info2.relative_residual,
            info2.converged,
        )
        return x, total
