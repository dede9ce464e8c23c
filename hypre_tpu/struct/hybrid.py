"""Struct Hybrid solver (``struct_ls/hybrid.c``; HYPRE_StructHybrid*).

Same escalation strategy as the ParCSR hybrid driver
(``parcsr_ls/amg_hybrid.c``), on structured grids: run cheap
diagonally-scaled Krylov while monitoring the convergence factor; if it
stalls past ``cf_tol`` (hypre's DSCG cutoff), pay for a PFMG or SMG setup
and finish with multigrid-preconditioned Krylov from the current iterate.
hypre's struct variant defaults to SMG as the escalated preconditioner
(``hybrid.c`` solver switch); PFMG is the cheaper default here, SMG
available through ``precond_type``.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from hypre_tpu.core.config import ConvergenceInfo
from hypre_tpu.krylov import bicgstab, gmres, pcg
from hypre_tpu.struct.matrix import StructMatrix, struct_matvec
from hypre_tpu.struct.relax import diag_inverse


@dataclasses.dataclass
class StructHybrid:
    """HYPRE_StructHybridCreate/SetConvergenceTol/SetSolverType protocol."""

    solver_type: str = "pcg"  # 'pcg' | 'gmres' | 'bicgstab'
    precond_type: str = "pfmg"  # 'pfmg' | 'smg'
    cf_tol: float = 0.9
    dscg_max_iter: int = 1000
    krylov_max_iter: int = 200
    precond_knobs: Optional[dict] = None

    A: Optional[StructMatrix] = dataclasses.field(default=None, repr=False)
    dscg_iterations: int = 0
    mg_iterations: int = 0

    def setup(self, A: StructMatrix) -> "StructHybrid":
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
        shape = A.shape
        op = lambda v: struct_matvec(A, v.reshape(shape)).reshape(-1)
        dinv = diag_inverse(A).reshape(-1)
        ds = lambda r: dinv * r
        bflat = b.reshape(-1)
        x0f = None if x0 is None else x0.reshape(-1)

        if self.solver_type == "pcg":
            x, info = pcg(op, bflat, x0=x0f, M=ds, rtol=rtol, atol=atol,
                          maxiter=self.dscg_max_iter, cf_tol=self.cf_tol)
        elif self.solver_type == "gmres":
            x, info = gmres(op, bflat, x0=x0f, M=ds, rtol=rtol, atol=atol,
                            maxiter=self.dscg_max_iter)
        else:
            x, info = bicgstab(op, bflat, x0=x0f, M=ds, rtol=rtol, atol=atol,
                               maxiter=self.dscg_max_iter)
        self.dscg_iterations = int(info.iterations)
        self.mg_iterations = 0
        if bool(info.converged):
            return x.reshape(shape), info

        knobs = self.precond_knobs or {}
        if self.precond_type == "smg":
            from hypre_tpu.struct.smg import SMG

            mg = SMG(**knobs).setup(A)
        else:
            from hypre_tpu.struct.pfmg import PFMG

            mg = PFMG(**knobs).setup(A)
        M = mg.precond()
        if self.solver_type == "pcg":
            x, info2 = pcg(op, bflat, x0=x, M=M, rtol=rtol, atol=atol,
                           maxiter=self.krylov_max_iter)
        elif self.solver_type == "gmres":
            x, info2 = gmres(op, bflat, x0=x, M=M, rtol=rtol, atol=atol,
                             maxiter=self.krylov_max_iter)
        else:
            x, info2 = bicgstab(op, bflat, x0=x, M=M, rtol=rtol, atol=atol,
                                maxiter=self.krylov_max_iter)
        self.mg_iterations = int(info2.iterations)
        return x.reshape(shape), info2
