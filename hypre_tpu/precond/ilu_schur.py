"""ILU with GMRES-solved Schur complement (hypre ilu_type 10/11).

hypre's ILU-GMRES variants (``parcsr_ls/par_ilu_setup.c:346-527``,
``par_ilu.h:95-119``) split the unknowns into interior points and interface
points (rows coupling across subdomain boundaries), factor the
interior-interior block B with ILU, and solve the interface Schur system

    S z_G = r_G - E B^{-1} r_I,     S = C - E B^{-1} F

with a few GMRES iterations, preconditioned by an ILU of C (the cheap Schur
approximation). Interior unknowns back-substitute: z_I = B^{-1}(r_I - F z_G).

Here the subdomains are ``nparts`` contiguous row blocks (the single-device
image of hypre's rank decomposition; the distributed ParEll layout uses its
shard boundaries the same way), and every block operator is a masked ELL
matrix so the whole apply — ILU sweeps, inner GMRES included — stays one
jittable program with static shapes.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from hypre_tpu.core.config import PAD_COL
from hypre_tpu.precond.ilu import ILU
from hypre_tpu.seq.ell import EllMatrix, ell_spmv


def _masked_matrix(A: EllMatrix, row_mask, col_mask, identity_rest: bool):
    """A restricted to (row_mask x col_mask); optionally identity on the
    complementary rows (so ILU factorizations stay well-posed)."""
    n, k = A.cols.shape
    keep = (
        row_mask[:, None]
        & (A.cols >= 0)
        & jnp.where(A.cols >= 0, col_mask[jnp.maximum(A.cols, 0)], False)
    )
    cols = jnp.where(keep, A.cols, PAD_COL)
    vals = jnp.where(keep, A.vals, 0.0)
    if identity_rest:
        rows = jnp.arange(n, dtype=cols.dtype)
        # place a unit diagonal in slot 0 of masked-out rows
        cols = cols.at[:, 0].set(jnp.where(row_mask, cols[:, 0], rows))
        vals = vals.at[:, 0].set(jnp.where(row_mask, vals[:, 0], 1.0))
    return EllMatrix(vals=vals, cols=cols, n_cols=A.n_cols)


@dataclasses.dataclass
class ILUSchurGMRES:
    """hypre ilu_type 10 (ILU-GMRES) object protocol."""

    nparts: int = 4
    factor_sweeps: int = 5
    solve_sweeps: int = 6
    schur_max_iter: int = 5  # hypre ss_max_iter default 5
    schur_k_dim: int = 5

    interior: Optional[jax.Array] = dataclasses.field(default=None, repr=False)
    B_ilu: Optional[ILU] = dataclasses.field(default=None, repr=False)
    C_ilu: Optional[ILU] = dataclasses.field(default=None, repr=False)
    E: Optional[EllMatrix] = dataclasses.field(default=None, repr=False)
    F: Optional[EllMatrix] = dataclasses.field(default=None, repr=False)
    C: Optional[EllMatrix] = dataclasses.field(default=None, repr=False)

    def setup(self, A: EllMatrix) -> "ILUSchurGMRES":
        n, k = A.cols.shape
        block = -(-n // self.nparts)
        owner = jnp.arange(n) // block
        col_owner = jnp.where(A.cols >= 0, jnp.maximum(A.cols, 0) // block, -1)
        crosses = jnp.any(
            (A.cols >= 0) & (col_owner != owner[:, None]), axis=1
        )
        interior = ~crosses
        self.interior = interior

        gamma = crosses
        self.B_ilu = ILU(
            factor_sweeps=self.factor_sweeps, solve_sweeps=self.solve_sweeps
        ).setup(_masked_matrix(A, interior, interior, identity_rest=True))
        self.C = _masked_matrix(A, gamma, gamma, identity_rest=True)
        self.C_ilu = ILU(
            factor_sweeps=self.factor_sweeps, solve_sweeps=self.solve_sweeps
        ).setup(self.C)
        self.E = _masked_matrix(A, gamma, interior, identity_rest=False)
        self.F = _masked_matrix(A, interior, gamma, identity_rest=False)
        return self

    def precond(self):
        interior = self.interior
        gamma = ~interior
        Binv = self.B_ilu.precond()
        Cinv = self.C_ilu.precond()
        E, F, C = self.E, self.F, self.C
        from hypre_tpu.krylov.gmres import gmres

        def S_apply(v):
            # S v = C v - E B^{-1} (F v)   (v supported on the interface)
            return ell_spmv(C, v) - ell_spmv(E, Binv(ell_spmv(F, v)))

        def M(r):
            r_i = jnp.where(interior, r, 0.0)
            r_g = jnp.where(gamma, r, 0.0)
            z_i0 = jnp.where(interior, Binv(r_i), 0.0)
            g = r_g - jnp.where(gamma, ell_spmv(E, z_i0), 0.0)
            z_g, _ = gmres(
                S_apply, g,
                M=lambda v: jnp.where(gamma, Cinv(v), 0.0),
                rtol=1e-2, maxiter=self.schur_max_iter,
                k_dim=self.schur_k_dim,
            )
            z_g = jnp.where(gamma, z_g, 0.0)
            z_i = jnp.where(
                interior, z_i0 - Binv(ell_spmv(F, z_g)), 0.0
            )
            return z_i + z_g

        return M
