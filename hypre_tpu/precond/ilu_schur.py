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


@dataclasses.dataclass
class ILUSchurNSH:
    """hypre ilu_type 20/21 (ILU-NSH): the interface Schur system is solved
    with an approximate inverse built by Newton-Schulz-Hotelling iteration
    (``par_ilu_setup.c`` NSH branch, ``par_ilu.h:95-119``;
    hypre_ILUSetupNSH computes an approximate inverse of the dropped Schur
    complement).

    TPU formulation: the interface set is small (O(boundary) of the
    ``nparts`` row blocks), so the approximate Schur complement
    S_hat = C - E diag(B)^{-1} F is EXTRACTED DENSE on the interface
    subspace and the NSH iteration

        X_{k+1} = X_k (2 I - S_hat X_k),   X_0 = S_hat^T / (||.||_1 ||.||_inf)

    runs as pure (m, m) MXU matmuls — quadratic convergence, no sparsity
    dropping needed at these sizes (hypre drops because its inverse must
    stay sparse on CPUs). Apply is one dense matvec between a gather and a
    scatter. Interior unknowns back-substitute exactly as in the GMRES
    variant.
    """

    nparts: int = 4
    factor_sweeps: int = 5
    solve_sweeps: int = 6
    nsh_iters: int = 10
    max_interface: int = 8192  # dense (m, m) cap: 256 MB f32 at 8k

    interior: Optional[jax.Array] = dataclasses.field(default=None, repr=False)
    B_ilu: Optional[ILU] = dataclasses.field(default=None, repr=False)
    E: Optional[EllMatrix] = dataclasses.field(default=None, repr=False)
    F: Optional[EllMatrix] = dataclasses.field(default=None, repr=False)
    g_idx: Optional[jax.Array] = dataclasses.field(default=None, repr=False)
    X: Optional[jax.Array] = dataclasses.field(default=None, repr=False)

    def setup(self, A: EllMatrix) -> "ILUSchurNSH":
        import numpy as np

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
        C = _masked_matrix(A, gamma, gamma, identity_rest=True)
        self.E = _masked_matrix(A, gamma, interior, identity_rest=False)
        self.F = _masked_matrix(A, interior, gamma, identity_rest=False)

        g_np = np.nonzero(np.asarray(gamma))[0]
        m = len(g_np)
        if m > self.max_interface:
            raise ValueError(
                f"interface size {m} exceeds max_interface="
                f"{self.max_interface}; reduce nparts or use ILUSchurGMRES"
            )
        self.g_idx = jnp.asarray(g_np.astype(np.int32))

        # dense S_hat on the interface: C - E diag(B)^{-1} F, built by
        # applying the masked operators to the interface identity block
        # (m applications batch into one (n, m) matmul-free vmap)
        diag = A.diagonal()
        dinv = jnp.where(interior & (diag != 0), 1.0 / jnp.where(diag != 0, diag, 1.0), 0.0)

        basis = jnp.zeros((n, m), A.dtype).at[self.g_idx, jnp.arange(m)].set(1.0)

        def apply_shat(v):
            return ell_spmv(C, v) - ell_spmv(
                self.E, dinv * ell_spmv(self.F, v)
            )

        S_full = jax.vmap(apply_shat, in_axes=1, out_axes=1)(basis)
        S = S_full[self.g_idx]  # (m, m)

        # Newton-Schulz-Hotelling: X0 scaled transpose guarantees
        # ||I - S X0|| < 1 for nonsingular S
        norm1 = jnp.max(jnp.sum(jnp.abs(S), axis=0))
        norminf = jnp.max(jnp.sum(jnp.abs(S), axis=1))
        X = S.T / (norm1 * norminf)
        eye2 = 2.0 * jnp.eye(m, dtype=A.dtype)
        for _ in range(self.nsh_iters):
            X = X @ (eye2 - S @ X)
        self.X = X
        return self

    def precond(self):
        interior = self.interior
        Binv = self.B_ilu.precond()
        E, F, X, g_idx = self.E, self.F, self.X, self.g_idx
        n = interior.shape[0]

        def M(r):
            r_i = jnp.where(interior, r, 0.0)
            r_g = jnp.where(~interior, r, 0.0)
            z_i0 = jnp.where(interior, Binv(r_i), 0.0)
            g = r_g - jnp.where(~interior, ell_spmv(E, z_i0), 0.0)
            zg_small = X @ g[g_idx]
            z_g = jnp.zeros(n, r.dtype).at[g_idx].set(zg_small)
            z_i = jnp.where(interior, z_i0 - Binv(ell_spmv(F, z_g)), 0.0)
            return z_i + z_g

        return M
