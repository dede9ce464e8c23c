"""AME — Maxwell eigensolver (AMS-preconditioned LOBPCG with gradient
deflation).

Analogue of hypre's AME (``parcsr_ls/ame.c``): the smallest eigenpairs of
the curl-curl operator A (with mass term) are polluted by its huge
near-nullspace of discrete gradients; AME runs LOBPCG on A with the AMS
preconditioner and keeps iterates B-orthogonal to the gradient subspace by
projecting out G-components each iteration (hypre applies the same
G-projection, ame.c's ``hypre_AMEDiscrGradSmoother`` step). The projection
solves the nodal system G^T G y = G^T x with an inner BoomerAMG-PCG.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from hypre_tpu.amg.ams import AMS, _host_rap
from hypre_tpu.amg.boomeramg import BoomerAMG
from hypre_tpu.krylov import block_op, lobpcg
from hypre_tpu.krylov.pcg import pcg
from hypre_tpu.seq.ell import EllMatrix, ell_spmv, ell_spmv_t


@dataclasses.dataclass
class AME:
    """HYPRE_AMECreate / SetAMSSolver analogue."""

    block_size: int = 4
    tol: float = 1e-6
    maxiter: int = 200
    proj_rtol: float = 1e-8

    ams: Optional[AMS] = None
    _A: Optional[EllMatrix] = dataclasses.field(default=None, repr=False)
    _G: Optional[EllMatrix] = dataclasses.field(default=None, repr=False)
    _gtg_amg: Optional[BoomerAMG] = dataclasses.field(default=None, repr=False)

    def setup(self, A: EllMatrix, G: EllMatrix, coords: np.ndarray) -> "AME":
        self._A, self._G = A, G
        self.ams = (self.ams or AMS()).setup(A, G, coords)
        # nodal Gram operator for the gradient projection
        from hypre_tpu.seq.ell import csr_to_ell, ell_to_csr
        from hypre_tpu.seq.csr import HostCSR

        gcsr = ell_to_csr(G)
        eye = HostCSR.eye(G.n_rows)
        GtG = _host_rap(csr_to_ell(eye, dtype=A.dtype), G)  # G^T I G = G^T G
        self._gtg_amg = BoomerAMG(max_coarse_size=64).setup(GtG)
        return self

    def _project(self, x: jax.Array) -> jax.Array:
        """x <- x - G (G^T G)^{-1} G^T x (remove the gradient component)."""
        G = self._G
        rhs = ell_spmv_t(G, x)
        GtG_op = lambda v: ell_spmv_t(G, ell_spmv(G, v))
        y, _ = pcg(GtG_op, rhs, M=self._gtg_amg.precond(),
                   rtol=self.proj_rtol, maxiter=100)
        return x - ell_spmv(G, y)

    def solve(self, seed: int = 0):
        """Returns (eigenvalues, eigenvectors, residual norms)."""
        A, m = self._A, self.block_size
        op = block_op(lambda v: ell_spmv(A, v))
        Msingle = self.ams.precond()
        proj = self._project

        def T(V):
            Z = jax.vmap(Msingle, in_axes=1, out_axes=1)(V)
            return jax.vmap(proj, in_axes=1, out_axes=1)(Z)

        X0 = jnp.asarray(
            np.random.default_rng(seed).standard_normal((A.n_rows, m)), A.dtype
        )
        X0 = jax.vmap(proj, in_axes=1, out_axes=1)(X0)
        return lobpcg(op, X0, T=T, tol=self.tol, maxiter=self.maxiter)
