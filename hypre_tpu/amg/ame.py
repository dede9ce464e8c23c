"""AME — Maxwell eigensolver (AMS-preconditioned LOBPCG with gradient
deflation).

Analogue of hypre's AME (``parcsr_ls/ame.c``): the smallest eigenpairs of
the curl-curl operator A (with mass term) are polluted by its huge gradient
near-nullspace, whose eigenvalues (= the mass coefficient) sit BELOW the
physical targets. AME runs AMS-preconditioned LOBPCG on the penalized
operator

    A' = A + sigma * G G^T

G G^T annihilates divergence-free fields and shifts every gradient
eigenvalue up by sigma*lambda(G^T G) — exact spectral surgery, so LOBPCG on
A' converges to A's divergence-free eigenpairs with their original
eigenvalues (hypre enforces the same separation with its discrete-gradient
projection step, ame.c; the penalty form is robust where iterative
projections leak). A final G-projection cleans the converged block.

Precision note: validated in f64 (the test configuration). In f32 the
penalized operator's condition number lets LOBPCG's Rayleigh-Ritz basis
degenerate before tight tolerances are reached — treat f32 AME as
experimental and prefer x64 for eigen-analysis runs.
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
    penalty: float = 0.0  # 0 = auto: ~10 * mean|diag(A)| / lambda_min(G^T G)

    ams: Optional[AMS] = None
    _A: Optional[EllMatrix] = dataclasses.field(default=None, repr=False)
    _G: Optional[EllMatrix] = dataclasses.field(default=None, repr=False)
    _gtg_amg: Optional[BoomerAMG] = dataclasses.field(default=None, repr=False)

    def setup(self, A: EllMatrix, G: EllMatrix, coords: np.ndarray) -> "AME":
        import jax.numpy as jnp

        self._A, self._G = A, G
        # build the penalized operator A' = A + sigma G G^T explicitly and
        # set AMS up on IT — the preconditioner must see the same spectrum
        # LOBPCG iterates on
        sigma = self.penalty
        if sigma <= 0:
            sigma = 10.0 * float(jnp.mean(jnp.abs(A.diagonal())))
        self._sigma = sigma
        from hypre_tpu import native as _nat
        from hypre_tpu.amg.hierarchy import _csr_to_ell_device, _ell_to_csr_arrays
        from hypre_tpu.seq.spgemm import ell_add

        n, Gp, Gj, Gx = _ell_to_csr_arrays(G)
        Tp, Tj, Tx = _nat.transpose(n, G.n_cols, Gp, Gj, Gx)
        Cp, Cj, Cx = _nat.spgemm(n, n, Gp, Gj, Gx, Tp, Tj, Tx)
        GGt = _csr_to_ell_device(n, n, Cp, Cj, Cx, A.dtype)
        self._Ap = ell_add(1.0, A, sigma, GGt)
        self.ams = (self.ams or AMS()).setup(self._Ap, G, coords)
        # nodal Gram operator for the gradient projection. G^T G is the node
        # Laplacian — singular (constants); a small relative shift keeps the
        # f32 projection PCG away from nullspace blow-up (the projection
        # itself is insensitive to the shift: G maps constants to zero).
        import dataclasses as _dc

        import jax.numpy as jnp

        from hypre_tpu.seq.ell import csr_to_ell, ell_to_csr
        from hypre_tpu.seq.csr import HostCSR

        gcsr = ell_to_csr(G)
        eye = HostCSR.eye(G.n_rows)
        GtG = _host_rap(csr_to_ell(eye, dtype=A.dtype), G)  # G^T I G = G^T G
        diag = GtG.diagonal()
        self._shift = float(jnp.mean(diag)) * 1e-4
        row_ids = jnp.arange(GtG.n_rows, dtype=GtG.cols.dtype)[:, None]
        vals = jnp.where(GtG.cols == row_ids, GtG.vals + self._shift, GtG.vals)
        GtG_s = _dc.replace(GtG, vals=vals)
        self._gtg_amg = BoomerAMG(max_coarse_size=64).setup(GtG_s)
        return self

    def _project(self, x: jax.Array) -> jax.Array:
        """x <- x - G (G^T G)^{-1} G^T x (remove the gradient component)."""
        G = self._G
        shift = self._shift
        rhs = ell_spmv_t(G, x)
        GtG_op = lambda v: ell_spmv_t(G, ell_spmv(G, v)) + shift * v
        y, _ = pcg(GtG_op, rhs, M=self._gtg_amg.precond(),
                   rtol=self.proj_rtol, maxiter=100)
        return x - ell_spmv(G, y)

    def solve(self, seed: int = 0):
        """Returns (eigenvalues, eigenvectors, residual norms)."""
        A, G, m = self._A, self._G, self.block_size
        Ap = self._Ap
        op = block_op(lambda v: ell_spmv(Ap, v))
        Msingle = self.ams.precond()
        proj = self._project

        def columns(f, V):
            # NOTE: plain per-column loop — the fast-format pallas kernels
            # inside AMG cycles do not support vmap batching
            return jnp.stack([f(V[:, j]) for j in range(V.shape[1])], axis=1)

        T = block_op(Msingle)
        X0 = jnp.asarray(
            np.random.default_rng(seed).standard_normal((A.n_rows, m)), A.dtype
        )
        X0 = columns(proj, X0)
        lam, X, rn = lobpcg(op, X0, T=T, tol=self.tol, maxiter=self.maxiter)
        X = columns(proj, X)  # final gradient cleanup
        return lam, X, rn
