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

    def solve(self, seed: int = 0, host_f64: Optional[bool] = None):
        """Returns (eigenvalues, eigenvectors, residual norms).

        host_f64 (default: on when the operator dtype is f32): run the
        LOBPCG outer iteration on host in float64 — matvecs through the
        native CSR kernel, Rayleigh-Ritz in f64 — while the AMS
        preconditioner stays the device f32 cycle (a preconditioner's
        precision does not limit the attainable eigen-accuracy). This is
        the f32-robust path: in pure f32 the penalized operator's
        conditioning degrades the device Rayleigh-Ritz basis before tight
        tolerances are reached (hypre's AME also assumes f64 arithmetic).
        """
        A, G, m = self._A, self._G, self.block_size
        Ap = self._Ap
        if host_f64 is None:
            host_f64 = jnp.dtype(A.dtype) == jnp.float32
        Msingle = self.ams.precond()
        proj = self._project
        if host_f64:
            return self._solve_host_f64(seed, Msingle)
        op = block_op(lambda v: ell_spmv(Ap, v))

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

    def _solve_host_f64(self, seed: int, Msingle):
        """Host-f64 LOBPCG outer loop (see solve); device applies the f32
        AMS cycle per column."""
        from hypre_tpu import native
        from hypre_tpu.amg.hierarchy import _ell_to_csr_arrays

        m = self.block_size
        n, Hp, Hj, Hx = _ell_to_csr_arrays(self._Ap)
        _, Gp, Gj, Gx = _ell_to_csr_arrays(self._G)
        nG = self._G.n_cols
        Tp, Tj, Tx = native.transpose(n, nG, Gp, Gj, Gx)

        def mv(V):  # (n, k) f64
            return np.stack(
                [native.matvec(n, Hp, Hj, Hx, V[:, j]) for j in
                 range(V.shape[1])], axis=1,
            )

        def prec(V):
            cols = []
            for j in range(V.shape[1]):
                v32 = jnp.asarray(V[:, j], self._Ap.dtype)
                cols.append(np.asarray(Msingle(v32), np.float64))
            return np.stack(cols, axis=1)

        gtg_amg = self._gtg_amg
        dt32 = self._Ap.dtype

        def project(V):
            # exact f64 gradient removal: V - G (G^T G)^+ G^T V by PCG,
            # preconditioned with the device f32 nodal AMG cycle (the f64
            # host CG supplies the accuracy, the cycle the speed)
            out = np.empty_like(V)
            for j in range(V.shape[1]):
                rhs = native.matvec(nG, Tp, Tj, Tx, V[:, j])
                y = np.zeros(nG)
                r = rhs.copy()
                z = np.asarray(gtg_amg.cycle(jnp.asarray(r, dt32)),
                               np.float64)
                p = z.copy()
                rz = r @ z
                for _ in range(60):
                    Apv = native.matvec(nG, Tp, Tj, Tx,
                                        native.matvec(n, Gp, Gj, Gx, p))
                    Apv = Apv + 1e-12 * p
                    alpha = rz / max(p @ Apv, 1e-300)
                    y += alpha * p
                    r -= alpha * Apv
                    if r @ r < 1e-24 * max(rhs @ rhs, 1e-300):
                        break
                    z = np.asarray(gtg_amg.cycle(jnp.asarray(r, dt32)),
                                   np.float64)
                    rz_new = r @ z
                    p = z + (rz_new / rz) * p
                    rz = rz_new
                out[:, j] = V[:, j] - native.matvec(n, Gp, Gj, Gx, y)
            return out

        rng = np.random.default_rng(seed)
        X = project(rng.standard_normal((n, m)))
        X, _ = np.linalg.qr(X)
        lam = None
        P = np.zeros((n, m))

        def rr(S):
            AS = mv(S)
            Gm = S.T @ AS
            Mb = S.T @ S
            w, Q = np.linalg.eigh(Mb)
            keep = w > (w.max() * 1e-12)
            W = Q[:, keep] / np.sqrt(w[keep])
            theta, Y = np.linalg.eigh(W.T @ ((Gm + Gm.T) * 0.5) @ W)
            return theta, W @ Y

        theta, C = rr(X)
        X = X @ C[:, :m]
        lam = theta[:m]
        rn = None
        for _ in range(self.maxiter):
            R = mv(X) - X * lam[None, :]
            rn = np.linalg.norm(R, axis=0)
            if np.all(rn <= self.tol * np.maximum(np.abs(lam), 1.0)):
                break
            Wv = project(prec(R))
            S = np.concatenate([X, Wv, P], axis=1)
            theta, C = rr(S)
            Cm = C[:, :m]
            X_new = S @ Cm
            Cp = Cm.copy()
            Cp[:m, :] = 0.0
            P = S @ Cp
            pn = np.linalg.norm(P, axis=0)
            P = P / np.where(pn > 0, pn, 1.0)[None, :]
            X, lam = X_new, theta[:m]
        X = project(X)
        return (
            jnp.asarray(lam), jnp.asarray(X, self._A.dtype), jnp.asarray(rn)
        )
