"""MGR — multigrid reduction with user-tagged C-points.

Analogue of hypre's MGR (``parcsr_ls/par_mgr.c``, ``par_mgr.h:16-109``,
HYPRE_parcsr_ls.h:3798): the user prescribes which unknowns become the
coarse grid at each level (e.g. pressure DOFs in reservoir CPR), and each
level does F-relaxation plus a coarse-grid correction with reduction-style
transfer operators:

    P = [ W ]   W = -D_FF^{-1} A_FC   ("jacobi" interp, hypre interp_type 2)
        [ I ]   or W = 0              ("injection")
    R = [0 I]  (injection restriction, hypre restrict_type 0)
    A_H = R A P

The coarsest reduced system is solved with BoomerAMG. All index splitting
happens host-side at setup; the solve phase is jitted ELL operator algebra.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from hypre_tpu.amg.boomeramg import BoomerAMG
from hypre_tpu.core.config import make_convergence_info, ConvergenceInfo
from hypre_tpu.seq.csr import HostCSR
from hypre_tpu.seq.ell import EllMatrix, csr_to_ell, ell_to_csr, ell_spmv


@dataclasses.dataclass
class MGRLevel:
    A: EllMatrix
    P: EllMatrix
    R: EllMatrix
    f_mask: jax.Array  # 1.0 on F-points
    dinv: jax.Array


@dataclasses.dataclass
class MGR:
    """HYPRE_MGRCreate / SetCpointsByBlock analogue."""

    interp_type: str = "jacobi"  # 'jacobi' | 'injection'
    num_relax_sweeps: int = 1
    coarse_amg: Optional[BoomerAMG] = None
    # global smoothing on the FULL fine system each cycle — the step that
    # turns plain reduction into CPR (HYPRE_MGRSetGlobalSmoothType/Iters,
    # par_mgr.c: AMG on the pressure block + a global ILU/Jacobi pass
    # handles the saturation coupling the reduction lags)
    global_smooth_type: str = ""  # '' | 'jacobi' | 'ilu'
    global_smooth_iters: int = 1

    levels: Optional[List[MGRLevel]] = dataclasses.field(default=None, repr=False)

    def setup(self, A: EllMatrix, cpoints_per_level: Sequence[np.ndarray]) -> "MGR":
        """cpoints_per_level[l]: indices (into level-l unknowns) that form
        level l+1 (hypre's block C-point prescription)."""
        levels: List[MGRLevel] = []
        for cpts in cpoints_per_level:
            n = A.n_rows
            cpts = np.asarray(cpts, dtype=np.int64)
            is_c = np.zeros(n, bool)
            is_c[cpts] = True
            nc = int(is_c.sum())
            cmap = np.where(is_c, np.cumsum(is_c) - 1, -1)

            csr = ell_to_csr(A)
            dense_rows = np.repeat(np.arange(n), csr.row_nnz())
            diag = np.zeros(n)
            dm = csr.indices == dense_rows
            np.add.at(diag, dense_rows[dm], csr.data[dm])
            dsafe = np.where(diag != 0, diag, 1.0)

            # P = [W; I]: W = -D_FF^{-1} A_FC on F-rows (or empty)
            rows, cols, vals = [], [], []
            c_rows = np.nonzero(is_c)[0]
            rows.extend(c_rows)
            cols.extend(cmap[c_rows])
            vals.extend(np.ones(nc))
            if self.interp_type == "jacobi":
                m = (~is_c[dense_rows]) & is_c[csr.indices]
                rows.extend(dense_rows[m])
                cols.extend(cmap[csr.indices[m]])
                vals.extend(-csr.data[m] / dsafe[dense_rows[m]])
            P = csr_to_ell(
                HostCSR.from_coo(rows, cols, vals, (n, nc)), dtype=A.dtype
            )
            # R = [0 I] injection
            R = csr_to_ell(
                HostCSR.from_coo(cmap[c_rows], c_rows, np.ones(nc), (nc, n)),
                dtype=A.dtype,
            )
            # A_H = R A P (host CSR products via the native kernels)
            from hypre_tpu import native
            from hypre_tpu.amg.hierarchy import (
                _csr_to_ell_device, _ell_to_csr_arrays,
            )

            _, Ap, Aj, Ax = _ell_to_csr_arrays(A)
            _, Pp, Pj, Px = _ell_to_csr_arrays(P)
            _, Rp, Rj, Rx = _ell_to_csr_arrays(R)
            APp, APj, APx = native.spgemm(n, nc, Ap, Aj, Ax, Pp, Pj, Px)
            Cp, Cj, Cx = native.spgemm(nc, nc, Rp, Rj, Rx, APp, APj, APx)
            A_H = _csr_to_ell_device(nc, nc, Cp, Cj, Cx, A.dtype)

            levels.append(
                MGRLevel(
                    A=A,
                    P=P,
                    R=R,
                    f_mask=jnp.asarray((~is_c).astype(np.float32 if A.dtype == jnp.float32 else np.float64)),
                    dinv=jnp.asarray(1.0 / dsafe, dtype=A.dtype),
                )
            )
            A = A_H
        self.levels = levels
        self.coarse_amg = (self.coarse_amg or BoomerAMG()).setup(A)
        A0 = self.levels[0].A if self.levels else A
        if self.global_smooth_type == "ilu":
            from hypre_tpu.precond import ILU

            self._gsm = ILU().setup(A0).precond()
        elif self.global_smooth_type == "jacobi":
            d = A0.diagonal()
            dinv0 = jnp.where(d != 0, 1.0 / jnp.where(d != 0, d, 1.0), 0.0)
            self._gsm = lambda r: dinv0 * r
        else:
            self._gsm = None
        return self

    def _f_relax(self, lev: MGRLevel, u, f):
        """Jacobi sweeps restricted to F-points (par_mgr.c F-relaxation)."""
        for _ in range(self.num_relax_sweeps):
            r = f - ell_spmv(lev.A, u)
            u = u + lev.f_mask * lev.dinv * r
        return u

    def cycle(self, f: jax.Array, u: Optional[jax.Array] = None) -> jax.Array:
        assert self.levels is not None, "call setup first"

        def descend(level, f, u):
            if level == len(self.levels):
                return self.coarse_amg.cycle(f)
            lev = self.levels[level]
            u = self._f_relax(lev, u, f)
            r = f - ell_spmv(lev.A, u)
            rc = ell_spmv(lev.R, r)
            ec = descend(level + 1, rc, jnp.zeros_like(rc))
            u = u + ell_spmv(lev.P, ec)
            return self._f_relax(lev, u, f)

        if u is None:
            u = jnp.zeros_like(f)
        if self._gsm is not None:
            # hypre applies the global smoother ahead of the reduction
            # cycle (par_mgr_solve.c global relaxation)
            A0 = self.levels[0].A
            for _ in range(self.global_smooth_iters):
                u = u + self._gsm(f - ell_spmv(A0, u))
        return descend(0, f, u)

    def precond(self):
        return lambda r: self.cycle(r)

    def solve(
        self,
        b: jax.Array,
        x0: Optional[jax.Array] = None,
        rtol: float = 1e-8,
        maxiter: int = 100,
    ) -> tuple[jax.Array, ConvergenceInfo]:
        A = self.levels[0].A
        x = jnp.zeros_like(b) if x0 is None else x0
        b2 = jnp.sum(b * b)
        eps = rtol * rtol * b2

        def cond(state):
            _, r2, it = state
            return (r2 > eps) & (it < maxiter) & jnp.isfinite(r2)

        def body(state):
            x, _, it = state
            x = self.cycle(b, x)
            r = b - ell_spmv(A, x)
            return x, jnp.sum(r * r), it + 1

        r0 = b - ell_spmv(A, x)
        x, r2, iters = jax.lax.while_loop(
            cond, body, (x, jnp.sum(r0 * r0), jnp.int32(0))
        )
        safe = jnp.where(b2 > 0, b2, 1.0)
        rel = jnp.sqrt(jnp.maximum(r2, 0.0) / safe)
        return x, make_convergence_info(iters, rel, (r2 <= eps) | (b2 == 0))
