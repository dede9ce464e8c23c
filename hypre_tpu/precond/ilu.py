"""ILU(0) with fine-grained parallel factorization and iterative solves.

hypre's ILU family (``parcsr_ls/par_ilu_setup.c``, GPU triangular solves at
``par_ilu_solve.c``) hits the same wall every accelerator does: exact
triangular factorization and solves are sequential. The TPU answer is the
same one hypre uses on GPUs, taken to its fixed-point form:

- *factorization*: Chow-Patel fine-grained ILU — iterate the ILU fixed-point
  equations over all nonzeros simultaneously; each sweep is a fully
  vectorized gather/multiply/reduce on the static ELL pattern
  (level-0 fill, i.e. ILU(0)).
- *application*: Jacobi-iteration triangular solves (hypre's
  ``iterative_setup_type``/GPU path): y ~= (I+L)^{-1} r via m sweeps of
  y <- r - L y, then x ~= U^{-1} y via x <- D^{-1}(y - U' x).

Both pieces are embarrassingly parallel with tunable accuracy — the
preconditioner quality matches exact ILU(0) as sweeps grow.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from hypre_tpu.seq.ell import EllMatrix, ell_spmv


@dataclasses.dataclass
class ILU:
    """HYPRE_ILU* object protocol (HYPRE_parcsr_ls.h; ilu_type 0 = ILU(0),
    fill_level>0 gives ILU(k) by growing the pattern to the structure of
    A^(k+1) — hypre's level-of-fill, computed with the native symbolic
    SpGEMM)."""

    factor_sweeps: int = 5
    solve_sweeps: int = 6
    fill_level: int = 0

    L: Optional[EllMatrix] = dataclasses.field(default=None, repr=False)
    U: Optional[EllMatrix] = dataclasses.field(default=None, repr=False)
    dinv: Optional[jax.Array] = dataclasses.field(default=None, repr=False)

    def setup(self, A: EllMatrix) -> "ILU":
        if self.fill_level > 0:
            A = _grow_pattern(A, self.fill_level)
        F = _chow_patel_sweeps(A, self.factor_sweeps)
        self._split_factors(A, F)
        return self

    def _split_factors(self, A: EllMatrix, F: jax.Array) -> None:
        n, _ = A.cols.shape
        cols = A.cols
        row_ids = jnp.arange(n, dtype=cols.dtype)[:, None]
        is_l = (cols >= 0) & (cols < row_ids)
        is_u = (cols >= 0) & (cols >= row_ids)
        lvals = jnp.where(is_l, F, 0.0)
        lcols = jnp.where(is_l, cols, -1)
        uvals = jnp.where(is_u, F, 0.0)
        ucols = jnp.where(is_u, cols, -1)
        diag = jnp.sum(jnp.where(cols == row_ids, F, 0.0), axis=1)
        self.L = EllMatrix(vals=lvals, cols=lcols, n_cols=A.n_cols)
        # U without its diagonal (applied separately via dinv)
        uvals_off = jnp.where(cols == row_ids, 0.0, uvals)
        self.U = EllMatrix(vals=uvals_off, cols=ucols, n_cols=A.n_cols)
        self.dinv = 1.0 / jnp.where(diag != 0, diag, 1.0)

    def precond(self):
        """Apply M^{-1} ~= (LU)^{-1} with Jacobi-iteration triangular solves."""
        L, U, dinv = self.L, self.U, self.dinv
        assert L is not None, "call setup(A) first"
        m = self.solve_sweeps

        def M(r):
            y = r
            for _ in range(m):
                y = r - ell_spmv(L, y)  # (I + L) y = r
            x = dinv * y
            for _ in range(m):
                x = dinv * (y - ell_spmv(U, x))  # (D + U') x = y
            return x

        return M


def _chow_patel_sweeps(
    A: EllMatrix, sweeps: int, F0: Optional[jax.Array] = None
) -> jax.Array:
    """Run `sweeps` Chow-Patel fixed-point iterations on A's static pattern;
    returns the factor values F (L strictly-lower scaled rows, U upper incl.
    diagonal) aligned with A.cols. F0 warm-starts the iteration (used by
    ILUT's post-prune refit, where the kept values are already near the
    fixed point)."""
    n, _ = A.cols.shape
    cols = A.cols
    row_ids = jnp.arange(n, dtype=cols.dtype)[:, None]
    is_l = (cols >= 0) & (cols < row_ids)
    is_u = (cols >= 0) & (cols >= row_ids)
    rsafe = jnp.maximum(cols, 0)

    def sweep(F, _):
        # neighbor-row factor values/cols: nv[i,a,s] = F[c_a, s]
        nv = F[rsafe]          # (n, k, k)
        nc = cols[rsafe]       # (n, k, k)
        # U(c_a, c_b): entries of row c_a with col >= c_a
        u_mask = nc >= rsafe[:, :, None]
        uv = jnp.where(u_mask & (nc >= 0), nv, 0.0)
        # match nc[i,a,s] == c_b  -> (n, a, b)
        Uab = jnp.einsum(
            "nas,nabs->nab",
            uv,
            (nc[:, :, None, :] == cols[:, None, :, None]).astype(F.dtype),
        )
        # L(i, c_a) and the k-range constraint k = c_a < j = c_b
        Lia = jnp.where(is_l, F, 0.0)
        ab_order = (cols[:, :, None] < cols[:, None, :]).astype(F.dtype)
        S = jnp.einsum("na,nab,nab->nb", Lia, Uab, ab_order)
        # diagonal of U: F at (j, j)
        dU = jnp.sum(jnp.where(cols == row_ids, F, 0.0), axis=1)
        dU = jnp.where(dU != 0, dU, 1.0)
        newU = A.vals - S
        newL = (A.vals - S) / dU[jnp.maximum(cols, 0)]
        F = jnp.where(is_u, newU, jnp.where(is_l, newL, 0.0))
        return F, None

    F = jnp.where((cols >= 0), A.vals, 0.0) if F0 is None else F0
    F, _ = jax.lax.scan(sweep, F, None, length=sweeps)
    return F


@dataclasses.dataclass
class ILUT(ILU):
    """Threshold ILU — hypre's ilu_type 1 ILUT(p, tau)
    (``parcsr_ls/par_ilu_setup.c:346-527`` dispatch; classic dual-threshold
    Saad ILUT semantics: drop |entry| < tau * ||row of A||_2 and keep at most
    `max_row_nnz` entries per row in each of L and U, diagonal always kept).

    TPU formulation: grow the candidate pattern to A^(fill_level+1) (like
    ILU(k)'s static pattern), run Chow-Patel fixed-point sweeps on it, prune
    by the dual threshold — a per-row top-k on the ELL value block, one
    vectorized sort — then re-sweep on the pruned pattern so the kept values
    re-fit the smaller sparsity."""

    drop_tol: float = 1e-3
    max_row_nnz: int = 0   # 0 = unlimited (tau-only ILUT); hypre's lfil
    fill_level: int = 1    # candidate pattern = structure of A^(fill_level+1)
    refit_sweeps: int = 3

    def setup(self, A: EllMatrix) -> "ILUT":
        Ac = _grow_pattern(A, self.fill_level) if self.fill_level > 0 else A
        F = _chow_patel_sweeps(Ac, self.factor_sweeps)

        n, k = Ac.cols.shape
        cols = Ac.cols
        row_ids = jnp.arange(n, dtype=cols.dtype)[:, None]
        valid = cols >= 0
        isdiag = cols == row_ids
        # tau threshold relative to the ORIGINAL row 2-norm (fill slots in the
        # grown pattern carry 0, so the norm over Ac.vals is A's row norm)
        rownorm = jnp.sqrt(jnp.sum(jnp.where(valid, Ac.vals * Ac.vals, 0.0), axis=1))
        absF = jnp.where(valid & ~isdiag, jnp.abs(F), 0.0)
        keep = absF >= self.drop_tol * rownorm[:, None]
        if self.max_row_nnz > 0:
            m = min(self.max_row_nnz, k)

            def topk_mask(v):
                srt = jnp.sort(v, axis=1)[:, ::-1]
                thresh = jnp.maximum(srt[:, m - 1], 1e-300)
                return v >= thresh[:, None]

            is_l = valid & (cols < row_ids)
            is_u_off = valid & (cols > row_ids)
            keep = keep & jnp.where(
                is_l, topk_mask(jnp.where(is_l, absF, 0.0)), True
            ) & jnp.where(is_u_off, topk_mask(jnp.where(is_u_off, absF, 0.0)), True)
        keep = (keep | isdiag) & valid

        from hypre_tpu.seq.spgemm import ell_filter

        pruned = ell_filter(
            EllMatrix(vals=jnp.where(keep, Ac.vals, 0.0),
                      cols=jnp.where(keep, cols, -1), n_cols=Ac.n_cols),
            keep,
        )
        # carry the converged factor values through the same compaction so
        # the refit warm-starts at the fixed point restricted to the pattern
        Fkept = ell_filter(
            EllMatrix(vals=jnp.where(keep, F, 0.0),
                      cols=jnp.where(keep, cols, -1), n_cols=Ac.n_cols),
            keep,
        ).vals
        width = max(int(jnp.max(jnp.sum(pruned.structural_mask(), axis=1))), 1)
        Fkept = Fkept[:, :width]
        pruned = EllMatrix(
            vals=pruned.vals[:, :width], cols=pruned.cols[:, :width],
            n_cols=pruned.n_cols,
        )
        F2 = _chow_patel_sweeps(pruned, self.refit_sweeps, F0=Fkept)
        self._split_factors(pruned, F2)
        return self


def _grow_pattern(A: EllMatrix, level: int) -> EllMatrix:
    """Return A re-padded onto the boolean pattern of A^(level+1), with
    zeros in the fill positions (the ILU(k) static pattern)."""
    import numpy as np

    from hypre_tpu import native
    from hypre_tpu.amg.hierarchy import _ell_to_csr_arrays
    from hypre_tpu.seq.csr import HostCSR
    from hypre_tpu.seq.ell import csr_to_ell, ell_to_csr

    n, Ap, Aj, Ax = _ell_to_csr_arrays(A)
    Pp, Pj = Ap, Aj
    ones = np.ones_like(Ax)
    for _ in range(level):
        lib_vals = np.ones(len(Pj), np.float64)
        Pp, Pj, _ = native.spgemm(n, n, Pp, Pj, lib_vals, Ap, Aj, ones)
    # overlay A's values onto the grown pattern
    acsr = ell_to_csr(A)
    dense_lookup = {}
    rows = np.repeat(np.arange(n), acsr.row_nnz())
    for r, c, v in zip(rows, acsr.indices, acsr.data):
        dense_lookup[(int(r), int(c))] = float(v)
    prows = np.repeat(np.arange(n), np.diff(Pp))
    vals = np.array(
        [dense_lookup.get((int(r), int(c)), 0.0) for r, c in zip(prows, Pj)]
    )
    return csr_to_ell(HostCSR(Pp.astype(np.int64), Pj.astype(np.int64), vals, (n, n)),
                      dtype=A.dtype)
