"""Euclid and PILUT — hypre's distributed_ls parallel ILU factorizations.

Reference: ``distributed_ls/Euclid/`` (parallel ILU(k)/ILUT, entry
``Euclid_dh.c``, apply ``Euclid_apply.c``, wrapped by
``parcsr_ls/HYPRE_parcsr_Euclid.c``) and ``distributed_ls/pilut/``
(Karypis/Kumar parallel ILUT, ``parilut.c``, wrapped by
``HYPRE_DistributedMatrixPilutSolver.c``).

Both reference codes spend most of their lines on MPI plumbing — subdomain
graphs, external-row exchange, pipelined triangular solves — machinery whose
job is to extract parallelism from an inherently sequential exact
factorization. The TPU formulation starts from a factorization that is
*already* parallel (the Chow-Patel fixed point over the full global pattern,
see ``ilu.py``), so the Euclid/PILUT objects here are thin configuration
shells mapping the reference's knobs onto it:

- ``Euclid``: ILU(k) with Euclid's flag set — ``level`` (fill), ``bj``
  (block-Jacobi: restrict the pattern to per-subdomain diagonal blocks,
  Euclid's ``-bj`` mode and its scalable default at high process counts),
  ``sparse_a`` (pre-drop small |a_ij|, Euclid's ``-sparseA``), ``row_scale``
  (scale rows to unit inf-norm before factoring, ``-rowScale``).
- ``PILUT``: ILUT with pilut's two knobs — ``factor_row_size`` (max kept
  entries per row, ``HYPRE_DistributedMatrixPilutSolverSetFactorRowSize``)
  and ``drop_tolerance`` (``...SetDropTolerance``).
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from hypre_tpu.precond.ilu import ILU, ILUT
from hypre_tpu.seq.ell import EllMatrix


def _block_diag_pattern(A: EllMatrix, num_subdomains: int) -> EllMatrix:
    """Mask A to its block-diagonal: entries whose column falls in the same
    contiguous row block as the row (Euclid's block-Jacobi subdomains; each
    "rank" of the reference becomes a contiguous row block of the shard)."""
    import numpy as np

    n = A.n_rows
    bounds = np.linspace(0, n, num_subdomains + 1).astype(np.int64)
    block_of = jnp.asarray(np.repeat(np.arange(num_subdomains), np.diff(bounds)))
    rows = jnp.arange(n)[:, None]
    same = (A.cols >= 0) & (block_of[jnp.maximum(A.cols, 0)] == block_of[rows])
    return EllMatrix(
        vals=jnp.where(same, A.vals, 0.0),
        cols=jnp.where(same, A.cols, -1),
        n_cols=A.n_cols,
    )


def _preprocess(A: EllMatrix, sparse_a: float, row_scale: bool,
                bj_blocks: int):
    """Euclid's -sparseA / -rowScale / -bj preprocessing; returns the matrix
    to factor plus the row scaling (None if disabled)."""
    scale = None
    if row_scale:
        absmax = jnp.max(jnp.where(A.cols >= 0, jnp.abs(A.vals), 0.0), axis=1)
        scale = 1.0 / jnp.where(absmax > 0, absmax, 1.0)
        A = EllMatrix(vals=A.vals * scale[:, None], cols=A.cols, n_cols=A.n_cols)
    if sparse_a > 0.0:
        rows = jnp.arange(A.n_rows)[:, None]
        rownorm = jnp.max(jnp.where(A.cols >= 0, jnp.abs(A.vals), 0.0), axis=1)
        keep = (A.cols >= 0) & (
            (jnp.abs(A.vals) >= sparse_a * rownorm[:, None])
            | (A.cols == rows)
        )
        A = EllMatrix(vals=jnp.where(keep, A.vals, 0.0),
                      cols=jnp.where(keep, A.cols, -1), n_cols=A.n_cols)
    if bj_blocks > 1:
        A = _block_diag_pattern(A, bj_blocks)
    return A, scale


@dataclasses.dataclass
class Euclid(ILU):
    """HYPRE_EuclidCreate/SetLevel/SetBJ/SetSparseA/SetRowScale analogue
    (``parcsr_ls/HYPRE_parcsr_ls.h:1860``, flag database
    ``distributed_ls/Euclid/Parser_dh.c``)."""

    level: int = 1            # -level: fill level k
    bj: int = 0               # -bj: number of block-Jacobi subdomains (0=off)
    sparse_a: float = 0.0     # -sparseA: relative pre-drop threshold
    row_scale: bool = False   # -rowScale

    def setup(self, A) -> "Euclid":
        from hypre_tpu.parallel.par_ell import ParEllMatrix

        if isinstance(A, ParEllMatrix):
            # TRUE distributed path: row-sharded operator -> distributed
            # Chow-Patel with per-sweep external-row (factor) exchange
            # (precond/par_ilu.py — Euclid_dh.c's cross-rank elimination,
            # not a block-Jacobi approximation). ILU(k>0) fill grows a
            # k-level envelope by distributed symbolic neighbor union
            # (par_ilu.par_extend_pattern — the k-hop halo pattern), then
            # factors on it, matching Euclid's -level semantics.
            from hypre_tpu.precond.par_ilu import ParILU, par_extend_pattern

            Ax = par_extend_pattern(A, self.level) if self.level > 0 else A
            self._par = ParILU(
                factor_sweeps=self.factor_sweeps,
                solve_sweeps=self.solve_sweeps,
            ).setup(Ax)
            self._row_scale_vec = None
            return self
        self._par = None
        Af, scale = _preprocess(A, self.sparse_a, self.row_scale, self.bj)
        self.fill_level = self.level
        super().setup(Af)
        self._row_scale_vec = scale
        return self

    def precond(self):
        if getattr(self, "_par", None) is not None:
            return self._par.precond()
        base = super().precond()
        scale = getattr(self, "_row_scale_vec", None)
        if scale is None:
            return base
        return lambda r: base(scale * r)


@dataclasses.dataclass
class PILUT(ILUT):
    """HYPRE_ParCSRPilutCreate/SetFactorRowSize/SetDropTolerance analogue
    (``parcsr_ls/HYPRE_parcsr_ls.h:1996``, ``distributed_ls/pilut/``)."""

    factor_row_size: int = 20   # SetFactorRowSize (pilut default 20)
    drop_tolerance: float = 1e-4  # SetDropTolerance
    num_subdomains: int = 0     # >1: block-Jacobi restriction like Euclid -bj

    def setup(self, A) -> "PILUT":
        from hypre_tpu.parallel.par_ell import ParEllMatrix

        if isinstance(A, ParEllMatrix):
            # TRUE distributed ILUT (pilut's actual capability, not a knob
            # remap): envelope growth + distributed Chow-Patel + dual-drop
            # truncation (precond/par_ilu.ParILUT)
            from hypre_tpu.precond.par_ilu import ParILUT

            self._par = ParILUT(
                drop_tolerance=self.drop_tolerance,
                factor_row_size=self.factor_row_size,
            ).setup(A)
            return self
        self._par = None
        if self.num_subdomains > 1:
            A = _block_diag_pattern(A, self.num_subdomains)
        self.max_row_nnz = self.factor_row_size
        self.drop_tol = self.drop_tolerance
        super().setup(A)
        return self

    def precond(self):
        if getattr(self, "_par", None) is not None:
            return self._par.precond()
        return super().precond()
