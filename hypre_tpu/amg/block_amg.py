"""Block (nodal systems) AMG — BoomerAMG's systems mode on BSR storage.

Analogue of hypre's ``parcsr_block_mv`` solver path (``par_csr_block_interp.c``,
``par_csr_block_rap.c``, ``par_csr_block_relax.c``): for systems PDEs with
``bs`` dofs per node (elasticity, multi-species), unknown-based AMG coarsens
each dof independently and loses the inter-dof coupling; nodal AMG instead

1. condenses A to a NODAL graph (one value per block — a row-sum/Frobenius
   norm, hypre's nodal 1..6 options, ``par_nodal_systems.c``), keeping the
   sign convention strength-of-connection expects;
2. coarsens the nodal graph (PMIS) so all dofs of a node share one CF mark;
3. builds BLOCK direct interpolation (``hypre_BoomerAMGBuildBlockDirInterp``):
   for F node i,   W_ij = -D_i^{-1} (S_n S_p^{-1}) A_ij,  j in strong-C,
   with S_n = sum of all off-diagonal blocks, S_p = sum over strong-C blocks
   — the block generalization of direct interpolation's alfa ratio,
   preserving constants per dof (batched bs x bs inverses, MXU work);
4. forms the Galerkin coarse operator. The block RAP equals the scalar RAP
   of the expanded system with the block-structured P (hypre stores blocks
   for memory locality; on TPU the slab SpGEMM over the expanded scalar
   operator is the faster layout), so the coarse operator is computed with
   the device SpGEMM and RE-BLOCKED — it retains exact nodal structure
   because P only couples whole nodes;
5. smooths with block Jacobi (``par_csr_block_relax.c``; batched block
   inverse + einsum — bsr.block_jacobi_precond).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from hypre_tpu.amg.coarsen import coarse_map, pmis
from hypre_tpu.amg.strength import strength_mask
from hypre_tpu.core.config import PAD_COL, make_convergence_info
from hypre_tpu.seq.bsr import BsrMatrix, ell_to_bsr
from hypre_tpu.seq.ell import EllMatrix, ell_spmv
from hypre_tpu.seq.spgemm import ell_spgemm, ell_transpose


def nodal_norm_matrix(A: BsrMatrix, mode: str = "frobenius") -> EllMatrix:
    """Condensed nodal matrix (par_nodal_systems.c): off-diagonal entries
    get NEGATIVE block norms, diagonals positive — so the classical
    negative-coupling strength definition applies unchanged."""
    if mode == "frobenius":
        norms = jnp.sqrt(jnp.sum(A.bvals * A.bvals, axis=(-2, -1)))
    elif mode == "rowsum":
        norms = jnp.max(jnp.sum(jnp.abs(A.bvals), axis=-1), axis=-1)
    else:
        raise ValueError(f"unknown nodal mode {mode!r}")
    rows = jnp.arange(A.n_brows, dtype=A.bcols.dtype)[:, None]
    is_diag = A.bcols == rows
    vals = jnp.where(is_diag, norms, -norms)
    vals = jnp.where(A.bcols >= 0, vals, 0.0)
    return EllMatrix(vals=vals, cols=A.bcols, n_cols=A.n_bcols)


def block_direct_interp(
    A: BsrMatrix, S: jax.Array, cf: jax.Array, cmap: jax.Array, n_coarse: int
) -> BsrMatrix:
    """Block direct interpolation (hypre_BoomerAMGBuildBlockDirInterp)."""
    nb, k = A.bcols.shape
    bs = A.block_size
    rows = jnp.arange(nb, dtype=A.bcols.dtype)[:, None]
    offd = (A.bcols >= 0) & (A.bcols != rows)
    cols_c = jnp.maximum(A.bcols, 0)
    is_strong_c = S & (cf[cols_c] == 1)

    D = A.block_diagonal()  # (nb, bs, bs)
    S_n = jnp.sum(jnp.where(offd[..., None, None], A.bvals, 0.0), axis=1)
    S_p = jnp.sum(
        jnp.where(is_strong_c[..., None, None], A.bvals, 0.0), axis=1
    )
    eye = jnp.eye(bs, dtype=A.dtype)[None]
    # guard singular sums (rows with no strong C): identity fallback; those
    # rows get empty interpolation anyway
    have_c = jnp.any(is_strong_c, axis=1)
    S_p_safe = jnp.where(have_c[:, None, None], S_p, eye)
    # Tikhonov guard: strong-C block sums can be near-singular on stiff
    # systems (hypre checks the explicit inverse for singularity and zeros
    # the row; regularizing keeps the batched solve NaN-free)
    scale = jnp.max(jnp.abs(S_p_safe), axis=(-2, -1), keepdims=True)
    S_p_safe = S_p_safe + 1e-10 * jnp.maximum(scale, 1.0) * eye
    # r = S_n S_p^{-1}  (hypre BlockMultInv: o = i2 * i1^{-1}) — solve the
    # transposed system; block products do not commute
    ratio = jnp.linalg.solve(
        jnp.swapaxes(S_p_safe, -1, -2), jnp.swapaxes(S_n, -1, -2)
    )
    ratio = jnp.swapaxes(ratio, -1, -2)
    Dinv_ratio = jnp.linalg.solve(D, ratio)  # D^{-1} (S_n S_p^{-1})
    Dinv_ratio = jnp.where(
        jnp.isfinite(Dinv_ratio), Dinv_ratio, 0.0
    )
    # W_ij = -(D^{-1} (S_n S_p^{-1})) A_ij (par_csr_block_interp.c:563-600,
    # BlockMultInv then BlockInvMult then the final MultAdd per entry)
    W = -jnp.einsum("nab,nkbc->nkac", Dinv_ratio, A.bvals)  # (nb,k,bs,bs)

    is_f = (cf != 1)[:, None]
    keep = is_strong_c & is_f
    p_cols = jnp.where(keep, cmap[cols_c], PAD_COL).astype(jnp.int32)
    p_vals = jnp.where(keep[..., None, None], W, 0.0)
    own = jnp.where(cf == 1, cmap, PAD_COL)[:, None].astype(jnp.int32)
    ident = jnp.where((cf == 1)[:, None, None, None], eye[:, None], 0.0)
    return BsrMatrix(
        bvals=jnp.concatenate([p_vals, ident], axis=1),
        bcols=jnp.concatenate([p_cols, own], axis=1),
        n_bcols=int(n_coarse),
    )


@dataclasses.dataclass
class _BLevel:
    A: BsrMatrix
    A_ell: EllMatrix  # scalar view for residuals/SpMV
    P_ell: EllMatrix
    Pt_ell: EllMatrix
    binv: jax.Array  # (nb, bs, bs) inverse diagonal blocks


@dataclasses.dataclass
class BlockAMG:
    """Nodal systems BoomerAMG (hypre num_functions > 1 + nodal > 0)."""

    strength_threshold: float = 0.25
    max_levels: int = 25
    max_coarse_size: int = 40  # in nodes
    nodal: str = "frobenius"
    num_sweeps: int = 1
    relax_weight: float = 0.8

    levels: Optional[List[_BLevel]] = dataclasses.field(default=None, repr=False)
    coarse_inv: Optional[jax.Array] = dataclasses.field(default=None, repr=False)

    def setup(self, A: BsrMatrix) -> "BlockAMG":
        levels: List[_BLevel] = []
        while (
            len(levels) < self.max_levels - 1
            and A.n_brows > self.max_coarse_size
        ):
            N = nodal_norm_matrix(A, self.nodal)
            S = strength_mask(N, self.strength_threshold)
            cf = pmis(N, S)
            cmap, n_c = coarse_map(cf)
            n_coarse = int(n_c)
            if n_coarse == 0 or n_coarse >= 0.9 * A.n_brows:
                break
            P = block_direct_interp(A, S, cf, cmap, n_coarse)
            A_ell = A.to_ell()
            P_ell = P.to_ell()
            Pt_ell = ell_transpose(P_ell)
            AP = ell_spgemm(A_ell, P_ell)
            Ac_ell = ell_spgemm(Pt_ell, AP)
            binv = jnp.linalg.inv(A.block_diagonal())
            levels.append(
                _BLevel(A=A, A_ell=A_ell, P_ell=P_ell, Pt_ell=Pt_ell, binv=binv)
            )
            A = ell_to_bsr(Ac_ell, A.block_size)

        dense = np.zeros((A.n_rows, A.n_cols))
        Ae = A.to_ell()
        cols, vals = np.asarray(Ae.cols), np.asarray(Ae.vals)
        r = np.repeat(np.arange(Ae.n_rows), Ae.k).reshape(cols.shape)
        m = cols >= 0
        np.add.at(dense, (r[m], cols[m]), vals[m])
        self.coarse_inv = jnp.asarray(
            np.linalg.pinv(dense, rcond=1e-12), Ae.dtype
        )
        self.levels = levels
        return self

    def _smooth(self, lev: _BLevel, u, f):
        bs = lev.A.block_size
        for _ in range(self.num_sweeps):
            r = f - lev.A.mv(u)
            rb = r.reshape(-1, bs)
            du = jnp.einsum("nab,nb->na", lev.binv, rb).reshape(-1)
            u = u + self.relax_weight * du
        return u

    def cycle(self, f: jax.Array, u: Optional[jax.Array] = None) -> jax.Array:
        levels = self.levels

        def descend(i, f, u):
            if i == len(levels):
                return self.coarse_inv @ f
            lev = levels[i]
            u = self._smooth(lev, u, f)
            r = f - lev.A.mv(u)
            rc = lev.Pt_ell.mv(r)
            ec = descend(i + 1, rc, jnp.zeros_like(rc))
            u = u + lev.P_ell.mv(ec)
            return self._smooth(lev, u, f)

        if u is None:
            u = jnp.zeros_like(f)
        return descend(0, f, u)

    def precond(self):
        return lambda r: self.cycle(r)
