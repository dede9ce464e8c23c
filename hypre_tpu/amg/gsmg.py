"""GSMG — geometrically-smooth multigrid (smoothed-vector interpolation).

Analogue of hypre's GSMG (``parcsr_ls/par_gsmg.c``, driver solvers 13-15):
instead of deriving interpolation weights from matrix entries, sample the
near-nullspace by relaxing A x = 0 from random starts (the "smooth vectors",
``hypre_BoomerAMGBuildInterpLS``) and fit each F-row's weights by least
squares so that interpolation reproduces the smooth vectors on the strong-C
pattern:

    min_w  sum_s ( v_s[i] - sum_{j in C_i} w_j v_s[j] )^2

hypre solves the per-row LS with bundled LAPACK ``dgels`` (par_gsmg.c:708);
here all rows solve at once as a batched (n, k, k) normal-equations system —
the same TPU shape as FSAI. Everything else (PMIS coarsening, Galerkin RAP,
cycling) reuses the BoomerAMG machinery.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from hypre_tpu.amg.boomeramg import BoomerAMG
from hypre_tpu.amg.coarsen import C_PT, coarse_map, pmis
from hypre_tpu.amg.strength import strength_mask
from hypre_tpu.core.config import PAD_COL, hash_rand01
from hypre_tpu.seq.ell import EllMatrix
from hypre_tpu.seq.spgemm import ell_filter


def smooth_vectors(A: EllMatrix, num: int = 6, sweeps: int = 10) -> jax.Array:
    """(n, num) near-nullspace samples: damped-Jacobi relaxation on A x = 0
    from deterministic pseudo-random starts (par_gsmg.c's smooth vector
    generation)."""
    n = A.n_rows
    diag = A.diagonal()
    dinv = jnp.where(diag != 0, 1.0 / jnp.where(diag != 0, diag, 1.0), 0.0)
    cols = [
        hash_rand01(jnp.arange(n, dtype=jnp.int32) + 7919 * s).astype(A.dtype) - 0.5
        for s in range(num)
    ]
    V = jnp.stack(cols, axis=1)
    for _ in range(sweeps):
        V = V - 0.7 * dinv[:, None] * jnp.stack(
            [A.mv(V[:, s]) for s in range(num)], axis=1
        )
    # normalize columns
    return V / jnp.maximum(jnp.linalg.norm(V, axis=0), 1e-30)[None, :]


def ls_interp(
    A: EllMatrix,
    S: jax.Array,
    cf: jax.Array,
    cmap: jax.Array,
    n_coarse: int,
    V: jax.Array,
    ridge: float = 1e-8,
) -> EllMatrix:
    """Least-squares interpolation over the strong-C pattern fitted to the
    smooth vectors V (hypre_BoomerAMGBuildInterpLS)."""
    n, k = A.cols.shape
    cols_c = jnp.maximum(A.cols, 0)
    patt_mask = S & (cf[cols_c] == C_PT)
    patt = jnp.where(patt_mask, A.cols, PAD_COL)

    # per-row LS: G w = rhs with G = Vc Vc^T (k x k), rhs = Vc v_i
    Vc = jnp.where(
        patt_mask[..., None], V[cols_c], 0.0
    )  # (n, k, num): smooth values at candidate C cols
    G = jnp.einsum("nks,nls->nkl", Vc, Vc)
    G = G + ridge * jnp.eye(k, dtype=A.dtype)[None]
    rhs = jnp.einsum("nks,ns->nk", Vc, V)
    w = jnp.linalg.solve(G, rhs[..., None])[..., 0]
    w = jnp.where(patt_mask, w, 0.0)

    is_f = cf != C_PT
    p_cols = jnp.where(is_f[:, None] & patt_mask, cmap[cols_c], PAD_COL).astype(
        jnp.int32
    )
    p_vals = jnp.where(is_f[:, None], w, 0.0)
    own = jnp.where(cf == C_PT, cmap, PAD_COL).astype(jnp.int32)[:, None]
    ones = jnp.where(cf == C_PT, 1.0, 0.0).astype(A.dtype)[:, None]
    P = EllMatrix(
        vals=jnp.concatenate([p_vals, ones], axis=1),
        cols=jnp.concatenate([p_cols, own], axis=1),
        n_cols=int(n_coarse),
    )
    P = ell_filter(P, P.structural_mask())
    width = int(jnp.max(jnp.sum(P.structural_mask(), axis=1)))
    return EllMatrix(
        vals=P.vals[:, : max(width, 1)],
        cols=P.cols[:, : max(width, 1)],
        n_cols=P.n_cols,
    )


@dataclasses.dataclass
class GSMG(BoomerAMG):
    """HYPRE_BoomerAMGSetGSMG analogue — a BoomerAMG whose interpolation is
    the smoothed-vector least-squares fit. Inherits every other knob."""

    num_smooth_vectors: int = 6
    smooth_sweeps: int = 10

    def _do_setup(self, A: EllMatrix) -> None:
        from hypre_tpu.amg.hierarchy import AMGHierarchy, Level, _level_vectors
        from hypre_tpu.seq.spgemm import ell_spgemm, ell_transpose

        need_cheby = self.relax == "chebyshev"
        levels = []
        V = smooth_vectors(A, self.num_smooth_vectors, self.smooth_sweeps)
        while (
            len(levels) < self.max_levels - 1
            and A.n_rows > self.max_coarse_size
        ):
            S = strength_mask(A, self.strength_threshold)
            cf = pmis(A, S)
            cmap, n_c = coarse_map(cf)
            n_coarse = int(n_c)
            if n_coarse == 0 or n_coarse >= 0.9 * A.n_rows:
                break
            P = ls_interp(A, S, cf, cmap, n_coarse, V)
            from hypre_tpu.amg.interp import truncate_interp

            P = truncate_interp(
                P, max_elmts=self.p_max_elmts, trunc_factor=self.trunc_factor
            )
            Pt = ell_transpose(P)
            A_c = ell_spgemm(Pt, ell_spgemm(A, P))
            dinv, l1inv, lmax = _level_vectors(A, need_cheby)
            levels.append(
                Level(A=A, P=P, Pt=Pt, dinv=dinv, l1inv=l1inv, lmax=lmax)
            )
            # smooth vectors restrict to the coarse grid (injection at C pts)
            is_c = cf == C_PT
            V = V[jnp.nonzero(is_c, size=n_coarse)[0]]
            A = A_c
        rows = jnp.broadcast_to(jnp.arange(A.n_rows)[:, None], A.cols.shape)
        dense = jnp.zeros((A.n_rows, A.n_cols), A.dtype).at[
            rows, jnp.maximum(A.cols, 0)
        ].add(jnp.where(A.cols >= 0, A.vals, 0))
        from hypre_tpu.amg.hierarchy import AMGHierarchy

        self.hierarchy = AMGHierarchy(
            levels=levels, coarse_inv=jnp.linalg.pinv(dense)
        )
