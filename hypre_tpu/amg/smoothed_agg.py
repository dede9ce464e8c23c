"""Smoothed-aggregation AMG — the MLI/femli layer of the reference.

Analogue of hypre's MLI smoothed-aggregation solver
(``FEI_mv/femli/mli_method_amgsa.cxx`` and the ``mli_amgsa_*`` coarsening
files, exposed through the FEI/LSC layer as solver "mli"): instead of a C/F
splitting, group the unknowns into *aggregates* over the symmetrized
strength graph, build a tentative prolongator whose columns are the
near-nullspace restricted to each aggregate, and smooth it with one damped
Jacobi sweep:

    P = (I - omega D^{-1} A) P0,   omega = 4/3 / lambda_max(D^{-1} A)

(Vanek/Mandel/Brezina smoothed aggregation — the algorithm MLI implements.)
The coarse operator is the Galerkin product Pt A P, and cycling/relaxation
reuse the BoomerAMG machinery, exactly as MLI reuses hypre's smoothers.

TPU decomposition: aggregation is an irregular greedy pass (host, like
``ruge_stuben``); the tentative prolongator, the Jacobi smoothing of P
(one SpGEMM), and the RAP are device ELL kernels. The near-nullspace B is
user-suppliable (``SetNullSpace`` in MLI, e.g. rigid-body modes for
elasticity); default is the constant vector.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from hypre_tpu.amg.boomeramg import BoomerAMG
from hypre_tpu.amg.strength import strength_mask
from hypre_tpu.core.config import PAD_COL
from hypre_tpu.seq.ell import EllMatrix
from hypre_tpu.seq.spgemm import ell_spgemm, ell_transpose


def aggregate_graph(nbr: list) -> tuple[np.ndarray, int]:
    """Greedy aggregation over an explicit symmetric adjacency (list of
    neighbor sets) — VMB phases 1-3 (mli_amgsa_coarsen1.cxx coarsenLocal).
    Shared by the matrix-strength path (``aggregate``) and the FEI
    element-graph path (``FEISystem.element_graph_aggregates``,
    mli_amgsa_calib.cxx's FE-data-driven coarsening).

    Returns (agg_id (n,) int64, n_aggregates); every node is assigned
    (isolated nodes become singleton aggregates so P keeps full rank).
    """
    n = len(nbr)
    agg = np.full(n, -1, np.int64)
    n_agg = 0
    # phase 1: roots whose whole neighborhood is free
    for i in range(n):
        if agg[i] >= 0 or not nbr[i]:
            continue
        if all(agg[j] < 0 for j in nbr[i]):
            agg[i] = n_agg
            for j in nbr[i]:
                agg[j] = n_agg
            n_agg += 1
    # phase 2: attach stragglers to a neighboring aggregate
    for i in range(n):
        if agg[i] < 0:
            for j in nbr[i]:
                if agg[j] >= 0:
                    agg[i] = agg[j]
                    break
    # phase 3: aggregates from what's left (incl. isolated singletons)
    for i in range(n):
        if agg[i] < 0:
            agg[i] = n_agg
            for j in nbr[i]:
                if agg[j] < 0:
                    agg[j] = n_agg
            n_agg += 1
    return agg, n_agg


def aggregate(A: EllMatrix, S: jax.Array) -> tuple[np.ndarray, int]:
    """Greedy aggregation over the symmetrized matrix strength graph."""
    Sh = np.asarray(S)
    cols = np.asarray(A.cols)
    n, _ = cols.shape
    nbr = [set(cols[i][Sh[i]].tolist()) for i in range(n)]
    for i in range(n):           # symmetrize
        for j in nbr[i]:
            nbr[j].add(i)
    return aggregate_graph(nbr)


def tentative_prolongator(
    agg: np.ndarray, n_agg: int, B: jax.Array
) -> tuple[EllMatrix, jax.Array]:
    """P0 from the near-nullspace B (n, nb): column block c of P0 carries
    B restricted to aggregate c, orthonormalized per aggregate (the QR step
    of smoothed aggregation; MLI's genP tentative prolongator). Returns
    (P0, Bc) with Bc (n_agg*nb, nb) the coarse near-nullspace (the R
    factors)."""
    n, nb = B.shape
    agg_j = jnp.asarray(agg)
    if nb == 1:
        # vectorized: per-aggregate 2-norm via segment_sum
        norms2 = jax.ops.segment_sum(B[:, 0] ** 2, agg_j, num_segments=n_agg)
        norms = jnp.sqrt(jnp.maximum(norms2, 1e-300))
        vals = (B[:, 0] / norms[agg_j])[:, None]
        P0 = EllMatrix(vals=vals, cols=agg_j[:, None].astype(jnp.int32),
                       n_cols=n_agg)
        return P0, norms[:, None]
    # general nb: per-aggregate dense QR on host (setup-time, irregular)
    Bh = np.asarray(B)
    members = [[] for _ in range(n_agg)]
    for i, a in enumerate(agg):
        members[a].append(i)
    vals = np.zeros((n, nb))
    colsP = np.full((n, nb), PAD_COL, np.int32)
    Bc = np.zeros((n_agg * nb, nb))
    for a, rows in enumerate(members):
        Q, R = np.linalg.qr(Bh[rows, :])  # (m, nb), (nb, nb)
        vals[rows, : Q.shape[1]] = Q
        colsP[rows, : Q.shape[1]] = a * nb + np.arange(Q.shape[1])
        Bc[a * nb : a * nb + R.shape[0], :] = R
    P0 = EllMatrix(vals=jnp.asarray(vals, B.dtype),
                   cols=jnp.asarray(colsP), n_cols=n_agg * nb)
    return P0, jnp.asarray(Bc, B.dtype)


def smooth_prolongator(A: EllMatrix, P0: EllMatrix, omega_scale: float = 4.0 / 3.0
                       ) -> EllMatrix:
    """P = (I - omega D^{-1} A) P0 as one ELL SpGEMM; omega = omega_scale /
    lambda_max(D^{-1}A) estimated by the existing power iteration."""
    from hypre_tpu.amg.relax import max_eig_estimate

    n = A.n_rows
    diag = A.diagonal()
    dinv = jnp.where(diag != 0, 1.0 / jnp.where(diag != 0, diag, 1.0), 0.0)
    lmax = max_eig_estimate(A, dinv)
    omega = omega_scale / jnp.maximum(lmax, 1e-30)
    rows = jnp.arange(n, dtype=A.cols.dtype)[:, None]
    isdiag = A.cols == rows
    jvals = jnp.where(A.cols >= 0, -omega * dinv[:, None] * A.vals, 0.0)
    jvals = jvals + jnp.where(isdiag, 1.0, 0.0)
    J = EllMatrix(vals=jvals, cols=A.cols, n_cols=n)
    return ell_spgemm(J, P0)


@dataclasses.dataclass
class SmoothedAggAMG(BoomerAMG):
    """MLI "AMGSA" method object (mli_method_amgsa.cxx) — a BoomerAMG whose
    setup builds aggregates + smoothed prolongators; every solve-side knob
    (cycle type, smoothers, Krylov wrapping) is inherited."""

    null_space: Optional[jax.Array] = None  # (n, nb); None -> constants
    prolongator_smoothing: float = 4.0 / 3.0  # omega scale; 0 = unsmoothed P0
    # precomputed FINE-level aggregation (agg_id (n,), n_agg) — the FEI
    # element-graph coarsening slice (mli_amgsa_calib.cxx: aggregate on
    # element connectivity instead of the assembled-matrix strength graph;
    # FEISystem.element_graph_aggregates produces it). Coarser levels have
    # no element data and fall back to matrix-strength aggregation.
    agg0: Optional[tuple] = None

    def _do_setup(self, A: EllMatrix) -> None:
        from hypre_tpu.amg.hierarchy import AMGHierarchy, Level, _level_vectors

        need_cheby = self.relax == "chebyshev"
        levels = []
        B = self.null_space
        if B is None:
            B = jnp.ones((A.n_rows, 1), A.dtype)
        while (
            len(levels) < self.max_levels - 1
            and A.n_rows > self.max_coarse_size
        ):
            if not levels and self.agg0 is not None:
                agg, n_agg = self.agg0
                agg = np.asarray(agg)
                if agg.shape[0] != A.n_rows:
                    raise ValueError(
                        f"agg0 covers {agg.shape[0]} rows, A has {A.n_rows}"
                    )
            else:
                S = strength_mask(A, self.strength_threshold)
                agg, n_agg = aggregate(A, S)
            nb = B.shape[1]
            if n_agg * nb == 0 or n_agg * nb >= 0.9 * A.n_rows:
                break
            P0, Bc = tentative_prolongator(agg, n_agg, B)
            if self.prolongator_smoothing > 0:
                P = smooth_prolongator(A, P0, self.prolongator_smoothing)
            else:
                P = P0
            Pt = ell_transpose(P)
            A_c = ell_spgemm(Pt, ell_spgemm(A, P))
            dinv, l1inv, lmax = _level_vectors(A, need_cheby)
            levels.append(
                Level(A=A, P=P, Pt=Pt, dinv=dinv, l1inv=l1inv, lmax=lmax)
            )
            A, B = A_c, Bc
        rows = jnp.broadcast_to(jnp.arange(A.n_rows)[:, None], A.cols.shape)
        dense = jnp.zeros((A.n_rows, A.n_cols), A.dtype).at[
            rows, jnp.maximum(A.cols, 0)
        ].add(jnp.where(A.cols >= 0, A.vals, 0))
        self.hierarchy = AMGHierarchy(
            levels=levels, coarse_inv=jnp.linalg.pinv(dense)
        )
