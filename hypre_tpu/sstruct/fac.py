"""FAC — fast adaptive composite multigrid for AMR grids.

Analogue of hypre's FAC (``sstruct_ls/fac*.c``): a composite grid made of a
global coarse level plus refined patches, solved by cycling between
*patch-local* relaxation and a coarse-grid correction on the full domain.

The TPU formulation keeps FAC algebraic: the composite operator (assembled
through the IJ interface or the helper below) lives on the composite DOF set
{fine cells inside patches} ∪ {coarse cells outside}; the coarse level is a
Galerkin RAP through piecewise-constant AMR transfers (fine-patch cells
average onto their parent coarse cell, outside cells inject), so the
two-level hierarchy is consistent by construction — hypre assembles the same
structure geometrically (``fac_amr_rap.c``). Relaxation is Jacobi masked to
the fine-patch DOFs (hypre relaxes patch levels only, ``fac_relax.c``), and
the coarse system is solved by BoomerAMG.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from hypre_tpu.amg.boomeramg import BoomerAMG
from hypre_tpu.core.config import make_convergence_info, ConvergenceInfo
from hypre_tpu.seq.csr import HostCSR
from hypre_tpu.seq.ell import EllMatrix, csr_to_ell, ell_spmv


@dataclasses.dataclass
class FAC:
    """HYPRE_SStructFAC* object protocol (simplified: one refined level)."""

    num_relax: int = 2
    relax_weight: float = 0.7
    coarse_amg: Optional[BoomerAMG] = None

    A: Optional[EllMatrix] = dataclasses.field(default=None, repr=False)

    def setup(self, A: EllMatrix, fine_mask: np.ndarray, parent: np.ndarray) -> "FAC":
        """A: composite operator. fine_mask[i]=True for fine-patch DOFs.
        parent[i]: coarse-grid index every composite DOF maps to (fine cells
        -> their parent coarse cell, coarse cells -> themselves)."""
        self.A = A
        n = A.n_rows
        parent = np.asarray(parent, np.int64)
        nc = int(parent.max()) + 1
        # prolongation: piecewise-constant injection from the parent cell
        P = HostCSR.from_coo(np.arange(n), parent, np.ones(n), (n, nc))
        # restriction: volume-weighted average onto parents
        wts = np.ones(n)
        counts = np.bincount(parent, minlength=nc).astype(float)
        wts = 1.0 / counts[parent]
        R = HostCSR.from_coo(parent, np.arange(n), wts, (nc, n))
        self._P = csr_to_ell(P, dtype=A.dtype)
        self._R = csr_to_ell(R, dtype=A.dtype)
        # Galerkin coarse operator through the native kernels
        from hypre_tpu import native
        from hypre_tpu.amg.hierarchy import _csr_to_ell_device, _ell_to_csr_arrays

        _, Ap_, Aj_, Ax_ = _ell_to_csr_arrays(A)
        _, Pp, Pj, Px = _ell_to_csr_arrays(self._P)
        _, Rp, Rj, Rx = _ell_to_csr_arrays(self._R)
        APp, APj, APx = native.spgemm(n, nc, Ap_, Aj_, Ax_, Pp, Pj, Px)
        Cp, Cj, Cx = native.spgemm(nc, nc, Rp, Rj, Rx, APp, APj, APx)
        A_H = _csr_to_ell_device(nc, nc, Cp, Cj, Cx, A.dtype)
        self.coarse_amg = (self.coarse_amg or BoomerAMG(max_coarse_size=256)).setup(A_H)
        diag = A.diagonal()
        self._dinv = jnp.where(diag != 0, 1.0 / jnp.where(diag != 0, diag, 1.0), 0.0)
        self._fmask = jnp.asarray(fine_mask.astype(np.asarray(A.vals).dtype))
        return self

    def _patch_relax(self, u, f):
        for _ in range(self.num_relax):
            r = f - ell_spmv(self.A, u)
            u = u + self.relax_weight * self._fmask * self._dinv * r
        return u

    def cycle(self, f: jax.Array, u: Optional[jax.Array] = None) -> jax.Array:
        """One FAC cycle: patch relax -> coarse correction -> patch relax
        (fac_cycle.c)."""
        if u is None:
            u = jnp.zeros_like(f)
        u = self._patch_relax(u, f)
        r = f - ell_spmv(self.A, u)
        rc = ell_spmv(self._R, r)
        ec = self.coarse_amg.cycle(rc)
        u = u + ell_spmv(self._P, ec)
        return self._patch_relax(u, f)

    def precond(self):
        return lambda r: self.cycle(r)

    def solve(
        self,
        b: jax.Array,
        x0: Optional[jax.Array] = None,
        rtol: float = 1e-8,
        maxiter: int = 100,
    ) -> tuple[jax.Array, ConvergenceInfo]:
        A = self.A
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


def composite_poisson_2d(Nc: int, patch_lo: tuple, patch_hi: tuple):
    """Assemble a 2-D composite-grid Poisson operator (FV, refinement 2):
    coarse Nc x Nc grid with the cells in [patch_lo, patch_hi) replaced by
    2x refined cells; conservative flux coupling at the coarse-fine
    interface (face length / center distance weights). Returns
    (A EllMatrix, fine_mask, parent, meta) for FAC.setup."""
    lo, hi = patch_lo, patch_hi
    in_patch = lambda I, J: lo[0] <= I < hi[0] and lo[1] <= J < hi[1]

    # composite DOF numbering: fine cells first (2x refined patch), then
    # coarse cells outside the patch
    fine_ids = {}
    for fi in range(2 * lo[0], 2 * hi[0]):
        for fj in range(2 * lo[1], 2 * hi[1]):
            fine_ids[(fi, fj)] = len(fine_ids)
    coarse_ids = {}
    nfine = len(fine_ids)
    for I in range(Nc):
        for J in range(Nc):
            if not in_patch(I, J):
                coarse_ids[(I, J)] = nfine + len(coarse_ids)
    n = nfine + len(coarse_ids)

    rows, cols, vals = [], [], []

    def add(r, c, v):
        rows.append(r)
        cols.append(c)
        vals.append(v)

    # fine-fine and fine-coarse couplings (h = 1 for the fine spacing)
    for (fi, fj), idx in fine_ids.items():
        diag = 0.0
        for di, dj in ((1, 0), (-1, 0), (0, 1), (0, -1)):
            gi, gj = fi + di, fj + dj
            if (gi, gj) in fine_ids:
                add(idx, fine_ids[(gi, gj)], -1.0)  # face h / dist h
                diag += 1.0
            else:
                I, J = gi // 2, gj // 2
                if 0 <= I < Nc and 0 <= J < Nc:
                    # coarse neighbor across the interface: face h,
                    # center distance 1.5h
                    w = 1.0 / 1.5
                    add(idx, coarse_ids[(I, J)], -w)
                    diag += w
                else:
                    diag += 2.0  # Dirichlet boundary: dist h/2
        add(idx, idx, diag)

    # coarse-coarse and coarse-fine couplings (coarse spacing 2h, face 2h)
    for (I, J), idx in coarse_ids.items():
        diag = 0.0
        for di, dj in ((1, 0), (-1, 0), (0, 1), (0, -1)):
            GI, GJ = I + di, J + dj
            if not (0 <= GI < Nc and 0 <= GJ < Nc):
                diag += 2.0  # boundary: face 2h / dist h
                continue
            if (GI, GJ) in coarse_ids:
                add(idx, coarse_ids[(GI, GJ)], -1.0)  # face 2h / dist 2h
                diag += 1.0
            else:
                # two fine cells across the interface (each face h, 1.5h)
                w = 1.0 / 1.5
                for t in (0, 1):
                    if di != 0:
                        ff = (2 * GI if di > 0 else 2 * GI + 1, 2 * J + t)
                    else:
                        ff = (2 * I + t, 2 * GJ if dj > 0 else 2 * GJ + 1)
                    add(idx, fine_ids[ff], -w)
                    diag += w
        add(idx, idx, diag)

    A = csr_to_ell(HostCSR.from_coo(rows, cols, vals, (n, n)))
    fine_mask = np.zeros(n, bool)
    fine_mask[:nfine] = True
    parent = np.zeros(n, np.int64)
    for (fi, fj), idx in fine_ids.items():
        parent[idx] = (fi // 2) * Nc + (fj // 2)
    for (I, J), idx in coarse_ids.items():
        parent[idx] = I * Nc + J
    return A, fine_mask, parent, (nfine, n)
