"""FAC — fast adaptive composite multigrid for AMR grids.

Analogue of hypre's FAC (``sstruct_ls/fac*.c``): a composite grid made of a
global coarse level plus refined patches (arbitrarily nested), solved by
cycling between *patch-local* relaxation and coarse-grid corrections on the
successively-derefined composite grids.

The TPU formulation keeps FAC algebraic: the composite operator (assembled
through the IJ interface or the helpers below) lives on the composite DOF
set {cells at their local refinement depth}; each hierarchy level derefines
the deepest patch by its refinement factor through piecewise-constant AMR
transfers (fine-patch cells average onto their parent cell, other cells
inject), so every level's operator is a Galerkin RAP and the hierarchy is
consistent by construction — hypre assembles the same structure
geometrically (``fac_amr_rap.c``). Relaxation is Jacobi masked to the
deepest-patch DOFs of each level (hypre relaxes patch levels only,
``fac_relax.c``), and the base grid is solved by BoomerAMG
(``fac_cycle.c`` drives the same patch-relax / coarse-correct recursion).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from hypre_tpu.amg.boomeramg import BoomerAMG
from hypre_tpu.core.config import make_convergence_info, ConvergenceInfo
from hypre_tpu.seq.csr import HostCSR
from hypre_tpu.seq.ell import EllMatrix, csr_to_ell, ell_spmv


@dataclasses.dataclass
class _FACLevel:
    A: EllMatrix
    P: EllMatrix
    R: EllMatrix
    dinv: jax.Array
    fmask: jax.Array


def _galerkin(A: EllMatrix, P: EllMatrix, R: EllMatrix, nc: int) -> EllMatrix:
    from hypre_tpu import native
    from hypre_tpu.amg.hierarchy import _csr_to_ell_device, _ell_to_csr_arrays

    n = A.n_rows
    _, Ap_, Aj_, Ax_ = _ell_to_csr_arrays(A)
    _, Pp, Pj, Px = _ell_to_csr_arrays(P)
    _, Rp, Rj, Rx = _ell_to_csr_arrays(R)
    APp, APj, APx = native.spgemm(n, nc, Ap_, Aj_, Ax_, Pp, Pj, Px)
    Cp, Cj, Cx = native.spgemm(nc, nc, Rp, Rj, Rx, APp, APj, APx)
    return _csr_to_ell_device(nc, nc, Cp, Cj, Cx, A.dtype)


@dataclasses.dataclass
class FAC:
    """HYPRE_SStructFAC* object protocol. One refined level (the classic
    two-level FAC) or a full nested-patch stack (pass lists to setup)."""

    num_relax: int = 2
    relax_weight: float = 0.7
    coarse_amg: Optional[BoomerAMG] = None

    A: Optional[EllMatrix] = dataclasses.field(default=None, repr=False)
    levels: Optional[List[_FACLevel]] = dataclasses.field(
        default=None, repr=False
    )

    def setup(self, A: EllMatrix, fine_mask, parent) -> "FAC":
        """A: composite operator on the finest composite DOF set.

        Single refined level: ``fine_mask[i]=True`` for fine-patch DOFs and
        ``parent[i]`` the coarse-grid index each composite DOF maps to
        (fine cells -> their parent coarse cell, coarse cells ->
        themselves).

        Nested patches: pass lists — ``fine_mask[l]``/``parent[l]`` describe
        the l-th derefinement step (level 0 = deepest patch), each mapping
        the level-l composite DOF set onto the level-(l+1) one. Operators
        for every derefined composite grid come out as Galerkin RAPs.
        """
        if not isinstance(fine_mask, (list, tuple)):
            fine_mask, parent = [fine_mask], [parent]
        self.A = A
        self.levels = []
        A_l = A
        for mask_l, parent_l in zip(fine_mask, parent):
            n = A_l.n_rows
            parent_l = np.asarray(parent_l, np.int64)
            nc = int(parent_l.max()) + 1
            # prolongation: piecewise-constant injection from the parent
            P = HostCSR.from_coo(np.arange(n), parent_l, np.ones(n), (n, nc))
            # restriction: volume-weighted average onto parents
            counts = np.bincount(parent_l, minlength=nc).astype(float)
            wts = 1.0 / counts[parent_l]
            R = HostCSR.from_coo(parent_l, np.arange(n), wts, (nc, n))
            P_e = csr_to_ell(P, dtype=A_l.dtype)
            R_e = csr_to_ell(R, dtype=A_l.dtype)
            diag = A_l.diagonal()
            dinv = jnp.where(
                diag != 0, 1.0 / jnp.where(diag != 0, diag, 1.0), 0.0
            )
            fmask = jnp.asarray(
                np.asarray(mask_l).astype(np.asarray(A_l.vals).dtype)
            )
            A_c = _galerkin(A_l, P_e, R_e, nc)
            self.levels.append(
                _FACLevel(A=A_l, P=P_e, R=R_e, dinv=dinv, fmask=fmask)
            )
            A_l = A_c
        self.coarse_amg = (
            self.coarse_amg or BoomerAMG(max_coarse_size=256)
        ).setup(A_l)
        return self

    def _patch_relax(self, lev: _FACLevel, u, f):
        for _ in range(self.num_relax):
            r = f - ell_spmv(lev.A, u)
            u = u + self.relax_weight * lev.fmask * lev.dinv * r
        return u

    def cycle(self, f: jax.Array, u: Optional[jax.Array] = None) -> jax.Array:
        """One FAC cycle: per level patch relax -> restrict -> recurse ->
        correct -> patch relax; base grid solved by one AMG cycle
        (fac_cycle.c)."""

        def descend(l: int, f, u):
            if l == len(self.levels):
                return self.coarse_amg.cycle(f)
            lev = self.levels[l]
            u = self._patch_relax(lev, u, f)
            r = f - ell_spmv(lev.A, u)
            rc = ell_spmv(lev.R, r)
            ec = descend(l + 1, rc, jnp.zeros_like(rc))
            u = u + ell_spmv(lev.P, ec)
            return self._patch_relax(lev, u, f)

        if u is None:
            u = jnp.zeros_like(f)
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


def composite_poisson_nested(Nc: int, patches: list):
    """Nested-patch composite Poisson (refinement 2 per patch level).

    ``patches``: list of (lo, hi) boxes in COARSE cell coordinates, each
    strictly nested inside the previous. A coarse cell inside the first l
    patches carries 2^l x 2^l leaf cells of size 2^-l (unless a deeper
    patch refines it further). Conservative FV fluxes: face length = the
    smaller cell side, center distance = half-side sums — the same
    interface discretization hypre's FAC examples use (ex13-class AMR).

    Returns (A, masks, parents, n) where masks/parents are the per-level
    lists FAC.setup consumes (level 0 derefines the deepest patch).
    """
    L = len(patches)
    S = 1 << L  # finest resolution per coarse cell

    def depth(I, J):
        d = 0
        for lo, hi in patches:
            if lo[0] <= I < hi[0] and lo[1] <= J < hi[1]:
                d += 1
            else:
                break
        return d

    def leaves_at(trunc: int):
        """Leaf cells when refinement depth is capped at ``trunc``: dict
        (x0, y0, size) -> id in finest-resolution integer coords."""
        ids = {}
        for I in range(Nc):
            for J in range(Nc):
                d = min(depth(I, J), trunc)
                s = S >> d
                for a in range(1 << d):
                    for b in range(1 << d):
                        key = (I * S + a * s, J * S + b * s, s)
                        ids[key] = len(ids)
        return ids

    full = leaves_at(L)
    n = len(full)

    # conservative FV assembly over the leaf set (O(n) via face lookup)
    # owner(x, y) -> leaf containing finest-resolution point (x, y)
    max_d = {}
    for I in range(Nc):
        for J in range(Nc):
            max_d[(I, J)] = depth(I, J)

    def owner(x, y):
        if not (0 <= x < Nc * S and 0 <= y < Nc * S):
            return None
        d = max_d[(x // S, y // S)]
        s = S >> d
        return (x - x % s, y - y % s, s)

    rows, cols, vals = [], [], []
    for (x0, y0, s), idx in full.items():
        diag = 0.0
        # walk each face in steps of the smallest neighbor size
        for side in range(4):
            if side == 0:  # +x
                probes = [(x0 + s, y0 + t) for t in range(s)]
            elif side == 1:  # -x
                probes = [(x0 - 1, y0 + t) for t in range(s)]
            elif side == 2:  # +y
                probes = [(x0 + t, y0 + s) for t in range(s)]
            else:  # -y
                probes = [(x0 + t, y0 - 1) for t in range(s)]
            seen = set()
            boundary_faces = 0
            for px, py in probes:
                nb = owner(px, py)
                if nb is None:
                    boundary_faces += 1
                    continue
                if nb in seen:
                    continue
                seen.add(nb)
                s2 = nb[2]
                face = min(s, s2) / S
                dist = (s + s2) / (2 * S)
                w = face / dist
                rows.append(idx)
                cols.append(full[nb])
                vals.append(-w)
                diag += w
            if boundary_faces:
                # Dirichlet wall: per finest-resolution probe, face 1/S,
                # center-to-wall distance s/(2S) -> 2/s each
                diag += boundary_faces * 2.0 / s
        rows.append(idx)
        cols.append(idx)
        vals.append(diag)

    A = csr_to_ell(HostCSR.from_coo(rows, cols, vals, (n, n)))

    masks, parents = [], []
    cur = full
    for l in range(L):
        trunc = L - 1 - l
        nxt = leaves_at(trunc)
        min_s = min(s for (_, _, s) in cur)
        mask = np.zeros(len(cur), bool)
        parent = np.zeros(len(cur), np.int64)
        for (x0, y0, s), idx in cur.items():
            mask[idx] = s == min_s  # the deepest-patch cells relax
            # parent leaf in the derefined grid
            d_here = min(max_d[(x0 // S, y0 // S)], trunc)
            sp = S >> d_here
            parent[idx] = nxt[(x0 - x0 % sp, y0 - y0 % sp, sp)]
        masks.append(mask)
        parents.append(parent)
        cur = nxt
    return A, masks, parents, n
