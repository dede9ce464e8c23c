"""SMG — semicoarsening multigrid with plane/line relaxation.

TPU rebuild of hypre's SMG (``struct_ls/smg.c``, ``smg_setup.c:17``,
``smg_relax.c``): coarsen the last dimension by 2 each level; smooth with
*zebra plane relaxation* — solve all same-parity planes perpendicular to the
coarsening direction simultaneously, alternately for even and odd parity.

Plane solves:
- 1-D grids: parallel cyclic reduction — the system is tridiagonal, solved
  exactly (this is also hypre's CyclicReduction coarse path);
- 2-D grids (cdir=1): each plane is a line along axis 0 → batched exact
  tridiagonal PCR solves over all lines of one parity at once;
- 3-D grids (cdir=2): each plane is a 2-D problem; hypre solves it with one
  recursive 2-D SMG V-cycle (``smg_relax.c``). v1 approximates that plane
  solve with nested zebra *line* relaxation inside the plane (alternating
  exact tridiagonal line solves in x) — the classic alternating-line smoother;
  the recursive batched-2-D-SMG plane solve is a planned upgrade.

Interpolation weights are the operator-collapsed semicoarsening weights
(shared ``semi.py``); hypre's SMG derives its weights from local plane
solves (``smg_setup_interp.c``) — a second planned refinement.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from hypre_tpu.core.config import make_convergence_info, ConvergenceInfo
from hypre_tpu.struct.cycred import pcr_solve
from hypre_tpu.struct.matrix import StructMatrix, shift, struct_matvec
from hypre_tpu.struct.probe import probe_stencil
from hypre_tpu.struct.semi import SemiInterp, coarse_shape, semi_interp_from_matrix


def _tridiag_along(A: StructMatrix, axis: int, in_plane_axes: tuple[int, ...]):
    """Extract (lo, di, hi) line coefficients along ``axis`` from the stencil
    entries whose offsets vanish outside ``in_plane_axes`` ∪ {axis}."""
    lo = jnp.zeros(A.shape, A.dtype)
    di = jnp.zeros(A.shape, A.dtype)
    hi = jnp.zeros(A.shape, A.dtype)
    for s, off in enumerate(A.stencil.offsets):
        if any(off[d] != 0 for d in range(A.ndim) if d != axis):
            continue
        c = jnp.broadcast_to(A.coeffs[s], A.shape)
        if off[axis] == -1:
            lo = lo + c
        elif off[axis] == 0:
            di = di + c
        elif off[axis] == 1:
            hi = hi + c
        else:
            raise ValueError("SMG line relaxation needs extent-1 stencils")
    return lo, di, hi


def _line_solve_update(A: StructMatrix, u, f, line_axis: int, mask):
    """Solve the line systems along ``line_axis`` at points where mask=1,
    holding the rest of u fixed (one colored line-relax half-sweep)."""
    lo, di, hi = _tridiag_along(A, line_axis, ())
    # rhs = f - (A - T) u where T is the tridiagonal part along line_axis.
    # T must match what PCR solves EXACTLY: a non-wrapping tridiagonal. If
    # the line axis is periodic, the wraparound couplings stay in the
    # (A - T) u remainder — a consistent splitting, just a slightly weaker
    # line smoother at the seam.
    no_wrap = (
        tuple(p and d != line_axis for d, p in enumerate(A.periodic))
        if A.periodic
        else None
    )
    e = [0] * A.ndim
    e[line_axis] = 1
    Tu = (
        di * u
        + lo * shift(u, tuple(-v for v in e), no_wrap)
        + hi * shift(u, tuple(e), no_wrap)
    )
    rhs = f - struct_matvec(A, u) + Tu
    # PCR solves along the last axis: move line_axis last
    perm = [d for d in range(A.ndim) if d != line_axis] + [line_axis]
    inv = np.argsort(perm)
    sol = pcr_solve(
        jnp.transpose(lo, perm),
        jnp.transpose(di, perm),
        jnp.transpose(hi, perm),
        jnp.transpose(rhs, perm),
    )
    sol = jnp.transpose(sol, inv)
    return jnp.where(mask, sol, u)


def _plane_parity_mask(shape, cdir: int, parity: int) -> np.ndarray:
    idx = np.indices(shape)[cdir]
    return (idx % 2) == parity


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SMGLevel:
    A: StructMatrix
    P: Optional[SemiInterp]
    even: jax.Array  # plane-parity masks for zebra relaxation
    odd: jax.Array


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SMGHierarchy:
    levels: List[SMGLevel]
    coarse_inv: jax.Array
    coarse_shape: tuple[int, ...] = dataclasses.field(metadata=dict(static=True))


@dataclasses.dataclass
class SMG:
    """HYPRE_StructSMG* object protocol (HYPRE_struct_ls.h)."""

    max_levels: int = 25
    max_coarse_size: int = 32
    num_pre_relax: int = 1
    num_post_relax: int = 1

    hierarchy: Optional[SMGHierarchy] = dataclasses.field(default=None, repr=False)

    def setup(self, A: StructMatrix) -> "SMG":
        levels: List[SMGLevel] = []
        while len(levels) < self.max_levels - 1 and A.n_rows > self.max_coarse_size:
            def can_coarsen(d: int) -> bool:
                if A.shape[d] < 3:
                    return False
                # periodic dims only coarsen while even (struct periodicity)
                return not (A.periodic and A.periodic[d] and A.shape[d] % 2)

            cdir = A.ndim - 1  # SMG always semicoarsens the last dim (smg_setup.c)
            if not can_coarsen(cdir):
                coarsenable = [d for d in range(A.ndim) if can_coarsen(d)]
                if not coarsenable:
                    break
                cdir = coarsenable[-1]
            P = semi_interp_from_matrix(A, cdir)
            cshape = coarse_shape(A.shape, cdir)
            ext = tuple(
                1 if d == cdir else A.stencil.extent[d] for d in range(A.ndim)
            )
            Ac = probe_stencil(
                lambda xc: P.apply_t(struct_matvec(A, P.apply(xc))),
                cshape,
                ext,
                A.dtype,
                periodic=A.periodic,
            )
            levels.append(
                SMGLevel(
                    A=A,
                    P=P,
                    even=jnp.asarray(_plane_parity_mask(A.shape, cdir, 0)),
                    odd=jnp.asarray(_plane_parity_mask(A.shape, cdir, 1)),
                )
            )
            A = Ac
        coarse_inv = jnp.linalg.pinv(A.to_dense())
        self.hierarchy = SMGHierarchy(
            levels=levels, coarse_inv=coarse_inv, coarse_shape=A.shape
        )
        return self

    # -- zebra plane relaxation (smg_relax.c) ---------------------------------

    def _relax(self, lev: SMGLevel, u, f, sweeps: int):
        A = lev.A
        cdir = lev.P.cdir if lev.P is not None else A.ndim - 1
        for _ in range(sweeps):
            if A.ndim == 1:
                # tridiagonal — PCR is an exact solve
                from hypre_tpu.struct.cycred import cyclic_reduction_solve

                return cyclic_reduction_solve(A, f)
            for mask in (lev.even, lev.odd):
                if A.ndim == 2:
                    # plane = exact line solve along axis 0
                    u = _line_solve_update(A, u, f, 1 - cdir, mask)
                else:
                    # 3-D: approximate each plane solve with alternating
                    # in-plane line relaxation (see module docstring)
                    axes = [d for d in range(A.ndim) if d != cdir]
                    for la in axes:
                        u = _line_solve_update(A, u, f, la, mask)
        return u

    def cycle(self, f: jax.Array, u: Optional[jax.Array] = None) -> jax.Array:
        hier = self.hierarchy
        assert hier is not None, "call setup(A) first"

        def descend(level: int, f, u):
            if level == len(hier.levels):
                xc = hier.coarse_inv @ f.reshape(-1)
                return xc.reshape(hier.coarse_shape)
            lev = hier.levels[level]
            u = self._relax(lev, u, f, self.num_pre_relax)
            r = f - struct_matvec(lev.A, u)
            rc = lev.P.apply_t(r)
            ec = descend(level + 1, rc, jnp.zeros_like(rc))
            u = u + lev.P.apply(ec)
            return self._relax(lev, u, f, self.num_post_relax)

        if u is None:
            u = jnp.zeros_like(f)
        return descend(0, f, u)

    def precond(self):
        shape = (
            self.hierarchy.levels[0].A.shape
            if self.hierarchy.levels
            else self.hierarchy.coarse_shape
        )

        def M(r):
            flat = r.ndim == 1
            z = self.cycle(r.reshape(shape) if flat else r)
            return z.reshape(-1) if flat else z

        return M

    def solve(
        self,
        b: jax.Array,
        x0: Optional[jax.Array] = None,
        rtol: float = 1e-6,
        maxiter: int = 200,
    ) -> tuple[jax.Array, ConvergenceInfo]:
        hier = self.hierarchy
        assert hier is not None, "call setup(A) first"
        A0 = hier.levels[0].A if hier.levels else None
        if A0 is None:
            x = (hier.coarse_inv @ b.reshape(-1)).reshape(hier.coarse_shape)
            return x, make_convergence_info(1, 0.0, True)
        x = jnp.zeros_like(b) if x0 is None else x0
        b2 = jnp.sum(b * b)
        eps = rtol * rtol * b2

        def cond(state):
            _, r2, it = state
            return (r2 > eps) & (it < maxiter) & jnp.isfinite(r2)

        def body(state):
            x, _, it = state
            x = self.cycle(b, x)
            r = b - struct_matvec(A0, x)
            return x, jnp.sum(r * r), it + 1

        r0 = b - struct_matvec(A0, x)
        x, r2, iters = jax.lax.while_loop(cond, body, (x, jnp.sum(r0 * r0), jnp.int32(0)))
        safe_b2 = jnp.where(b2 > 0, b2, 1.0)
        rel = jnp.sqrt(jnp.maximum(r2, 0.0) / safe_b2)
        return x, make_convergence_info(iters, rel, (r2 <= eps) | (b2 == 0))
