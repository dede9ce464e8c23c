"""PFMG — semicoarsening multigrid for structured grids.

TPU-native rebuild of hypre's PFMG (``struct_ls/pfmg_setup.c:63``,
``pfmg_solve.c:31``): per level, pick the coarsening direction with the
smallest effective mesh size (strongest coupling, hypre_PFMGComputeDxyz,
``pfmg_setup.c:174``), build operator-induced semicoarsening interpolation
(``pfmg_setup_interp.c``), form the Galerkin coarse operator — here by
lattice probing (replacing ``pfmg_setup_rap*.c``) — and V-cycle with
weighted-Jacobi or red-black Gauss-Seidel smoothing.

Setup is host-orchestrated (shapes change per level); the solve is one jitted
program whose V-cycle unrolls into fused stencil passes.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from functools import partial

from hypre_tpu.core.config import make_convergence_info, ConvergenceInfo
from hypre_tpu.struct.matrix import StructMatrix, struct_matvec
from hypre_tpu.struct.probe import (
    probe_core, probe_plan, probe_stencil, semi_rap_apply,
)
from hypre_tpu.struct.relax import (
    diag_inverse,
    parity_mask,
    red_black_gs,
    weighted_jacobi,
)
from hypre_tpu.struct.semi import SemiInterp, coarse_shape, semi_interp_from_matrix
from hypre_tpu.struct.stencil import StructStencil


@jax.jit
def _jit_coarse_pinv(A: StructMatrix) -> jax.Array:
    return jnp.linalg.pinv(A.to_dense())


@jax.jit
def _jit_cxyz(A: StructMatrix) -> jax.Array:
    """Per-dim coupling strengths (one dispatch, one small readback — the
    old per-offset ``float(jnp.mean(...))`` loop issued S*ndim blocking
    eager dispatches per level, which dominated PFMG setup on the tunnel)."""
    acc = []
    for d in range(A.ndim):
        terms = [
            jnp.mean(jnp.abs(A.coeffs[s]))
            for s, off in enumerate(A.stencil.offsets)
            if off[d] != 0
        ]
        acc.append(sum(terms) if terms else jnp.zeros((), A.dtype))
    return jnp.stack(acc)


def compute_dxyz(A: StructMatrix) -> np.ndarray:
    """Effective mesh sizes from matrix coefficients
    (hypre_PFMGComputeDxyz, pfmg_setup.c:768): coupling strength per dim
    c_d = mean |off-diagonal mass| in that dim; dxyz_d = 1/sqrt(c_d)."""
    cxyz = np.asarray(_jit_cxyz(A), np.float64)
    cmax = cxyz.max() if cxyz.max() > 0 else 1.0
    cxyz = np.where(cxyz > 0, cxyz, 1e-30 * cmax)
    return 1.0 / np.sqrt(cxyz)


@partial(jax.jit, static_argnames=("cdir", "mods", "offsets"))
def _pfmg_level_program(A: StructMatrix, cdir: int, mods, offsets):
    """One dispatch per level: operator-induced semicoarsening interp
    (pfmg_setup_interp.c), the probed Galerkin coarse stencil
    (pfmg_setup_rap*.c), prune flags, diag inverse and the RB mask."""
    P = semi_interp_from_matrix(A, cdir)
    cshape = coarse_shape(A.shape, cdir)
    C, flags = probe_core(
        semi_rap_apply, cshape, mods, offsets, A.dtype, (A, P)
    )
    dinv = diag_inverse(A)
    red = (
        sum(
            jax.lax.broadcasted_iota(jnp.int32, A.shape, d)
            for d in range(A.ndim)
        )
        % 2
        == 0
    )
    return P, C, flags, dinv, red


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PFMGLevel:
    A: StructMatrix
    P: Optional[SemiInterp]  # None on the coarsest level
    dinv: jax.Array
    red: jax.Array  # checkerboard mask for RB-GS


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PFMGHierarchy:
    levels: List[PFMGLevel]
    coarse_inv: jax.Array  # dense inverse of the coarsest operator
    coarse_shape: tuple[int, ...] = dataclasses.field(metadata=dict(static=True))


@dataclasses.dataclass
class PFMG:
    """HYPRE_StructPFMG* object protocol (HYPRE_struct_ls.h)."""

    max_levels: int = 25
    max_coarse_size: int = 32
    relax_type: str = "rb-gs"  # 'jacobi' | 'rb-gs'  (hypre 1 | 2)
    jacobi_weight: float = 2.0 / 3.0
    num_pre_relax: int = 1
    num_post_relax: int = 1
    rap_extent: int = 1  # coarse-stencil extent bound fed to the prober

    hierarchy: Optional[PFMGHierarchy] = dataclasses.field(default=None, repr=False)

    def setup(self, A: StructMatrix) -> "PFMG":
        levels: List[PFMGLevel] = []
        dxyz = compute_dxyz(A)
        # Deferred pruning, zero per-level syncs: every level runs UNPRUNED
        # (zero fill coefficients are numerically inert — P, dinv, the
        # coarse RAP and the final pinv are identical with or without
        # them), so the whole level chain enqueues as back-to-back async
        # dispatches; the prune flags of all levels are read back ONCE at
        # the end and the stored operators trimmed post-hoc. Through the
        # 25 ms/round-trip tunnel this is the difference between O(levels)
        # and O(1) blocking syncs per setup (hypre's 0.0123 s comparison
        # point, benchmark_struct.perf.saved.lassen:14).
        flags_list = []
        while (
            len(levels) < self.max_levels - 1 and A.n_rows > self.max_coarse_size
        ):
            # coarsen the dim with the smallest effective mesh size that can
            # still coarsen (pfmg_setup.c:224-235); x2 per coarsening (:328)
            # periodic dims can only coarsen while even (the stride-2 C-point
            # lattice must tile the wrapped dim, struct_mv periodicity rules)
            candidates = [
                d for d in range(A.ndim)
                if A.shape[d] >= 3
                and not (A.periodic and A.periodic[d] and A.shape[d] % 2)
            ]
            if not candidates:
                break
            cdir = min(candidates, key=lambda d: dxyz[d])
            dxyz = dxyz.copy()
            dxyz[cdir] *= 2

            cshape = coarse_shape(A.shape, cdir)
            ext = tuple(
                max(1 if d == cdir else A.stencil.extent[d], 0)
                for d in range(A.ndim)
            )
            mods, offsets = probe_plan(cshape, ext, A.periodic)
            P, C, flags, dinv, red = _pfmg_level_program(
                A, cdir, mods, offsets
            )
            flags_list.append(flags)
            Ac = StructMatrix(
                coeffs=C,
                stencil=StructStencil(offsets),
                shape=cshape,
                periodic=A.periodic,
            )
            levels.append(PFMGLevel(A=A, P=P, dinv=dinv, red=red))
            A = Ac

        coarse_inv = _jit_coarse_pinv(A)

        # the single sync: one fused readback of every level's flags
        if flags_list:
            lens = [int(f.shape[0]) for f in flags_list]
            allf = np.asarray(
                jnp.concatenate([f.astype(jnp.int8) for f in flags_list])
            )
            splits = np.split(allf, np.cumsum(lens)[:-1])
            flags_list = [s for s in splits]

        def pruned(M: StructMatrix, flags) -> StructMatrix:
            fl = np.asarray(flags)
            offs = M.stencil.offsets
            keep = [
                s for s in range(len(offs))
                if offs[s] == (0,) * M.ndim or bool(fl[s])
            ]
            if len(keep) == len(offs):
                return M
            return StructMatrix(
                coeffs=M.coeffs[np.asarray(keep)],
                stencil=StructStencil(tuple(offs[s] for s in keep)),
                shape=M.shape,
                periodic=M.periodic,
            )

        for i, fl in enumerate(flags_list):
            if i + 1 < len(levels):
                levels[i + 1] = dataclasses.replace(
                    levels[i + 1], A=pruned(levels[i + 1].A, fl)
                )
            else:
                A = pruned(A, fl)
        self.hierarchy = PFMGHierarchy(
            levels=levels, coarse_inv=coarse_inv, coarse_shape=A.shape
        )
        return self

    # -- cycle ---------------------------------------------------------------

    def _smooth(self, lev: PFMGLevel, u, f, sweeps: int):
        for _ in range(sweeps):
            if self.relax_type == "jacobi":
                u = weighted_jacobi(lev.A, lev.dinv, u, f, self.jacobi_weight)
            else:
                u = red_black_gs(lev.A, lev.dinv, lev.red, u, f)
        return u

    def cycle(self, f: jax.Array, u: Optional[jax.Array] = None) -> jax.Array:
        """One V-cycle (hypre_PFMGSolve's inner cycle, pfmg_solve.c:31)."""
        hier = self.hierarchy
        assert hier is not None, "call setup(A) first"

        def descend(level: int, f, u):
            if level == len(hier.levels):
                xc = hier.coarse_inv @ f.reshape(-1)
                return xc.reshape(hier.coarse_shape)
            lev = hier.levels[level]
            u = self._smooth(lev, u, f, self.num_pre_relax)
            r = f - struct_matvec(lev.A, u)
            rc = lev.P.apply_t(r)
            ec = descend(level + 1, rc, jnp.zeros_like(rc))
            u = u + lev.P.apply(ec)
            return self._smooth(lev, u, f, self.num_post_relax)

        if u is None:
            u = jnp.zeros_like(f)
        return descend(0, f, u)

    def precond(self):
        """Plug into Krylov M (HYPRE_StructPCGSetPrecond analogue). Works on
        either grid-shaped or raveled vectors."""
        shape = self.hierarchy.levels[0].A.shape if self.hierarchy.levels else self.hierarchy.coarse_shape

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
